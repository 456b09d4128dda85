package graft.io

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

import graft.SparkSpecBase
import graft.ops.FullText
import graft.queries.SimilarityQueries

/** The mutation-lease contract: SINGLE MUTATOR AT A TIME is enforced,
  * not documented — a foreign JVM's mutator fails fast on the
  * filesystem lease, same-JVM mutators serialize on the per-index
  * lock, a crashed holder's lease is taken over after the stale
  * window, and a taken-over (zombie) writer aborts at its commit
  * point instead of publishing over the new holder's generation. */
class LeaseSpec extends SparkSpecBase {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"
  private val terms = Seq("fast", "vector", "query")

  private def fs = new Path("/tmp")
    .getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def writeLock(idx: String, content: String): Unit = {
    val out = fs.create(new Path(s"$idx/_mutation.lock"), true)
    out.write(content.getBytes("UTF-8"))
    out.close()
  }

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix)
      .toFile.getAbsolutePath

  test("a foreign holder makes every mutation fail fast, index untouched") {
    val docs = graft.io.Tables.documents(spark, dir)
    val idx = tmp("lease-ft")
    FullText.writeTextIndex(docs, "doc_id", "text", idx)
    def page() = FullText.bm25SearchStored(spark, idx, terms)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val before = page()
    // another JVM's live lease (fresh mtime): every mutation face
    // must refuse with an actionable error and change NOTHING
    writeLock(idx, "3 foreign-token otherhost:pid=1234")
    val extra = Seq((7770001L, "fast vector query race"))
      .toDF("doc_id", "text")
    val e = intercept[IllegalStateException] {
      FullText.appendToTextIndex(spark, extra, "doc_id", "text", idx)
    }
    assert(e.getMessage.contains("being mutated"))
    assert(e.getMessage.contains("otherhost:pid=1234"))
    intercept[IllegalStateException] {
      FullText.deleteFromTextIndex(spark, idx, Seq(1L))
    }
    intercept[IllegalStateException] {
      FullText.compactTextIndex(spark, idx)
    }
    assert(page() == before, "a refused mutation must change nothing")
    // the holder releases → the same mutation proceeds
    fs.delete(new Path(s"$idx/_mutation.lock"), false)
    FullText.appendToTextIndex(spark, extra, "doc_id", "text", idx)
    assert(spark.read
      .parquet(s"${FullText.liveArtifactDir(spark, idx)}/stats")
      .head().getAs[Long]("n_docs") == docs.count() + 1)
    // and a clean mutation releases its own lease
    assert(!Layout.pathExists(spark, s"$idx/_mutation.lock"),
      "the lease must not outlive the mutation")
    // vector family refuses identically
    val vIdx = tmp("lease-vec")
    SimilarityQueries.writeIvfPqIndex(spark, dir, vIdx)
    writeLock(vIdx, "0 foreign-token otherhost:pid=99")
    intercept[IllegalStateException] {
      SimilarityQueries.deleteFromIvfPqIndex(spark, vIdx, Seq(1L))
    }
    intercept[IllegalStateException] {
      SimilarityQueries.compactIvfPqIndex(spark, vIdx)
    }
  }

  test("stale lease: a crashed holder is taken over after leaseStaleMs") {
    val docs = graft.io.Tables.documents(spark, dir)
    val idx = tmp("lease-stale")
    FullText.writeTextIndex(docs, "doc_id", "text", idx,
      storeTermVectors = true)
    // a dead writer's lease, last touched an hour ago
    writeLock(idx, "7 zombie-token deadhost:pid=1")
    fs.setTimes(new Path(s"$idx/_mutation.lock"),
      System.currentTimeMillis() - 3600L * 1000, -1)
    spark.conf.set("graft.index.leaseStaleMs", "1000")
    try {
      val dead = docs.limit(3).select($"doc_id")
        .collect().map(_.getLong(0)).toSeq
      FullText.deleteFromTextIndex(spark, idx, dead) // takes over
      assert(spark.read
        .parquet(s"${FullText.liveArtifactDir(spark, idx)}/stats")
        .head().getAs[Long]("n_docs") == docs.count() - dead.size,
        "the takeover mutation must land")
    } finally spark.conf.unset("graft.index.leaseStaleMs")
  }

  test("a fenced-out writer aborts its commit, staged generation stays invisible") {
    val idx = tmp("lease-fence")
    val thrown = intercept[IllegalStateException] {
      Layout.withMutationLease(spark, idx) {
        // simulate a stale-window takeover racing a still-alive
        // writer: the lease now carries the intruder's token
        writeLock(idx, "99 intruder-token newhost:pid=2")
        Layout.commitGeneration(spark, s"$idx/gen-1")
      }
    }
    assert(thrown.getMessage.contains("taken over"))
    assert(!Layout.pathExists(spark, s"$idx/gen-1/_COMMITTED"),
      "the fenced writer's generation must never become visible")
    // the zombie's release must NOT remove the new holder's lease
    assert(Layout.pathExists(spark, s"$idx/_mutation.lock"),
      "release must be token-guarded")
  }

  test("heartbeat: a long-but-alive mutation keeps its lease fresh past the stale window") {
    val idx = tmp("lease-hb")
    val p = new Path(s"$idx/_mutation.lock")
    spark.conf.set("graft.index.leaseStaleMs", "1500")
    try {
      import scala.concurrent.{Await, Future}
      import scala.concurrent.duration._
      import scala.concurrent.ExecutionContext.Implicits.global
      // a mutation that RUNS 3x the stale window without touching
      // the lease itself — only the heartbeat keeps it alive
      val holder = Future {
        Layout.withMutationLease(spark, idx) {
          Thread.sleep(4000)
          "done"
        }
      }
      val deadline = System.currentTimeMillis() + 2000
      while (!fs.exists(p) && System.currentTimeMillis() < deadline)
        Thread.sleep(50)
      assert(fs.exists(p), "the holder must have acquired the lease")
      Thread.sleep(3000) // well past staleMs = 1500
      assert(fs.exists(p), "the lease must still be held")
      val age = System.currentTimeMillis() -
        fs.getFileStatus(p).getModificationTime
      assert(age < 1500,
        s"heartbeat must keep the lease fresher than staleMs " +
          s"(mtime age ${age}ms) — a live multi-hour mutation must " +
          "never look crashed")
      assert(Await.result(holder, 2.minutes) == "done")
      assert(!Layout.pathExists(spark, s"$idx/_mutation.lock"),
        "release must still reclaim the heartbeated lease")
    } finally spark.conf.unset("graft.index.leaseStaleMs")
  }

  test("concurrent refresh + takedown on one index serialize in one JVM") {
    val docs = graft.io.Tables.documents(spark, dir)
    val idx = tmp("lease-conc")
    FullText.writeTextIndex(docs, "doc_id", "text", idx,
      storeTermVectors = true)
    val extra = Seq((7770001L, "fast vector query wins"),
      (7770002L, "slow scalar path loses")).toDF("doc_id", "text")
    val dead = docs.filter($"doc_id" % 9 === 1).select($"doc_id")
      .collect().map(_.getLong(0)).toSeq
    assert(dead.nonEmpty)
    // the ADVICE race: an append and a delete in flight at once.
    // Exact-stats delete + disjoint append COMMUTE, so the
    // serialized outcome equals a rebuild regardless of which wins
    // the lock.
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val fA = Future(FullText.appendToTextIndex(spark, extra,
      "doc_id", "text", idx, segmentId = Some("bA")))
    val fD = Future(FullText.deleteFromTextIndex(spark, idx, dead))
    Await.result(fA, 5.minutes)
    Await.result(fD, 5.minutes)
    val idxR = tmp("lease-conc-r")
    FullText.writeTextIndex(
      docs.filter(!$"doc_id".isInCollection(dead))
        .select($"doc_id", $"text").unionByName(extra),
      "doc_id", "text", idxR, storeTermVectors = true)
    def page(i: String) = FullText.bm25SearchStored(spark, i, terms)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(page(idx) == page(idxR),
      "serialized concurrent mutations must equal the rebuild")
  }
}
