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

  test("double takeover: a zombie's staging never lands in the committed generation") {
    val docs = graft.io.Tables.documents(spark, dir)
    val idx = tmp("lease-dual")
    FullText.writeTextIndex(docs, "doc_id", "text", idx,
      storeTermVectors = true)
    // writer A (the zombie) acquires and stages; writer B's takeover
    // lands mid-stage (the check-stale → delete → create interleave
    // both can win). A must abort AND its staged bytes must be
    // unreachable from any committed generation.
    val thrown = intercept[IllegalStateException] {
      Layout.withMutationLease(spark, idx) {
        val stage = Layout.stageGenerationDir(spark, idx, 1)
        val name = new Path(stage).getName
        assert(name != "gen-1" && name.startsWith("gen-1."),
          s"staging must be writer-unique under a held lease (got $name)")
        // the side-dir staging names are writer-unique too
        val side = Layout.stagedSideName(spark, idx, "postings-v1")
        assert(side != "postings-v1" && side.startsWith("postings-v1."))
        fs.mkdirs(new Path(s"$stage/df"))
        val out = fs.create(new Path(s"$stage/df/part-zombie"), true)
        out.write("zombie bytes".getBytes("UTF-8")); out.close()
        // B's takeover: the lease now carries the intruder's token
        writeLock(idx, "99 intruder-token newhost:pid=2")
        Layout.commitGenerationAndRetire(spark, idx, stage, 1, idx)
      }
    }
    assert(thrown.getMessage.contains("taken over"))
    assert(!Layout.pathExists(spark, s"$idx/gen-1"),
      "the zombie's staging must never surface under the final name")
    // the intruder (B) releases-equivalent: clear its lock, then run
    // a REAL mutation as the winner — it commits gen-1
    fs.delete(new Path(s"$idx/_mutation.lock"), false)
    val dead = docs.limit(2).select($"doc_id")
      .collect().map(_.getLong(0)).toSeq
    FullText.deleteFromTextIndex(spark, idx, dead)
    assert(Layout.pathExists(spark, s"$idx/gen-1/_COMMITTED"))
    // the committed generation contains ONLY the winner's files
    val it = fs.listFiles(new Path(s"$idx/gen-1"), true)
    val names = scala.collection.mutable.ArrayBuffer[String]()
    while (it.hasNext) names += it.next().getPath.getName
    assert(!names.contains("part-zombie"),
      s"committed generation must hold only the winner's files ($names)")
    // and the zombie's orphaned staging dir was reclaimed by the
    // winner's retire sweep
    val orphans = fs.listStatus(new Path(idx)).map(_.getPath.getName)
      .filter(n => n.startsWith("gen-1.") )
    assert(orphans.isEmpty,
      s"orphaned staging dirs must be reclaimed (left: ${orphans.toSeq})")
  }

  test("a competing writer's committed generation is never clobbered by a late committer") {
    val idx = tmp("lease-clobber")
    // writer W holds the lease and stages; an intruder has ALREADY
    // published gen-1 (it took over after W's acquire, committed its
    // own staging, and released — so the lock W re-reads still holds
    // W's token and the fence PASSES). The already-committed guard
    // must abort W BEFORE any destructive rename touches the
    // intruder's published data.
    val thrown = intercept[IllegalStateException] {
      Layout.withMutationLease(spark, idx) {
        val stage = Layout.stageGenerationDir(spark, idx, 1)
        val side = Layout.stagedSideName(spark, idx, "postings-v1")
        fs.mkdirs(new Path(s"$stage/df"))
        fs.mkdirs(new Path(s"$idx/$side"))
        // the intruder's published state: final gen-1 + side dir
        fs.mkdirs(new Path(s"$idx/gen-1"))
        fs.create(new Path(s"$idx/gen-1/_COMMITTED"), true).close()
        val out = fs.create(new Path(s"$idx/postings-v1/part-intruder"),
          true)
        out.write("intruder bytes".getBytes("UTF-8")); out.close()
        Layout.commitGenerationAndRetire(spark, idx, stage, 1, idx,
          sideRenames = Seq(side -> "postings-v1"))
      }
    }
    assert(thrown.getMessage.contains("already committed"))
    assert(Layout.pathExists(spark, s"$idx/postings-v1/part-intruder"),
      "the guard must fire BEFORE the side renames clobber the " +
        "competing writer's published data")
    assert(Layout.pathExists(spark, s"$idx/gen-1/_COMMITTED"))
  }

  test("heartbeat outlives a transient 'absent' lock report") {
    val idx = tmp("lease-hb-absent")
    val p = new Path(s"$idx/_mutation.lock")
    spark.conf.set("graft.index.leaseStaleMs", "1500") // beat ~500ms
    try {
      import scala.concurrent.{Await, Future}
      import scala.concurrent.duration._
      import scala.concurrent.ExecutionContext.Implicits.global
      val holder = Future {
        Layout.withMutationLease(spark, idx) { Thread.sleep(6500); "done" }
      }
      val deadline = System.currentTimeMillis() + 5000
      while (!fs.exists(p) && System.currentTimeMillis() < deadline)
        Thread.sleep(50)
      assert(fs.exists(p))
      val content = {
        val in = fs.open(p)
        try scala.io.Source.fromInputStream(in, "UTF-8").mkString
        finally in.close()
      }
      // the lock is briefly ABSENT (a flaky store's listing, or a
      // takeover mid-swap that never completes) — one false absence
      // must not permanently stop the refresh loop
      fs.delete(p, false)
      Thread.sleep(1200) // ≥ 2 beats observe absence
      val out = fs.create(p, true)
      out.write(content.getBytes("UTF-8")); out.close()
      val restoredAt = fs.getFileStatus(p).getModificationTime
      // the loop is ALIVE iff some LATER beat moves the mtime past
      // the restore write — POLL for it instead of a one-shot age
      // bound: a dragged host can starve the beat thread past any
      // fixed window (a real 2115 ms age was observed under a 2×
      // suite slowdown), and the claim pinned here is "one false
      // absence never permanently stops the refresh loop", not
      // "beats are never late". The mutation still has ~4 s to run
      // (~8 beat opportunities); stop early if the holder released.
      val pollEnd = System.currentTimeMillis() + 10000
      var resumed = false
      while (!resumed && fs.exists(p) &&
          System.currentTimeMillis() < pollEnd) {
        if (fs.getFileStatus(p).getModificationTime > restoredAt)
          resumed = true
        else Thread.sleep(200)
      }
      assert(resumed,
        "heartbeat must resume refreshing after a transient absence")
      assert(Await.result(holder, 2.minutes) == "done")
    } finally spark.conf.unset("graft.index.leaseStaleMs")
  }

  test("lease keys are scheme-insensitive: file:/ and / mutators serialize, not fail") {
    val idx = tmp("lease-scheme")
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val p = new Path(s"$idx/_mutation.lock")
    val holder = Future {
      Layout.withMutationLease(spark, idx) { Thread.sleep(2000); "a" }
    }
    val deadline = System.currentTimeMillis() + 5000
    while (!fs.exists(p) && System.currentTimeMillis() < deadline)
      Thread.sleep(50)
    assert(fs.exists(p))
    // the SAME index addressed with an explicit scheme: an unqualified
    // lease key would route this to a different JVM lock and fail
    // fast on the filesystem lease; the qualified key serializes it
    val second = Future {
      Layout.withMutationLease(spark, s"file:$idx") { "b" }
    }
    assert(Await.result(second, 2.minutes) == "b",
      "a same-JVM mutator via a scheme-qualified path must serialize")
    assert(Await.result(holder, 2.minutes) == "a")
  }

  test("heartbeat survives transient FS errors instead of dying mid-mutation") {
    val idx = tmp("lease-hb-io")
    val p = new Path(s"$idx/_mutation.lock")
    spark.conf.set("graft.index.leaseStaleMs", "1500") // beat ~500ms
    try {
      import scala.concurrent.{Await, Future}
      import scala.concurrent.duration._
      import scala.concurrent.ExecutionContext.Implicits.global
      val holder = Future {
        Layout.withMutationLease(spark, idx) { Thread.sleep(6500); "done" }
      }
      val deadline = System.currentTimeMillis() + 5000
      while (!fs.exists(p) && System.currentTimeMillis() < deadline)
        Thread.sleep(50)
      assert(fs.exists(p))
      val content = {
        val in = fs.open(p)
        try scala.io.Source.fromInputStream(in, "UTF-8").mkString
        finally in.close()
      }
      // simulate a transient FS outage at the lock path: a DIRECTORY
      // of the same name makes every readLease throw IOException for
      // ~2 beats (a one-shot handler would kill the thread here and
      // the still-alive holder would look crashed after staleMs)
      fs.delete(p, false)
      fs.mkdirs(p)
      Thread.sleep(1200)
      fs.delete(p, true)
      val out = fs.create(p, true)
      out.write(content.getBytes("UTF-8")); out.close()
      // past a full stale window AFTER the restore: only a live
      // heartbeat keeps the mtime fresher than staleMs
      Thread.sleep(2000)
      val age = System.currentTimeMillis() -
        fs.getFileStatus(p).getModificationTime
      assert(age < 1500,
        s"heartbeat must keep beating after transient IO errors " +
          s"(mtime age ${age}ms)")
      assert(Await.result(holder, 2.minutes) == "done")
    } finally spark.conf.unset("graft.index.leaseStaleMs")
  }

  test("graft.index.leaseWaitMs: acquisition polls until the holder releases") {
    val docs = graft.io.Tables.documents(spark, dir).limit(60)
    val idx = tmp("lease-wait")
    FullText.writeTextIndex(docs, "doc_id", "text", idx,
      storeTermVectors = true)
    writeLock(idx, "4 foreign-token otherhost:pid=77")
    val dead = docs.limit(1).select($"doc_id")
      .collect().map(_.getLong(0)).toSeq
    // default: fail fast (the library contract, unchanged)
    intercept[IllegalStateException] {
      FullText.deleteFromTextIndex(spark, idx, dead)
    }
    // with the wait knob: poll with backoff until the holder releases
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    spark.conf.set("graft.index.leaseWaitMs", "60000")
    try {
      val releaser = Future {
        Thread.sleep(1500)
        fs.delete(new Path(s"$idx/_mutation.lock"), false)
      }
      FullText.deleteFromTextIndex(spark, idx, dead) // must land
      Await.result(releaser, 2.minutes)
      assert(spark.read
        .parquet(s"${FullText.liveArtifactDir(spark, idx)}/stats")
        .head().getAs[Long]("n_docs") == docs.count() - 1)
    } finally spark.conf.unset("graft.index.leaseWaitMs")
  }

  test("mutation storm: racing appends/deletes/compactions + a takeover equal the serial rebuild") {
    // randomized-interleaving stress over the PUBLIC mutation faces:
    // three threads race appends, deletes and compactions on ONE
    // index (they serialize on the per-index lock in any order); the
    // operations are chosen to COMMUTE (disjoint appends, deletes of
    // distinct pre-existing ids, compaction is semantics-preserving),
    // so EVERY interleaving must equal the serial rebuild — this is
    // the harness that catches the next fencing corner before an
    // advisor does. A deterministic seed keeps failures replayable.
    val docs = graft.io.Tables.documents(spark, dir)
    val idx = tmp("lease-storm")
    FullText.writeTextIndex(docs, "doc_id", "text", idx,
      storeTermVectors = true)
    val rnd = new scala.util.Random(13)
    val appends = (1 to 3).map { i =>
      (s"storm$i", Seq((7780000L + i, s"fast vector storm batch $i"))
        .toDF("doc_id", "text"))
    }
    val allIds = docs.select($"doc_id").collect().map(_.getLong(0))
    val deletes = (0 until 3).map(i =>
      allIds.filter(_ % 17 == i).take(4).toSeq)
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val tA = Future {
      appends.foreach { case (sid, df) =>
        Thread.sleep(rnd.nextInt(300))
        FullText.appendToTextIndex(spark, df, "doc_id", "text", idx,
          segmentId = Some(sid))
      }
    }
    val tD = Future {
      deletes.foreach { ids =>
        Thread.sleep(rnd.nextInt(300))
        FullText.deleteFromTextIndex(spark, idx, ids)
      }
    }
    val tC = Future {
      (1 to 2).foreach { _ =>
        Thread.sleep(rnd.nextInt(500))
        FullText.compactTextIndex(spark, idx)
      }
    }
    Await.result(tA, 5.minutes)
    Await.result(tD, 5.minutes)
    Await.result(tC, 5.minutes)
    // a crashed foreign holder appears AFTER the storm; the next
    // mutation must take its lease over and still land exactly
    writeLock(idx, "7 crashed-token deadhost:pid=1")
    fs.setTimes(new Path(s"$idx/_mutation.lock"),
      System.currentTimeMillis() - 3600L * 1000, -1)
    spark.conf.set("graft.index.leaseStaleMs", "1000")
    val lastDead = allIds.filter(_ % 17 == 4).take(2).toSeq
    try FullText.deleteFromTextIndex(spark, idx, lastDead)
    finally spark.conf.unset("graft.index.leaseStaleMs")
    // serial rebuild over the equivalent final corpus
    val deadAll = (deletes.flatten ++ lastDead).toSet
    val idxR = tmp("lease-storm-r")
    FullText.writeTextIndex(
      docs.filter(!$"doc_id".isInCollection(deadAll))
        .select($"doc_id", $"text")
        .unionByName(appends.map(_._2).reduce(_ unionByName _)),
      "doc_id", "text", idxR, storeTermVectors = true)
    def page(i: String) = FullText.bm25SearchStored(spark, i, terms)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(page(idx) == page(idxR),
      "every storm interleaving must equal the serial rebuild")
  }

  test("vector mutation storm: racing appends/deletes/compactions equal the rebuild at fixed artifacts") {
    // the text storm's vector twin: appends encode against PERSISTED
    // artifacts (the q106 stability contract), deletes mask
    // pre-existing ids, compaction preserves semantics — so every
    // interleaving must equal a batch rebuild over (survivors ∪
    // appended) at the SAME artifacts. Runs the whole vector
    // mutation surface under the race the lease serializes.
    val vecs = graft.io.Tables.embeddings(spark, dir)
      .select($"vec_id", $"embedding")
    val idx = tmp("lease-vstorm")
    SimilarityQueries.writeIvfPqIndexFrames(vecs, vecs, idx)
    val rnd = new scala.util.Random(17)
    val appends = (1 to 3).map { i =>
      (s"vs$i", vecs.filter($"vec_id" % 11 === i)
        .select(($"vec_id" + 880000L * i).as("vec_id"), $"embedding"))
    }
    val allIds = vecs.select($"vec_id").collect().map(_.getLong(0))
    val deletes = (0 until 3).map(i =>
      allIds.filter(_ % 13 == i).take(5).toSeq)
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val tA = Future {
      appends.foreach { case (sid, df) =>
        Thread.sleep(rnd.nextInt(300))
        SimilarityQueries.appendToIvfPqIndex(spark, idx, df,
          segmentId = Some(sid))
      }
    }
    val tD = Future {
      deletes.foreach { ids =>
        Thread.sleep(rnd.nextInt(300))
        SimilarityQueries.deleteFromIvfPqIndex(spark, idx, ids)
      }
    }
    val tC = Future {
      (1 to 2).foreach { _ =>
        Thread.sleep(rnd.nextInt(500))
        SimilarityQueries.compactIvfPqIndex(spark, idx)
      }
    }
    Await.result(tA, 5.minutes)
    Await.result(tD, 5.minutes)
    Await.result(tC, 5.minutes)
    // rebuild over the equivalent final corpus at the SAME artifacts
    val deadAll = deletes.flatten.toSet
    val finalCorpus = vecs.filter(!$"vec_id".isInCollection(deadAll))
      .unionByName(appends.map(_._2).reduce(_ unionByName _))
    val idxR = tmp("lease-vstorm-r")
    SimilarityQueries.writeIvfPqIndexFrames(vecs, finalCorpus, idxR)
    def page(i: String) = SimilarityQueries
      .ivfPqSearchStored(spark, i, dir)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(page(idx) == page(idxR),
      "every vector storm interleaving must equal the rebuild at " +
        "fixed artifacts")
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

  test("the band index family honors the mutation lease: the fold refuses a live foreign holder and recovers a stale one") {
    // the near-dup admission artifacts were the one persisted family
    // outside the single-writer contract (its compactor documented
    // "the foreachBatch reader takes no lock") — now the admission
    // stream's batch body and compactBandIndex hold the same lease,
    // so a maintenance fold can never swap-rotate the directories out
    // from under a probing batch
    import graft.ops.Dedup
    val docs = graft.io.Tables.documents(spark, dir).limit(60)
    val idx = tmp("lease-band")
    val prepped = docs.select($"doc_id".as("id"),
      Dedup.shingles(Dedup.tokens($"text")).as("sh"))
      .filter($"sh".isNotNull)
    def appendOnce(): Unit = {
      prepped
        .withColumn("bandh", Dedup.bandHashesDirect($"sh", 16, 4))
        .select($"id",
          posexplode_outer($"bandh").as(Seq("band", "band_hash")))
        .write.mode("append").parquet(s"$idx/bands")
      prepped.select($"id", $"sh")
        .write.mode("append").parquet(s"$idx/shingles")
    }
    appendOnce()
    appendOnce() // the at-least-once replay the fold exists to reclaim
    writeLock(idx, "2 foreign-token otherhost:pid=55")
    val e = intercept[IllegalStateException] {
      Dedup.compactBandIndex(spark, idx)
    }
    assert(e.getMessage.contains("being mutated"))
    // a crashed holder: aged past the stale window, the fold takes
    // over, reclaims the replayed rows, and releases
    fs.setTimes(new Path(s"$idx/_mutation.lock"),
      System.currentTimeMillis() - 3600L * 1000, -1)
    spark.conf.set("graft.index.leaseStaleMs", "1000")
    try {
      val ((bB, bA), (sB, sA)) = Dedup.compactBandIndex(spark, idx)
      assert(bA == bB / 2 && sA == sB / 2,
        s"the fold must drop exactly the replayed duplicates " +
          s"(bands $bB->$bA, shingles $sB->$sA)")
    } finally spark.conf.unset("graft.index.leaseStaleMs")
    assert(!Layout.pathExists(spark, s"$idx/_mutation.lock"),
      "the fold's clean release must reclaim the lease")
  }

  test("setTimes-blind filesystem: the heartbeat probes the capability and keeps a live holder fresh via the sidecar; a crashed one still goes stale") {
    // the object-store failure mode: a FileSystem whose setTimes is a
    // silent no-op starves an mtime-touch heartbeat — the lock's
    // mtime never moves, a live multi-hour mutation looks crashed
    // after leaseStaleMs, and the takeover machinery attacks exactly
    // the holder it exists to protect. The heartbeat must PROBE the
    // capability and route liveness through the `_mutation.lock.hb`
    // sidecar instead.
    spark.sparkContext.hadoopConfiguration.set("fs.nost.impl",
      classOf[NoSetTimesFileSystem].getName)
    val idx = "nost://" + tmp("lease-nost")
    val lock = new Path(s"$idx/_mutation.lock")
    val sidecar = new Path(s"$idx/_mutation.lock.hb")
    val nfs = lock.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // sanity: the wrapper really ignores setTimes (else this fixture
    // tests nothing)
    nfs.mkdirs(new Path(idx))
    val probe = new Path(s"$idx/_probe")
    nfs.create(probe, true).close()
    val m0 = nfs.getFileStatus(probe).getModificationTime
    nfs.setTimes(probe, m0 + 99999, -1)
    assert(nfs.getFileStatus(probe).getModificationTime == m0,
      "nost:// must ignore setTimes")
    spark.conf.set("graft.index.leaseStaleMs", "1500")
    try {
      // a LIVE holder survives 3x the stale window: the staleness
      // clock (the same read acquireLease's takeover check uses) must
      // never approach staleMs while the sidecar heartbeat beats
      import scala.concurrent.{Await, Future}
      import scala.concurrent.duration._
      import scala.concurrent.ExecutionContext.Implicits.global
      val holder = Future {
        Layout.withMutationLease(spark, idx) {
          Thread.sleep(5200); "done"
        }
      }
      val t0 = System.currentTimeMillis()
      while (!nfs.exists(lock) &&
          System.currentTimeMillis() - t0 < 10000)
        Thread.sleep(100)
      assert(nfs.exists(lock), "the holder must acquire")
      var sawSidecar = false
      val tStart = System.currentTimeMillis()
      while (System.currentTimeMillis() - tStart < 4500) { // 3x window
        Thread.sleep(300)
        if (nfs.exists(lock)) {
          val age = Layout.leaseAgeMs(spark, idx)
          assert(age < 1500,
            s"a live holder must never look stale on a setTimes-blind " +
              s"store (staleness clock read ${age}ms of the 1500ms " +
              "window) — the sidecar heartbeat is not refreshing")
          sawSidecar = sawSidecar || nfs.exists(sidecar)
        }
      }
      assert(sawSidecar,
        "liveness must flow through the heartbeat sidecar where " +
          "setTimes is a no-op")
      assert(Await.result(holder, 2.minutes) == "done")
      assert(!nfs.exists(lock) && !nfs.exists(sidecar),
        "release must reclaim the lock AND its sidecar")
      // a CRASHED holder (lock on disk, no heartbeat) still goes
      // stale by wall clock — creation mtime ages naturally even
      // where setTimes can't fake it — and the next mutator takes
      // over through the ordinary acquire path
      val out = nfs.create(lock, true)
      out.write("0 dead-token deadhost:pid=1".getBytes("UTF-8"))
      out.close()
      Thread.sleep(1900) // > staleMs of real wall-clock silence
      var ran = false
      Layout.withMutationLease(spark, idx) { ran = true }
      assert(ran, "the takeover must reach the mutation body")
      assert(!nfs.exists(lock),
        "the takeover's clean release must reclaim the lease")
      // contrast pin: on a filesystem where setTimes WORKS the
      // heartbeat keeps touching mtime and writes NO sidecar
      val lIdx = tmp("lease-mtime")
      Layout.withMutationLease(spark, lIdx) { Thread.sleep(1200) }
      assert(!Layout.pathExists(spark, s"$lIdx/_mutation.lock.hb"),
        "a working-setTimes filesystem must not grow sidecars")
    } finally spark.conf.unset("graft.index.leaseStaleMs")
  }

  test("pinned residual window: a zombie past the second fence that loses a takeover publishes the intruder's COMPLETE generation, never a mixed one") {
    // the one instant the commit protocol cannot close without a CAS
    // primitive: a writer that passed the second fence re-read and
    // then lost a full takeover before its marker create. The code
    // comment argues the worst case is publishing the INTRUDER's
    // fully-renamed, complete generation slightly early (the zombie's
    // own dirs were already replaced) — this fixture turns that
    // argument into a pinned observable via Layout.beforeMarkerHook,
    // the test-only seam at exactly that instant.
    val docs = graft.io.Tables.documents(spark, dir).limit(80)
    val idx = tmp("lease-marker")
    FullText.writeTextIndex(docs, "doc_id", "text", idx,
      storeTermVectors = true)
    val allIds = docs.select($"doc_id").collect().map(_.getLong(0)).sorted
    val zombieDead = allIds.take(2).toSeq
    val intruderDead = allIds.slice(2, 4).toSeq
    // the intruder's generation, built for real on a CLONE of the
    // index (same base artifacts, so its manifest's relative dir
    // names resolve identically): its delete of intruderDead commits
    // the clone's gen-1
    val clone = tmp("lease-marker") + "/clone"
    val conf = spark.sparkContext.hadoopConfiguration
    org.apache.hadoop.fs.FileUtil.copy(fs, new Path(idx), fs,
      new Path(clone), false, true, conf)
    FullText.deleteFromTextIndex(spark, clone, intruderDead)
    assert(Layout.liveGeneration(spark, clone).contains(1L))
    // arm the seam: between the zombie's second fence pass and its
    // marker create, a takeover lands — the lock flips to the
    // intruder's token and the intruder's generation is fully renamed
    // into place (unmarked: the intruder is an instant from its OWN
    // marker create)
    Layout.beforeMarkerHook = () => {
      Layout.beforeMarkerHook = () => () // one-shot: not for the clone
      writeLock(idx, "1 intruder-token otherhost:pid=42")
      fs.delete(new Path(s"$idx/gen-1"), true)
      org.apache.hadoop.fs.FileUtil.copy(fs, new Path(s"$clone/gen-1"),
        fs, new Path(s"$idx/gen-1"), false, true, conf)
      fs.delete(new Path(s"$idx/gen-1/_COMMITTED"), false)
    }
    try {
      // the zombie's delete: stages, passes both fences, loses the
      // takeover at the seam, then creates the marker anyway — the
      // at-worst outcome is that create publishing the intruder's
      // complete generation slightly early
      FullText.deleteFromTextIndex(spark, idx, zombieDead)
    } finally Layout.beforeMarkerHook = () => ()
    assert(Layout.liveGeneration(spark, idx).contains(1L),
      "the early publication must be a committed generation")
    val tombs = spark.read.parquet(s"$idx/gen-1/tombstones")
      .collect().map(_.getLong(0)).toSet
    assert(tombs == intruderDead.toSet,
      s"the published generation must be ENTIRELY the intruder's " +
        s"(found tombstones $tombs — zombie content would be " +
        s"${zombieDead.toSet})")
    def page(i: String) = FullText.bm25SearchStored(spark, i, terms)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(page(idx) == page(clone),
      "the early-published index must equal the intruder's complete " +
        "state — never a mix of two writers")
    // the zombie's release must not reclaim the intruder's lease
    assert(Layout.pathExists(spark, s"$idx/_mutation.lock"),
      "a zombie's release must leave the intruder's lease standing")
    fs.delete(new Path(s"$idx/_mutation.lock"), false)
  }

  test("a lease released mid-inspection reads as contention: the --wait poller retries the create instead of crashing") {
    // the acquireLease race: exists(lock) returns true, the holder
    // releases, readLease throws FileNotFound — a plain IOException
    // that would crash a --wait caller at exactly the moment the
    // lease frees. The fix maps it to LeaseHeldException, which the
    // poll loop retries; the retried create then wins the (now-free)
    // lock and the mutation lands.
    val docs = graft.io.Tables.documents(spark, dir).limit(40)
    val idx = tmp("lease-fnf")
    FullText.writeTextIndex(docs, "doc_id", "text", idx,
      storeTermVectors = true)
    writeLock(idx, "1 about-to-release otherhost:pid=9")
    val dead = docs.limit(1).select($"doc_id")
      .collect().map(_.getLong(0)).toSeq
    // the hook fires INSIDE the race window (after exists, before
    // readLease) and releases the lock exactly once — the
    // deterministic version of a holder whose release interleaves
    var fired = false
    Layout.afterLeaseExistsHook = () => {
      if (!fired) {
        fired = true
        fs.delete(new Path(s"$idx/_mutation.lock"), false)
      }
    }
    spark.conf.set("graft.index.leaseWaitMs", "30000")
    try {
      FullText.deleteFromTextIndex(spark, idx, dead) // must land
    } finally {
      Layout.afterLeaseExistsHook = () => ()
      spark.conf.unset("graft.index.leaseWaitMs")
    }
    assert(fired, "the pin must have exercised the race window")
    assert(spark.read
      .parquet(s"${FullText.liveArtifactDir(spark, idx)}/stats")
      .head().getAs[Long]("n_docs") == docs.count() - 1,
      "the retried acquisition must run the mutation exactly once")
    // and WITHOUT a wait window the same race surfaces as the typed
    // contention error (diagnosable), not a raw FileNotFound
    writeLock(idx, "1 about-to-release-2 otherhost:pid=9")
    fired = false
    Layout.afterLeaseExistsHook = () => {
      if (!fired) {
        fired = true
        fs.delete(new Path(s"$idx/_mutation.lock"), false)
      }
    }
    try {
      val e = intercept[LeaseHeldException] {
        FullText.deleteFromTextIndex(spark, idx,
          Seq(dead.head + 1))
      }
      assert(e.getMessage.contains("released while being inspected"))
    } finally Layout.afterLeaseExistsHook = () => ()
  }

  test("band-fold fence: a zombie compactor aborts before the swap renames instead of rotating away an intruder's rows") {
    // the swap-rotation twin of the commitGeneration fence: a holder
    // that lost a stale-lease takeover mid-fold re-reads the lock
    // immediately before the rename pair and ABORTS — without it, the
    // zombie's pre-takeover-computed bands/shingles would rename over
    // whatever the intruder appended, silently losing those rows
    import graft.ops.Dedup
    val docs = graft.io.Tables.documents(spark, dir).limit(40)
    val idx = tmp("lease-band-fence")
    val prepped = docs.select($"doc_id".as("id"),
      Dedup.shingles(Dedup.tokens($"text")).as("sh"))
      .filter($"sh".isNotNull)
    prepped.withColumn("bandh", Dedup.bandHashesDirect($"sh", 16, 4))
      .select($"id",
        posexplode_outer($"bandh").as(Seq("band", "band_hash")))
      .write.mode("append").parquet(s"$idx/bands")
    prepped.select($"id", $"sh")
      .write.mode("append").parquet(s"$idx/shingles")
    val bandsBefore = spark.read.parquet(s"$idx/bands").count()
    // become the (soon-to-be-zombie) holder, then simulate the
    // takeover: the lock now carries the intruder's token; the nested
    // compactBandIndex call rides the outer lease (same thread) and
    // its fence re-read must abort before any rename
    val e = intercept[IllegalStateException] {
      Layout.withMutationLease(spark, idx) {
        writeLock(idx, "9 intruder-token otherhost:pid=31")
        Dedup.compactBandIndex(spark, idx)
      }
    }
    assert(e.getMessage.contains("taken over"),
      s"the fence must name the takeover (got: ${e.getMessage})")
    assert(spark.read.parquet(s"$idx/bands").count() == bandsBefore,
      "an aborted fold must leave the live band artifacts untouched")
    assert(Layout.pathExists(spark, s"$idx/_mutation.lock"),
      "the zombie's release must not reclaim the intruder's lease")
    fs.delete(new Path(s"$idx/_mutation.lock"), false)
  }

  test("a crashed heartbeat's write-aside (.hb.tmp) is reclaimed at release and at takeover") {
    val docs = graft.io.Tables.documents(spark, dir).limit(30)
    val idx = tmp("lease-hbtmp")
    FullText.writeTextIndex(docs, "doc_id", "text", idx)
    // a beat that crashed between create and rename leaves the aside;
    // it is never read (staleness parses only the renamed sidecar)
    // but without cleanup it persists in the index dir forever
    def strand(): Unit = {
      val out = fs.create(new Path(s"$idx/_mutation.lock.hb.tmp"), true)
      out.write("dead-token 123".getBytes("UTF-8"))
      out.close()
    }
    strand()
    FullText.deleteFromTextIndex(spark, idx,
      docs.limit(1).select($"doc_id").collect().map(_.getLong(0)).toSeq)
    assert(!Layout.pathExists(spark, s"$idx/_mutation.lock.hb.tmp"),
      "release must reclaim a stranded heartbeat write-aside")
    // and the stale-takeover path reclaims a crashed holder's aside
    writeLock(idx, "4 crashed-token otherhost:pid=13")
    fs.setTimes(new Path(s"$idx/_mutation.lock"),
      System.currentTimeMillis() - 3600L * 1000, -1)
    strand()
    spark.conf.set("graft.index.leaseStaleMs", "1000")
    try {
      FullText.deleteFromTextIndex(spark, idx,
        docs.limit(2).select($"doc_id").collect().map(_.getLong(0))
          .toSeq)
    } finally spark.conf.unset("graft.index.leaseStaleMs")
    assert(!Layout.pathExists(spark, s"$idx/_mutation.lock.hb.tmp"),
      "takeover must reclaim the crashed holder's write-aside")
  }
}
