package graft.io

import org.apache.spark.sql.functions._

import graft.SparkSpecBase
import graft.ops.FullText
import graft.queries.SimilarityQueries

/** The explicit-snapshot contract: `retainGenerations > 1` keeps a
  * commit from deleting artifacts under a running reader, but every
  * read face re-resolves the live generation per call — a multi-query
  * session could see gen-N for one page and gen-N+1 for the next.
  * [[Layout.withPinnedGeneration]] holds the whole session on one
  * committed generation, for BOTH families, bit-stable across a
  * concurrent commit; pinned sessions are read-only by construction. */
class GenerationPinSpec extends SparkSpecBase {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"
  private val terms = Seq("fast", "vector", "query")

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix)
      .toFile.getAbsolutePath

  /** Run `body` on a fresh thread and rethrow its failure — the
    * concurrent committer of the race (the pin is thread-scoped, so
    * the commit must come from another thread to model a second
    * session mutating mid-read). */
  private def onOtherThread(body: => Unit): Unit = {
    var err: Option[Throwable] = None
    val t = new Thread(() => {
      try body catch { case e: Throwable => err = Some(e) }
    })
    t.start()
    t.join()
    err.foreach(throw _)
  }

  test("text: a reader pinned at gen-N serves bit-equal pages while gen-N+1 commits mid-session") {
    val docs = graft.io.Tables.documents(spark, dir)
    val idx = tmp("pin-t")
    FullText.writeTextIndex(docs, "doc_id", "text", idx,
      storeTermVectors = true)
    def page() = FullText.bm25SearchStored(spark, idx, terms)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    // gen-1: delete the top hit (so the snapshots differ observably)
    val batch1 = Seq(page().head._1)
    FullText.deleteFromTextIndex(spark, idx, batch1)
    assert(Layout.liveGeneration(spark, idx).contains(1L))
    val gen1Page = page()
    val batch2 = Seq(gen1Page.head._1)
    spark.conf.set("graft.index.retainGenerations", "2")
    try {
      Layout.withPinnedGeneration(spark, idx, 1L) {
        val before = page()
        assert(before == gen1Page)
        // gen-2 commits MID-SESSION from another thread (a second
        // writer session; the pin is thread-scoped and must neither
        // block it nor follow it)
        onOtherThread {
          FullText.deleteFromTextIndex(spark, idx, batch2)
        }
        assert(Layout.committedGenerations(spark, idx) == Seq(1L, 2L),
          "gen-2 must have committed while the pin was held")
        assert(page() == before,
          "a pinned reader must serve bit-equal pages across the commit")
        // the pinned session is READ-ONLY: a mutation here would
        // resolve its base from gen-1 and fork history against gen-2
        val e = intercept[IllegalStateException] {
          FullText.deleteFromTextIndex(spark, idx, Seq(999999L))
        }
        assert(e.getMessage.contains("read-only"))
      }
      // outside the pin the same thread follows the live generation
      assert(page() != gen1Page,
        "the unpinned read must see gen-2's delete")
      assert(!page().exists(_._1 == batch2.head))
      // pinning an uncommitted (or retired) generation fails at the
      // pin, not deep inside a query plan
      val e = intercept[IllegalArgumentException] {
        Layout.withPinnedGeneration(spark, idx, 9L) { page() }
      }
      assert(e.getMessage.contains("not committed"))
    } finally spark.conf.unset("graft.index.retainGenerations")
  }

  test("vector: the pinned snapshot holds across a concurrent delete; nested pins shadow") {
    val idx = tmp("pin-v")
    SimilarityQueries.writeIvfPqIndex(spark, dir, idx)
    def page() = SimilarityQueries.ivfPqSearchStored(spark, idx, dir)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val d1 = Seq(page().head._1)
    SimilarityQueries.deleteFromIvfPqIndex(spark, idx, d1)
    val gen1Page = page()
    val d2 = Seq(gen1Page.head._1)
    spark.conf.set("graft.index.retainGenerations", "2")
    try {
      Layout.withPinnedGeneration(spark, idx, 1L) {
        val before = page()
        onOtherThread {
          SimilarityQueries.deleteFromIvfPqIndex(spark, idx, d2)
        }
        assert(page() == before,
          "the pinned vector session must not see the concurrent delete")
        assert(before.exists(_._1 == d2.head),
          "the pinned page still serves the id gen-2 tombstoned")
        // nested pin shadows (innermost wins), outer restores
        Layout.withPinnedGeneration(spark, idx, 2L) {
          assert(!page().exists(_._1 == d2.head),
            "the inner pin at gen-2 must see its tombstone")
        }
        assert(page() == before, "the outer pin must restore")
      }
      assert(!page().exists(_._1 == d2.head),
        "the unpinned read follows the live generation")
    } finally spark.conf.unset("graft.index.retainGenerations")
  }

  test("a retire mid-session fails the pinned reader loudly; an abandoned pin never leaks") {
    val docs = graft.io.Tables.documents(spark, dir).limit(50)
    val idx = tmp("pin-retire")
    FullText.writeTextIndex(docs, "doc_id", "text", idx,
      storeTermVectors = true)
    val ids = docs.select($"doc_id").collect().map(_.getLong(0))
    FullText.deleteFromTextIndex(spark, idx, Seq(ids(0))) // gen-1
    def page() = FullText.bm25SearchStored(spark, idx, terms)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    // retainGenerations stays at the default 1: the gen-2 commit
    // RETIRES gen-1 under the running pinned reader — the next read
    // must fail with the actionable message (naming the retain knob),
    // never silently read deleted artifacts or fall back to live
    val e = intercept[IllegalArgumentException] {
      Layout.withPinnedGeneration(spark, idx, 1L) {
        page() // fine: gen-1 still committed
        onOtherThread {
          FullText.deleteFromTextIndex(spark, idx, Seq(ids(1)))
        }
        page() // gen-1 is gone: must throw, not mis-read
      }
    }
    assert(e.getMessage.contains("retainGenerations"),
      s"the failure must point at the retain knob (got ${e.getMessage})")
    // the pin unwound with the exception: the same thread reads live
    // (a leaked pin would keep throwing on every later read) and may
    // mutate again
    assert(Layout.liveGeneration(spark, idx).contains(2L))
    assert(page().nonEmpty)
    FullText.deleteFromTextIndex(spark, idx, Seq(ids(2)))
    assert(Layout.liveGeneration(spark, idx).contains(3L),
      "mutations must work again once the pin unwound")
  }
}
