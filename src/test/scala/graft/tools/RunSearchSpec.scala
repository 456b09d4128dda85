package graft.tools

import org.apache.spark.sql.functions._

import graft.SparkSpecBase
import graft.io.Tables
import graft.queries.TextQueries

/** The search CLI's frame contract: q128 ranking + q130 raw-offset
  * highlighting, hit-for-hit. */
class RunSearchSpec extends SparkSpecBase {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("hits equal the gated simple_query_string ranking, highlighted") {
    val q = "fast vector"
    val out = RunSearch.run(spark, dir, q).collect()
    assert(out.nonEmpty)
    val gated = TextQueries.simpleQueryString(spark, dir, q, 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(out.map(r => (r.getLong(0), r.getDouble(1))).toSeq == gated,
      "CLI ranking must be exactly the gated operator's")
    // raw-offset highlighting: tags strip back to the stored text
    val texts = Tables.documents(spark, dir)
      .filter($"doc_id".isInCollection(out.map(_.getLong(0)).toSeq))
      .select($"doc_id", $"text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    out.foreach { r =>
      val stripped = r.getString(2)
        .replace("<em>", "").replace("</em>", "")
      assert(stripped == texts(r.getLong(0)),
        s"tag-strip must round-trip doc ${r.getLong(0)}")
    }
    assert(out.exists(_.getString(2).contains("<em>")),
      "at least one hit must carry a highlight")
  }

  test("must_not clauses exclude; phrase terms highlight too") {
    val q = "fast -vector"
    val hits = RunSearch.run(spark, dir, q).collect()
    val ids = hits.map(_.getLong(0)).toSeq
    if (ids.nonEmpty) {
      val withVector = Tables.documents(spark, dir)
        .filter($"doc_id".isInCollection(ids))
        .filter(array_contains(graft.ops.FullText.analyze($"text"),
          "vector"))
        .count()
      assert(withVector == 0, "must_not docs may not surface")
    }
    val qp = "\"fast vector\""
    val ph = RunSearch.run(spark, dir, qp).collect()
    ph.foreach { r =>
      assert(r.getString(2).contains("<em>"),
        "phrase hits must highlight the phrase's terms")
    }
  }

  test("hybrid CLI serves the fused page from both stored indexes, hit-for-hit") {
    val tIdx = java.nio.file.Files.createTempDirectory("cli-hyb-t")
      .toFile.getAbsolutePath
    graft.ops.FullText.writeTextIndex(
      Tables.documents(spark, dir), "doc_id", "text", tIdx,
      storePositions = false)
    val vIdx = java.nio.file.Files.createTempDirectory("cli-hyb-v")
      .toFile.getAbsolutePath
    graft.queries.SimilarityQueries.writeIvfPqIndex(spark, dir, vIdx)
    val q = "fast vector query"
    val out = RunSearch.runHybrid(spark, dir, q, tIdx, vIdx).collect()
    assert(out.nonEmpty)
    // the CLI page IS the gated hybrid operator's page over the same
    // analyzed terms (rrfFuse is shared — only the legs could differ,
    // and both serve from the same artifacts here)
    val gated = TextQueries.hybridRrfSearchStored(spark, tIdx, vIdx,
        dir, terms = Seq("fast", "vector", "query"))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(out.map(r => (r.getLong(0), r.getDouble(1))).toSeq == gated,
      "hybrid CLI ranking must be exactly the stored hybrid operator's")
    // highlights still round-trip on the fused page
    val texts = Tables.documents(spark, dir)
      .filter($"doc_id".isInCollection(out.map(_.getLong(0)).toSeq))
      .select($"doc_id", $"text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    out.foreach { r =>
      val stripped = r.getString(2)
        .replace("<em>", "").replace("</em>", "")
      assert(stripped == texts(r.getLong(0)),
        s"tag-strip must round-trip doc ${r.getLong(0)}")
    }
  }

  test("--generation pins the page while a newer generation commits between invocations") {
    val idx = java.nio.file.Files.createTempDirectory("cli-pin")
      .toFile.getAbsolutePath
    graft.ops.FullText.writeTextIndex(
      Tables.documents(spark, dir), "doc_id", "text", idx,
      storePositions = false)
    spark.conf.set("graft.index.retainGenerations", "3")
    try {
      graft.ops.FullText.appendToTextIndex(spark,
        Seq((9500001L, "pin probe baseline"))
          .toDF("doc_id", "text"),
        "doc_id", "text", idx, segmentId = Some("p1"))
      val q = "fast vector"
      def page(gen: Option[Long]) =
        RunSearch.run(spark, dir, q, 10, Some(idx), generation = gen)
          .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      val pinned1 = page(Some(1L))
      assert(pinned1.nonEmpty)
      // a newer commit lands BETWEEN the two pinned invocations: a
      // repeated doc stuffed with the query terms that re-ranks the
      // live page (and moves every BM25 score through n_docs/avgdl)
      graft.ops.FullText.appendToTextIndex(spark,
        Seq((9500002L, "fast vector fast vector fast vector"))
          .toDF("doc_id", "text"),
        "doc_id", "text", idx, segmentId = Some("p2"))
      // the synthetic doc can't pass the CLI's highlight join (it
      // has no corpus text row) — the live page moves through the
      // corpus statistics instead: n_docs/avgdl shifted, so every
      // BM25 score drifts off the pinned snapshot's
      val live = page(None)
      assert(live != pinned1,
        "the fixture must actually move the live page")
      assert(page(Some(1L)) == pinned1,
        "the pinned page must be bit-stable across the commit")
      // the pinnable list is discoverable from the status face
      assert(RunStatus.describe(spark, idx)
        .contains("\"committed_generations\":[1,2]"))
      // a pin without a stored index is a usage error, not a scan
      intercept[IllegalArgumentException] {
        RunSearch.run(spark, dir, q, 10, None, generation = Some(1L))
      }
    } finally spark.conf.unset("graft.index.retainGenerations")
  }
}
