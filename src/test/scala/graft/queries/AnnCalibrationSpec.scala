package graft.queries

import graft.SparkSpecBase

/** q103 card contract: the dominance relations a deployment relies on
  * when reading the card (and the regression guard for the tiers'
  * kernels). Runs the real card on the sf0.001 tables. */
class AnnCalibrationSpec extends SparkSpecBase {

  private lazy val card: Map[String, (Double, Long, Long)] =
    graft.ops.Checkpoints.consume(
      SimilarityQueries.annCalibrationCard(spark, "/root/testdata/sf0.001"))(
      _.collect()).map(r => r.getString(0) ->
        ((r.getDouble(1), r.getLong(2), r.getLong(3)))).toMap

  test("all ten tiers report, brute force anchors at recall 1") {
    assert(card.keySet == Set("a_brute_force", "b_lsh", "c_lsh_multiprobe",
      "d_ivf", "e_ivf_kmeans", "f_pq", "g_ivfpq", "h_ivfpq_residual",
      "i_sq8", "j_imi"))
    assert(card("a_brute_force")._1 == 1.0)
    assert(card.values.forall { case (r, n, _) => r >= 0.0 && r <= 1.0 && n > 0 })
  }

  test("multi-probe dominates single-probe LSH: more candidates, no less recall") {
    assert(card("c_lsh_multiprobe")._1 >= card("b_lsh")._1)
    assert(card("c_lsh_multiprobe")._2 >= card("b_lsh")._2)
  }

  test("SQ8 recalls at least PQ at 8x the bytes (both full scans)") {
    assert(card("i_sq8")._1 >= card("f_pq")._1)
    assert(card("i_sq8")._3 == 64L && card("f_pq")._3 == 8L)
    assert(card("i_sq8")._2 == card("a_brute_force")._2,
      "full-scan tiers score N-1 candidates")
    assert(card("f_pq")._2 == card("a_brute_force")._2)
  }

  test("residual coding recalls at least plain IVF+PQ at the same probe budget") {
    assert(card("h_ivfpq_residual")._1 >= card("g_ivfpq")._1)
    assert(card("h_ivfpq_residual")._2 == card("g_ivfpq")._2,
      "same cells, same probes, same candidate set")
  }

  test("stored-artifact card equals the self-contained card, with no training in its plans") {
    val dir = "/root/testdata/sf0.001"
    val artDir = java.nio.file.Files
      .createTempDirectory("graft-annart").toString
    SimilarityQueries.writeCalibrationArtifacts(spark, dir, artDir)
    // every bundle member landed as a complete parquet artifact
    for (n <- Seq("buckets", "cells", "assigned", "km_cells",
        "km_assigned", "pq_codebooks", "pq_codes", "norms",
        "res_codebooks", "res_codes", "sq_stats", "imi_codebooks",
        "imi_cells"))
      assert(new java.io.File(s"$artDir/$n/_SUCCESS").exists(), n)
    val stored = graft.ops.Checkpoints.consume(
      SimilarityQueries.annCalibrationCardStored(spark, dir, artDir))(
      _.collect()).map(r => r.getString(0) ->
        ((r.getDouble(1), r.getLong(2), r.getLong(3)))).toMap
    assert(stored == card,
      "cached mode must price every tier identically to the " +
        s"self-contained card: $stored vs $card")
    // layout-unified mode: the IVF+PQ family reads the DEPLOYMENT
    // layout's artifacts — nothing persisted twice, same card
    val idxDir = java.nio.file.Files
      .createTempDirectory("graft-annidx").toString
    val artDir2 = java.nio.file.Files
      .createTempDirectory("graft-annart2").toString
    SimilarityQueries.writeIvfPqIndex(spark, dir, idxDir)
    SimilarityQueries.writeCalibrationArtifacts(spark, dir, artDir2,
      reuseIvfPqIndex = Some(idxDir))
    for (n <- Seq("cells", "assigned", "pq_codebooks", "pq_codes",
        "norms"))
      assert(!new java.io.File(s"$artDir2/$n").exists(),
        s"$n must not be duplicated when the layout is reused")
    val unified = graft.ops.Checkpoints.consume(
      SimilarityQueries.annCalibrationCardStored(spark, dir, artDir2,
        ivfPqIndexDir = Some(idxDir)))(
      _.collect()).map(r => r.getString(0) ->
        ((r.getDouble(1), r.getLong(2), r.getLong(3)))).toMap
    assert(unified == card,
      s"layout-unified card diverged: $unified vs $card")
  }

  test("filtered kNN: every hit satisfies the pre-filter; filter genuinely engages") {
    import spark.implicits._
    val dir = "/root/testdata/sf0.001"
    val hits = SimilarityQueries.filteredKnn(spark, dir)
      .collect().map(_.getLong(0)).toSeq
    assert(hits.nonEmpty && hits.length <= 10)
    val langs = graft.io.Tables.documents(spark, dir)
      .select($"doc_id", $"lang").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    hits.foreach(id => assert(langs(id) == "en",
      s"pre-filter violated by $id (${langs(id)})"))
    // the unfiltered q19 top-10 contains non-en docs at this SF, so
    // pre-filtering actually changes the answer (not a vacuous pin)
    val unfiltered = SimilarityQueries.knnBruteForce(spark, dir)
      .collect().map(_.getLong(0)).toSeq
    assert(unfiltered.exists(id => langs(id) != "en"),
      "fixture check: the filter must bite")
    assert(hits != unfiltered)
  }

  test("batched kNN: salted two-level top-k equals the plain per-query window") {
    import spark.implicits._
    val dir = "/root/testdata/sf0.001"
    val out = SimilarityQueries.knnBatch(spark, dir).collect()
    val byQ = out.groupBy(_.getLong(0))
    assert(byQ.keySet.forall(_ % 100 == 0) && byQ.nonEmpty)
    byQ.foreach { case (qid, rows) =>
      assert(rows.map(_.getLong(1)).toSeq == (1L to rows.length).toSeq,
        s"contiguous ranks for query $qid")
      assert(!rows.exists(_.getLong(2) == qid), "self excluded")
      // the plain single-query brute force is the per-query oracle
      val solo = SimilarityQueries.knnBruteForce(spark, dir, qid, k = 5)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      assert(rows.sortBy(_.getLong(1))
        .map(r => (r.getLong(2), r.getDouble(3))).toSeq == solo,
        s"batch result for query $qid diverges from single-query kNN")
    }
  }

  test("the IVF family shares one candidate set; PQ coding only changes bytes") {
    assert(card("g_ivfpq")._2 == card("d_ivf")._2)
    assert(card("d_ivf")._3 == 256L && card("g_ivfpq")._3 == 8L)
    // pruned tiers scan strictly fewer candidates than full scans
    assert(card("d_ivf")._2 < card("a_brute_force")._2)
    assert(card("b_lsh")._2 < card("a_brute_force")._2)
  }
}
