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

  test("the IVF family shares one candidate set; PQ coding only changes bytes") {
    assert(card("g_ivfpq")._2 == card("d_ivf")._2)
    assert(card("d_ivf")._3 == 256L && card("g_ivfpq")._3 == 8L)
    // pruned tiers scan strictly fewer candidates than full scans
    assert(card("d_ivf")._2 < card("a_brute_force")._2)
    assert(card("b_lsh")._2 < card("a_brute_force")._2)
  }
}
