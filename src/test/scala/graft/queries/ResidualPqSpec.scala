package graft.queries

import java.nio.file.Files

import graft.SparkSpecBase
import graft.ops.ProductQuant

/** Residual IVF+PQ (q64) vs plain IVF+PQ (q55) at EQUAL code size:
  * on a clustered corpus the residual quantizer only has to span
  * within-cell offsets, so its shortlist recall must strictly beat
  * the raw-vector quantizer's — plus the deterministic tie-break
  * contract for the exactly-zero residuals of cell-seed vectors. */
class ResidualPqSpec extends SparkSpecBase {

  /** 320 vectors in 8 well-separated clusters (center scale 10×
    * within-cluster scale), with LOW-RANK within-cluster offsets
    * (each member = center + a·d1 + b·d2 along two cluster-specific
    * directions — the local-manifold shape of real embedding data):
    * the geometry where plain PQ spends its centroids on
    * BETWEEN-cluster variation and flattens the within-cluster
    * ranking the query actually needs, while the residual quantizer
    * sees only the two-direction offsets and resolves them. */
  private lazy val dir: String = {
    import spark.implicits._
    val d = Files.createTempDirectory("residpq").toFile.getAbsolutePath
    val rnd = new scala.util.Random(42)
    def unitDir(): Array[Double] = {
      val v = Array.fill(64)(rnd.nextDouble() * 2 - 1)
      val n = math.sqrt(v.map(x => x * x).sum)
      v.map(_ / n)
    }
    val centers = Array.fill(16)(Array.fill(64)((rnd.nextDouble() * 2 - 1) * 10))
    val dirs = Array.fill(16)((unitDir(), unitDir()))
    val rows = (0 until 960).map { i =>
      val ctr = centers(i % 16)
      val (d1, d2) = dirs(i % 16)
      val (a, b) = ((rnd.nextDouble() * 2 - 1) * 2,
        (rnd.nextDouble() * 2 - 1) * 2)
      (i.toLong, ctr.indices.map(j =>
        (ctr(j) + a * d1(j) + b * d2(j)).toFloat).toArray)
    }
    rows.toDF("vec_id", "embedding").coalesce(1)
      .write.mode("overwrite").parquet(s"$d/embeddings.parquet")
    d
  }

  test("residual coding strictly improves recall@10 at equal code size") {
    val exact = SimilarityQueries.knnBruteForce(spark, dir)
      .collect().map(_.getLong(0)).toSet
    // shortlist 15 stresses ADC precision: the probed cells hold the
    // query's whole ~40-member cluster, so a quantizer that can't
    // rank WITHIN the cluster fails to shortlist the true neighbors
    def recall(ids: Array[Long]) = ids.count(exact)
    val plain = SimilarityQueries.ivfPqAnnKnn(spark, dir, shortlist = 15)
      .collect().map(_.getLong(0))
    val resid = SimilarityQueries.ivfPqResidualKnn(spark, dir,
      shortlist = 15).collect().map(_.getLong(0))
    assert(recall(resid) > recall(plain),
      s"residual recall ${recall(resid)} vs plain ${recall(plain)}" +
        s" (resid=${resid.toSeq} plain=${plain.toSeq})")
    // and the gain is signal, not noise: a quantizer that ranks the
    // ~60-member probed cluster FLAT would shortlist near-arbitrarily
    // (expected recall ≈ 10·15/60 = 2.5, where plain PQ in fact
    // lands); the residual coder must clear that band outright.
    // Deterministic: fixed seed + fixed-point codebooks, no flake.
    assert(recall(resid) >= 4, s"residual recall ${recall(resid)} < 4")
    info(s"recall@10: residual=${recall(resid)} plain=${recall(plain)}")
  }

  test("encodeDet: all-tie (zero-residual) rows code to the smallest cent id") {
    import spark.implicits._
    val subs = Seq(
      (7L, 0, Array(0f, 0f)), // zero subvec: every cosine guards to 0
      (8L, 0, Array(1f, 0.1f)))
      .toDF("vec_id", "sub_id", "subvec")
    val cb = Seq(
      (0, 3L, Array(0f, 1f)),
      (0, 5L, Array(1f, 1f)))
      .toDF("sub_id", "cent_id", "cvec")
    val codes = ProductQuant.encodeDet(subs, cb).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(codes(7L) == 3L) // tie → smallest cent_id, not partition luck
    assert(codes(8L) == 5L) // clear max still wins
  }
}
