package graft.ops

import java.nio.file.Files

import graft.SparkSpecBase
import graft.queries.SimilarityQueries

/** OPQ eigenvalue-allocation rotation: orthonormality (cosine
  * preserved), subspace fill, and the recall win over natural-order
  * PQ on a corpus whose variance directions straddle subspace
  * boundaries (the geometry PQ's independence assumption hates). */
class OpqRotationSpec extends SparkSpecBase {

  private val rnd = new scala.util.Random(7)

  /** Random orthonormal basis (Gram–Schmidt, seeded). */
  private def orthoBasis(n: Int): Array[Array[Double]] = {
    val vs = Array.fill(n)(Array.fill(n)(rnd.nextGaussian()))
    for (i <- 0 until n) {
      for (j <- 0 until i) {
        val d = (0 until n).map(k => vs(i)(k) * vs(j)(k)).sum
        for (k <- 0 until n) vs(i)(k) -= d * vs(j)(k)
      }
      val nrm = math.sqrt(vs(i).map(x => x * x).sum)
      for (k <- 0 until n) vs(i)(k) /= nrm
    }
    vs
  }

  /** 400 vectors with ALL the informative variance packed into the
    * FIRST natural subspace (dims 0–7 at scale 8, the rest at 0.05):
    * natural-order PQ must encode eight full-variance dimensions with
    * one 16-centroid codebook while seven codebooks quantize noise —
    * the exact imbalance eigenvalue allocation exists to fix (one
    * principal direction per subspace, 16 centroids each). */
  private lazy val dir: String = {
    import spark.implicits._
    val d = Files.createTempDirectory("opq").toFile.getAbsolutePath
    val rows = (0 until 400).map { i =>
      (i.toLong, Array.tabulate(64)(j =>
        (if (j < 8) 8.0 * rnd.nextGaussian()
         else 0.05 * rnd.nextGaussian()).toFloat))
    }
    rows.toDF("vec_id", "embedding").coalesce(1)
      .write.mode("overwrite").parquet(s"$d/embeddings.parquet")
    d
  }

  test("allocation rotation is orthonormal and fills every subspace") {
    import spark.implicits._
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
    val r = OpqRotation.allocationRotation(
      OpqRotation.covariance(e, "embedding"), m = 8, subdim = 8)
    assert(r.length == 64 && r.forall(_ != null))
    for (i <- 0 until 64; j <- i until 64) {
      val d = (0 until 64).map(k => r(i)(k).toDouble * r(j)(k)).sum
      val expect = if (i == j) 1.0 else 0.0
      assert(math.abs(d - expect) < 1e-4, s"R·Rᵀ($i,$j) = $d")
    }
    // rotation preserves cosine (orthonormal ⇒ dots and norms keep)
    val two = e.orderBy($"vec_id").limit(2).collect()
      .map(_.getSeq[Float](1).map(_.toDouble).toArray)
    def cos(a: Array[Double], b: Array[Double]) = {
      val d0 = a.zip(b).map(p => p._1 * p._2).sum
      d0 / math.sqrt(a.map(x => x * x).sum * b.map(x => x * x).sum)
    }
    def rot(x: Array[Double]) =
      r.map(row => row.zip(x).map(p => p._1 * p._2).sum)
    assert(math.abs(cos(two(0), two(1)) -
      cos(rot(two(0)), rot(two(1)))) < 1e-4)
  }

  test("OPQ rotation strictly improves PQ recall@10 on concentrated variance") {
    val exact = SimilarityQueries.knnBruteForce(spark, dir)
      .collect().map(_.getLong(0)).toSet
    def recall(ids: Array[Long]) = ids.count(exact)
    val plain = SimilarityQueries.pqAnnKnn(spark, dir, shortlist = 12)
      .collect().map(_.getLong(0))
    val opq = SimilarityQueries.pqOpqKnn(spark, dir, shortlist = 12)
      .collect().map(_.getLong(0))
    info(s"recall@10: opq=${recall(opq)} plain=${recall(plain)}")
    assert(recall(opq) > recall(plain),
      s"opq recall ${recall(opq)} vs plain ${recall(plain)}" +
        s" (opq=${opq.toSeq} plain=${plain.toSeq})")
    // pinned margin (7 vs 4 at seed 7): deterministic — fixed seed +
    // fixed-point codebooks — so a floor is safe, not flaky
    assert(recall(opq) >= 6, s"opq recall ${recall(opq)} < 6")
  }
}
