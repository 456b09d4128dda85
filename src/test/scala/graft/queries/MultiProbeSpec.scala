package graft.queries

import graft.SparkSpecBase

/** Multi-probe LSH semantics (q42/q43) against their single-probe and
  * exact counterparts on the sf0.001 tables. Value parity with DuckDB
  * is the driver oracle's job; this spec pins the RELATIONSHIPS: the
  * multi-probe candidate set strictly contains the single-probe one
  * (the home bucket is probe 0), and recall against the exact answer
  * can only improve. */
class MultiProbeSpec extends SparkSpecBase {

  private val dir = "/root/testdata/sf0.001"

  test("multi-probe near-dup pairs are a superset of single-probe pairs") {
    val single = SimilarityQueries.embeddingNearDupPairs(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val multi = SimilarityQueries.embeddingNearDupPairsMultiProbe(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(single.subsetOf(multi),
      s"missing pairs: ${(single -- multi).take(5)}")
    // one-bit-flip probing must actually widen the net on this corpus
    assert(multi.size > single.size,
      s"multi-probe found no extra pairs (${multi.size})")
    // and every pair is emitted exactly once (no dedup pass exists,
    // so collisions across probes would surface as duplicate rows)
    val rows = SimilarityQueries.embeddingNearDupPairsMultiProbe(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(rows.length == rows.distinct.length, "duplicate pairs emitted")
  }

  test("multi-probe kNN recall vs exact is >= single-probe recall") {
    def ids(df: org.apache.spark.sql.DataFrame): Set[Long] =
      df.collect().map(_.getLong(0)).toSet
    val exact = ids(SimilarityQueries.knnBruteForce(spark, dir))
    val single = ids(SimilarityQueries.annLshKnn(spark, dir))
    val multi = ids(SimilarityQueries.annMultiProbeKnn(spark, dir))
    val rSingle = (single & exact).size
    val rMulti = (multi & exact).size
    assert(rMulti >= rSingle,
      s"multi-probe recall $rMulti < single-probe $rSingle")
  }

  test("q90 SQ8: high recall vs exact, approx tracks exact closely") {
    val exact = SimilarityQueries.knnBruteForce(spark, dir)
      .collect().map(_.getLong(0)).toSet
    val rows = SimilarityQueries.sqAnnKnn(spark, dir).collect()
    assert(rows.length == 10)
    val recall = (rows.map(_.getLong(0)).toSet & exact).size
    // 8-bit linear quantization is near-lossless on cosine ranking
    assert(recall >= 8, s"SQ8 recall $recall/10 vs exact")
    rows.foreach { r =>
      val err = math.abs(r.getDouble(1) - r.getDouble(2))
      assert(err < 0.02,
        s"vec ${r.getLong(0)}: |cos_sq - cos_full| = $err")
    }
  }

  test("q90 SQ8: codes stay in [0,255] and reconstruction stays in range") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // reconstructed values can never leave the [lo, hi] envelope:
    // cos_sq of a vector against itself-reconstructed stays ~1
    val e = graft.io.Tables.embeddings(spark, dir)
      .select($"vec_id", $"embedding")
    val out = SimilarityQueries.sqAnnKnn(spark, dir, queryId = 3L)
    assert(out.collect().forall(r => r.getDouble(1) <= 1.0001))
  }
}
