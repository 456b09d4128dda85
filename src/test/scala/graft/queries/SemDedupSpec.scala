package graft.queries

import java.nio.file.Files

import graft.SparkSpecBase
import graft.ops.Checkpoints

/** SemDeDup semantics on a hand-computable fixture: orthogonal seed
  * clusters, one planted near-dup (dropped), one low-similarity
  * cluster-mate (kept) — plus the checkpoint-hygiene contract. */
class SemDedupSpec extends SparkSpecBase {

  /** 8-d fixture, 4 clusters (numCentroids = 4 ⇒ seeds are v0–v3):
    *  - v4 ≈ v0 (cos 0.993)        → cluster 0, dropped
    *  - v5 weakly aligned with v0 (cos 0.313 < 0.35, and 0.311 vs v4)
    *                                → cluster 0, kept
    *  - v6 ≈ v2 (cos 0.999)        → cluster 2, dropped
    * One Lloyd round only shifts centroids toward their members, so
    * assignments are stable and the pair structure is exactly this. */
  private lazy val dir: String = {
    import spark.implicits._
    val d = Files.createTempDirectory("semdedup").toFile.getAbsolutePath
    def unit(i: Int): Array[Float] = {
      val a = new Array[Float](8); a(i) = 1f; a
    }
    val rows = Seq(
      (0L, unit(0), 0),
      (1L, unit(1), 1),
      (2L, unit(2), 2),
      (3L, unit(3), 3),
      (4L, Array(0.9f, 0.1f, 0f, 0f, 0f, 0f, 0f, 0f), 0),
      (5L, Array(0.2f, 0f, 0f, 0f, 0.35f, 0.35f, 0.35f, 0f), 0),
      (6L, Array(0f, 0f, 0.95f, 0.05f, 0f, 0f, 0f, 0f), 2))
    rows.toDF("vec_id", "embedding", "label")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/embeddings.parquet")
    d
  }

  test("near-dups drop, weakly-similar cluster-mates survive") {
    val r = Checkpoints.consume(
      SimilarityQueries.semanticDedup(spark, dir, numCentroids = 4))(
      _.collect())
    assert(r.length == 7)
    val byId = r.map(x => x.getLong(0) -> (x.getLong(1), x.getLong(2))).toMap
    // seeds keep themselves (smallest id in every qualifying pair)
    for (i <- 0L to 3L) assert(byId(i)._2 == 1L, s"seed $i")
    assert(byId(4L) == (0L, 0L)) // planted near-dup of v0
    assert(byId(5L) == (0L, 1L)) // same cluster, below threshold
    assert(byId(6L) == (2L, 0L)) // planted near-dup of v2
  }

  test("repeated runs leave executor storage flat (consume frees x AND the Lloyd frame)") {
    // warm once so session-level leftovers don't skew the baseline
    Checkpoints.consume(
      SimilarityQueries.semanticDedup(spark, dir, numCentroids = 4))(
      _.collect())
    val before = Checkpoints.retainedRddIds(spark)
    (1 to 3).foreach { _ =>
      Checkpoints.consume(
        SimilarityQueries.semanticDedup(spark, dir, numCentroids = 4))(
        _.collect())
    }
    val after = Checkpoints.retainedRddIds(spark)
    assert(after == before, s"leaked RDDs: ${after -- before}")
  }
}
