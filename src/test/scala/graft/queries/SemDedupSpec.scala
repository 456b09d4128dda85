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

  test("cluster-size cap: sub-bucket count is exact, volume grows ~N·cap not N²") {
    import spark.implicits._
    def assigned(n: Int) =
      (0 until n).map(i => (i.toLong, 0L)).toDF("vec_id", "cent_id")
    val cap = 8
    def volume(n: Int): (Long, Long) = {
      val buckets = SimilarityQueries.capBuckets(assigned(n), cap)
        .groupBy($"cent_id", $"sub_id").count().collect()
      val g = buckets.length.toLong
      val vol = buckets.map(b => b.getLong(2) * b.getLong(2)).sum
      (g, vol)
    }
    // one degenerate cluster of 64 → exactly ⌈64/8⌉ = 8 sub-buckets
    val (g64, v64) = volume(64)
    assert(g64 == 8L)
    // md5 split isn't perfectly even; 2× the even-split bound N·cap is
    // the pinned envelope, far under the uncapped N² volume
    assert(v64 <= 2L * 64 * cap && v64 < 64L * 64)
    // growth: 4× the corpus must grow volume ~4× (linear), not 16×
    val (g256, v256) = volume(256)
    assert(g256 == 32L)
    assert(v256 <= 2L * 256 * cap && v256 < 8L * v64)
  }

  test("cluster-size cap is the identity when no cluster exceeds it") {
    import spark.implicits._
    val x = Seq((10L, 0L), (11L, 0L), (12L, 1L)).toDF("vec_id", "cent_id")
    val out = SimilarityQueries.capBuckets(x, maxClusterSize = 8)
      .select($"vec_id", $"cent_id", $"sub_id").collect()
    assert(out.forall(_.getLong(2) == 0L))
    assert(out.length == 3)
  }

  test("arbitrary id spaces cluster correctly (rank-based seeding)") {
    import spark.implicits._
    // same geometry as the main fixture but ids shifted far above
    // numCentroids — the old `vec_id < k` seeding would find NO seeds
    val d = Files.createTempDirectory("semdedup-ids").toFile.getAbsolutePath
    def unit(i: Int): Array[Float] = {
      val a = new Array[Float](8); a(i) = 1f; a
    }
    Seq(
      (1000L, unit(0)), (1001L, unit(1)), (1002L, unit(2)),
      (1003L, unit(3)),
      (1004L, Array(0.9f, 0.1f, 0f, 0f, 0f, 0f, 0f, 0f)),
      (1005L, Array(0.2f, 0f, 0f, 0f, 0.35f, 0.35f, 0.35f, 0f)),
      (1006L, Array(0f, 0f, 0.95f, 0.05f, 0f, 0f, 0f, 0f)))
      .toDF("vec_id", "embedding")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/embeddings.parquet")
    val r = Checkpoints.consume(
      SimilarityQueries.semanticDedup(spark, d, numCentroids = 4))(
      _.collect())
    assert(r.length == 7)
    val byId = r.map(x => x.getLong(0) -> (x.getLong(1), x.getLong(2))).toMap
    for (i <- 1000L to 1003L) assert(byId(i)._2 == 1L, s"seed $i")
    assert(byId(1004L) == (0L, 0L)) // near-dup of the rank-0 seed
    assert(byId(1005L) == (0L, 1L)) // same cluster, below threshold
    assert(byId(1006L) == (2L, 0L)) // near-dup of the rank-2 seed
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
