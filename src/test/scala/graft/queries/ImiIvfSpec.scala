package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpecBase
import graft.ops.ProductQuant

/** q104 IMI coarse-quantizer contract: cell-id composition, one cell
  * per vector, and the recall claim vs flat IVF at EQUAL cell count
  * (256) and EQUAL probed-cell budget (4) on a fixture whose cluster
  * structure is visible in both halves — the regime the inverted
  * multi-index is built for. */
class ImiIvfSpec extends SparkSpecBase {
  import spark.implicits._

  private val clusters = 16
  private val perCluster = 30

  /** 480 vectors in 16 well-separated clusters; cluster g is one-hot
    * at dim 2g in the FIRST half and at dim 32+2g in the SECOND half
    * (distinct in both halves), plus small deterministic jitter.
    * vec_ids 0..15 hit all 16 clusters (g = id mod 16), so both the
    * IMI half-codebook seeds and the flat-IVF seed cells see every
    * cluster. */
  private lazy val fixture: DataFrame = {
    val rows = (0 until clusters * perCluster).map { v =>
      val g = v % clusters
      val emb = Array.tabulate(64) { i =>
        val base =
          if (i == 2 * g || i == 32 + 2 * g) 1.0f else 0.0f
        base + ((v * 31 + i * 7) % 5 - 2) * 0.004f
      }
      (v.toLong, emb)
    }
    rows.toDF("vec_id", "embedding")
  }

  private def cos(a: org.apache.spark.sql.Column,
      b: org.apache.spark.sql.Column) =
    graft.expressions.FloatVectorDot.dot(a, b) /
      (sqrt(graft.expressions.FloatVectorDot.dot(a, a)) *
        sqrt(graft.expressions.FloatVectorDot.dot(b, b)))

  private lazy val exactTop10: Set[Long] = fixture
    .filter($"vec_id" =!= 0L)
    .crossJoin(broadcast(fixture.filter($"vec_id" === 0L)
      .select($"embedding".as("qemb"))))
    .withColumn("c", cos($"embedding", $"qemb"))
    .orderBy($"c".desc, $"vec_id".asc).limit(10)
    .select($"vec_id").collect().map(_.getLong(0)).toSet

  test("cell composition: every vector lands in exactly one of the 256 grid cells") {
    val subs = ProductQuant.subVectors(fixture, 2, 32)
    val cb = graft.ops.Checkpoints.consume(
      ProductQuant.trainCodebooks(subs, 16, 1))(_.localCheckpoint())
    val cells = ProductQuant.encode(subs, cb)
      .groupBy($"vec_id")
      .agg((max(when($"sub_id" === 0, $"cent_id")) * 16 +
        max(when($"sub_id" === 1, $"cent_id"))).as("cell_id"),
        count(lit(1)).as("n_halves"))
      .collect()
    graft.ops.Checkpoints.unpersist(cb)
    assert(cells.length == clusters * perCluster)
    assert(cells.forall(_.getLong(2) == 2L), "both halves coded")
    assert(cells.forall { r =>
      val c = r.getLong(1); c >= 0 && c < 256
    })
    // the clustered fixture uses exactly one cell per cluster
    assert(cells.map(_.getLong(1)).distinct.length == clusters)
  }

  test("IMI recalls the full neighborhood where flat IVF at equal cell count fragments it") {
    // IMI: 256 grid cells from 2x16 half-codebooks, probe 2 per half
    // = 4 cells (the q104 defaults, run on the fixture via the same
    // operator composition)
    val imiTop = graft.ops.Checkpoints.consume(imiOn(fixture))(_.collect())
      .map(_.getLong(0)).toSet
    val imiRecall = imiTop.intersect(exactTop10).size / 10.0
    // flat IVF: 256 SEED cells (first 256 vec_ids), probe its 4
    // nearest cells — equal cell count, equal probed-cell budget
    val flatTop = flat256On(fixture).collect().map(_.getLong(0)).toSet
    val flatRecall = flatTop.intersect(exactTop10).size / 10.0
    assert(imiRecall == 1.0,
      s"the grid cell IS the cluster here; got $imiRecall")
    assert(imiRecall >= flatRecall,
      s"imi $imiRecall vs flat-256 $flatRecall")
    assert(flatRecall < 1.0,
      "256 Voronoi seed cells shred each 30-member cluster across " +
        "~16 cells, and 4 probes cannot cover them")
  }

  /** The q104 composition run against an arbitrary frame (the gated
    * query binds it to the driver tables) — the REAL frame-level
    * core, not a copy. */
  private def imiOn(e: DataFrame): DataFrame =
    SimilarityQueries.imiIvfKnnFrames(e, queryId = 0L, k = 10,
      subdim = 32, c = 16, iters = 1, probesPerHalf = 2)
      .select($"vec_id")

  test("lazy multi-sequence walk equals sorting all c² blended cells") {
    // deterministic pseudo-random affinities (no Random: md5-free
    // integer mixing is enough for a combinatorial identity check)
    def mix(seed: Int, i: Int): Double =
      (((seed * 2654435761L + i * 40503L) % 10007L).toDouble - 5003) / 997
    for ((c, probes) <- Seq((8, 5), (40, 7), (40, 1600), (64, 33),
        (100, 64))) {
      val d0 = Array.tabulate(c)(i => mix(7, i))
      val d1 = Array.tabulate(c)(i => mix(13, i))
      val walked = SimilarityQueries.multiSequenceWalk(d0, d1, probes)
      val brute = (for (a <- 0 until c; b <- 0 until c)
        yield (d0(a) + d1(b), a, b))
        .sortBy { case (bl, a, b) => (-bl, a, b) }
        .take(probes).map { case (_, a, b) => (a, b) }
      assert(walked == brute, s"c=$c probes=$probes")
    }
    // exact ties at the boundary resolve with the frame's tie-break
    val d0t = Array(1.0, 1.0, 0.0)
    val d1t = Array(2.0, 2.0, -1.0)
    assert(SimilarityQueries.multiSequenceWalk(d0t, d1t, 3) ==
      Seq((0, 0), (0, 1), (1, 0)))
  }

  test("multi-sequence probing reaches the unevenly-ranked cell the cross prober misses") {
    // 8-dim vectors, c=4 half-centroids, iters=0 → the half-codebooks
    // ARE vec 0..3's halves exactly (seed control). Query vec 4:
    //   half0 dots vs u0..u3: 1.0, 0.25, 0, 0
    //   half1 dots vs w0..w3: 0.75, 0.5, 0.375, 0
    // Blended cell order: (0,0) 1.75, (0,1) 1.5, (0,2) 1.375,
    // (0,3) 1.0 — so multi-seq probes=4 includes cell (0,2), which
    // pairs half0-rank-1 with half1-rank-3. The cross prober at
    // p=2 probes {0,1}x{0,1} and can NEVER reach (0,2).
    def pair(a: Int, b: Int) =
      Array.tabulate(8)(i => if (i == a || i == 4 + b) 1.0f else 0.0f)
    val rows = Seq[(Long, Array[Float])](
      // seeds 0..3: centroid i is one-hot dim i (half0) + dim 4+i (half1)
      0L -> pair(0, 0), 1L -> pair(1, 1), 2L -> pair(2, 2), 3L -> pair(3, 3),
      // query
      4L -> Array(1.0f, 0.25f, 0f, 0f, 0.75f, 0.5f, 0.375f, 0f),
      // cell (0,2) targets — the q-nearest cluster the cross misses
      5L -> pair(0, 2), 6L -> pair(0, 2), 7L -> pair(0, 2), 8L -> pair(0, 2),
      // cell (0,0) and (0,1) members (both probers see these)
      9L -> pair(0, 0), 10L -> pair(0, 0),
      11L -> pair(0, 1), 12L -> pair(0, 1))
    val e = rows.toDF("vec_id", "embedding")
    val exact = e.filter($"vec_id" =!= 4L)
      .crossJoin(broadcast(e.filter($"vec_id" === 4L)
        .select($"embedding".as("qemb"))))
      .withColumn("c", cos($"embedding", $"qemb"))
      .orderBy($"c".desc, $"vec_id".asc).limit(10)
      .select($"vec_id").collect().map(_.getLong(0)).toSet
    val crossTop = SimilarityQueries.imiIvfKnnFrames(e, queryId = 4L,
      k = 10, subdim = 4, c = 4, iters = 0, probesPerHalf = 2)
      .collect().map(_.getLong(0)).toSet
    val msTop = SimilarityQueries.imiIvfKnnMultiSeqFrames(e, queryId = 4L,
      k = 10, subdim = 4, c = 4, iters = 0, probes = 4)
      .collect().map(_.getLong(0)).toSet
    val targets = Set(5L, 6L, 7L, 8L)
    assert(targets.subsetOf(exact), "targets are true near neighbors")
    assert(crossTop.intersect(targets).isEmpty,
      s"cross p=2 cannot reach cell (0,2); got $crossTop")
    assert(targets.subsetOf(msTop),
      s"multi-seq probes=4 must cover the blended-rank-3 cell; got $msTop")
    assert(msTop.intersect(exact).size > crossTop.intersect(exact).size,
      "strict recall win at the SAME 4-cell probe budget")
  }

  /** Flat IVF with 256 static seed cells (q34's seeding convention
    * scaled to the IMI cell count), probing the 4 nearest cells. */
  private def flat256On(e: DataFrame): DataFrame = {
    val cells = e.orderBy($"vec_id").limit(256)
      .select($"vec_id".as("cent_id"), $"embedding".as("cemb"))
    val assigned = e.crossJoin(broadcast(cells))
      .withColumn("c", cos($"embedding", $"cemb"))
      .groupBy($"vec_id").agg(max_by($"cent_id", $"c").as("cent_id"))
    val qemb = e.filter($"vec_id" === 0L).select($"embedding".as("qemb"))
    val probe = cells.crossJoin(broadcast(qemb))
      .withColumn("qc", cos($"cemb", $"qemb"))
      .orderBy($"qc".desc, $"cent_id".asc).limit(4)
      .select($"cent_id")
    e.join(assigned.join(broadcast(probe), Seq("cent_id")), Seq("vec_id"))
      .filter($"vec_id" =!= 0L)
      .crossJoin(broadcast(qemb))
      .withColumn("c", cos($"embedding", $"qemb"))
      .orderBy($"c".desc, $"vec_id".asc).limit(10)
      .select($"vec_id")
  }
}
