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
    * query binds it to the driver tables). */
  private def imiOn(e: DataFrame): DataFrame = {
    val subs = ProductQuant.subVectors(e, 2, 32)
    val cb = ProductQuant.trainCodebooks(subs, 16, 1)
    val codes = ProductQuant.encode(subs, cb)
    val cellOf = codes.groupBy($"vec_id")
      .agg((max(when($"sub_id" === 0, $"cent_id")) * 16 +
        max(when($"sub_id" === 1, $"cent_id"))).as("cell_id"))
    val q = e.filter($"vec_id" === 0L)
    val qemb = q.select($"embedding".as("qemb"))
    val qsubs = ProductQuant.subVectors(q, 2, 32)
      .select($"sub_id", $"subvec".as("qsub"))
    val ranked = cb.join(broadcast(qsubs), Seq("sub_id"))
      .withColumn("qcos", cos($"cvec", $"qsub"))
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy($"sub_id").orderBy($"qcos".desc, $"cent_id".asc)))
      .filter($"rn" <= 2).select($"sub_id", $"cent_id")
    val probeCells = ranked.filter($"sub_id" === 0)
      .select($"cent_id".as("c0"))
      .crossJoin(ranked.filter($"sub_id" === 1).select($"cent_id".as("c1")))
      .select(($"c0" * 16 + $"c1").as("cell_id"))
    e.join(cellOf.join(broadcast(probeCells), Seq("cell_id"))
        .select($"vec_id"), Seq("vec_id"))
      .filter($"vec_id" =!= 0L)
      .crossJoin(broadcast(qemb))
      .withColumn("c", cos($"embedding", $"qemb"))
      .orderBy($"c".desc, $"vec_id".asc).limit(10)
      .select($"vec_id")
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
