package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.queries.SimilarityQueries

/** Measures the EXECUTOR-SIDE IMI probe selection
  * ([[graft.queries.SimilarityQueries.imiProbeCellsBatch]]) at the
  * grid sizes that motivate IMI — cGrid = 2¹² gives 2²⁴ logical
  * cells from 2·4096 persisted half-centroids — across batch sizes
  * |Q| ∈ {10, 100, 1000}. The round-11 gap: the walk ran on the
  * driver over a collected |Q|·2·cGrid half-affinity frame, so a
  * 1000-query msearch at 2¹² collected ~8M rows before selecting a
  * single cell. Now the half-codebooks broadcast once (2·cGrid rows,
  * an index artifact) and each query walks in mapPartitions; the
  * driver's cost is flat in |Q| and the selection parallelizes with
  * the batch.
  *
  * No index build: the walk consumes only the half-codebook frame,
  * so the probe synthesizes deterministic codebooks and queries
  * directly (the ProbeScaleCurve convention). Prints one JSON line
  * per |Q|; PLANS.md records the curve. Usage:
  * `runMain graft.tools.ProbeImiWalk [cGrid] [halfDim] [probes]`
  * (defaults 4096, 32, 32). */
object ProbeImiWalk {

  private def timeMin3(body: => Unit): Double = {
    body // warm-up
    (1 to 3).map { _ =>
      val t0 = System.nanoTime()
      body
      (System.nanoTime() - t0) / 1e9
    }.min
  }

  def main(args: Array[String]): Unit = {
    val cGrid = args.headOption.map(_.toInt).getOrElse(4096)
    val halfDim = args.lift(1).map(_.toInt).getOrElse(32)
    val probes = args.lift(2).map(_.toInt).getOrElse(32)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    // deterministic half-codebooks: 2·cGrid rows of halfDim floats —
    // exactly the shape writeIvfPqIndexFrames persists for coarse=imi
    val imiCb = spark.range(2L * cGrid).select(
      ($"id" / cGrid).cast("int").as("sub_id"),
      pmod($"id", lit(cGrid.toLong)).cast("int").as("cent_id"),
      transform(sequence(lit(0), lit(halfDim - 1)), d =>
        (pmod(xxhash64($"id" * 131 + d), lit(1000)).cast("double")
          / 1000d - lit(0.5d)).cast("float")).as("cvec"))
      .localCheckpoint()

    Seq(10, 100, 1000).foreach { nq =>
      val queries = spark.range(nq).select($"id".as("q_id"),
        transform(sequence(lit(0), lit(2 * halfDim - 1)), d =>
          (pmod(xxhash64($"id" * 67 + d), lit(1000)).cast("double")
            / 1000d - lit(0.5d)).cast("float")).as("qemb"))
        .localCheckpoint()
      var emitted = 0L
      val t = timeMin3 {
        emitted = SimilarityQueries
          .imiProbeCellsBatch(queries, imiCb, cGrid, halfDim, probes)
          .count()
      }
      println(s"""{"face":"imiProbeWalk","c_grid":$cGrid,""" +
        s""""logical_cells":${cGrid.toLong * cGrid},""" +
        s""""n_queries":$nq,"probes":$probes,""" +
        s""""select_s":${f"$t%.3f"},"cells_emitted":$emitted}""")
      graft.ops.Checkpoints.unpersist(queries)
    }
    graft.ops.Checkpoints.unpersist(imiCb)
    spark.stop()
  }
}
