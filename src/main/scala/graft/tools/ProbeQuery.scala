package graft.tools

import org.apache.spark.sql.SparkSession

/** Ad-hoc single-query timing probe: run a named driver query N times
  * against a testdata dir and print per-run wall seconds.
  * Usage: `runMain graft.tools.ProbeQuery <sfDir> <queryName> [runs]`. */
object ProbeQuery {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val name = args(1)
    val runs = if (args.length > 2) args(2).toInt else 2
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try (1 to runs).foreach { i =>
      val t0 = System.nanoTime()
      val n = graft.ops.Checkpoints.consume(
        graft.SparkEntry.queries(name)(spark, sfDir))(_.count())
      println(f"[probe] $name run $i: ${(System.nanoTime() - t0) / 1e9}%.2f s, $n rows")
    } finally spark.stop()
  }
}
