package graft.tools

import org.apache.spark.sql.SparkSession

/** Solo per-query timing harness (PLANS.md measurement backing):
  * `runMain graft.tools.TimeQuery <sfDir> <name>[,<name>…] [passes]`
  * runs each named SparkEntry query `passes` times (default 3)
  * through the noop sink after Bench's standard warmup, printing
  * every pass and the min — the same evaluation discipline as
  * graft.Bench, without the other 100 queries around it. */
object TimeQuery {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args(1).split(",").toSeq
    val passes = if (args.length > 2) args(2).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.files.openCostInBytes", 524288L)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()
    names.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      val times = (1 to passes).map { _ =>
        val t0 = System.nanoTime()
        graft.ops.Checkpoints.consume(fn(spark, sfDir))(
          _.write.format("noop").mode("overwrite").save())
        (System.nanoTime() - t0) / 1e9
      }
      println(f"TIMEQ $name passes=${times.map(t => f"$t%.2f").mkString(",")} min=${times.min}%.3f s")
    }
    spark.stop()
  }
}
