package graft.tools

import org.apache.spark.sql.SparkSession

/** Solo per-query timing harness (PLANS.md measurement backing):
  * `runMain graft.tools.TimeQuery <sfDir> <name>[,<name>…] [passes]
  * [--pin <indexDir>:<gen>]` runs each named SparkEntry query
  * `passes` times (default 3) through the noop sink after Bench's
  * standard warmup, printing every pass and the min — the same
  * evaluation discipline as graft.Bench, without the other 100
  * queries around it. `--pin` holds every pass on ONE committed
  * snapshot of a stored index ([[graft.io.Layout
  * .withPinnedGeneration]]) so a timing series can't be perturbed by
  * a concurrent commit mid-run (pick the generation from RunStatus's
  * `committed_generations`). */
object TimeQuery {
  def main(args0: Array[String]): Unit = {
    val pinIdx = args0.indexOf("--pin")
    require(pinIdx < 0 || pinIdx + 1 < args0.length,
      "--pin requires <indexDir>:<generation>")
    val pin: Option[(String, Long)] =
      if (pinIdx < 0) None
      else {
        val v = args0(pinIdx + 1)
        val cut = v.lastIndexOf(':')
        require(cut > 0, s"--pin wants <indexDir>:<generation>, got $v")
        Some((v.take(cut), v.drop(cut + 1).toLong))
      }
    val args =
      if (pinIdx >= 0) args0.take(pinIdx) ++ args0.drop(pinIdx + 2)
      else args0
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
    def timed(): Unit = names.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      val times = (1 to passes).map { _ =>
        val t0 = System.nanoTime()
        graft.ops.Checkpoints.consume(fn(spark, sfDir))(
          _.write.format("noop").mode("overwrite").save())
        (System.nanoTime() - t0) / 1e9
      }
      println(f"TIMEQ $name passes=${times.map(t => f"$t%.2f").mkString(",")} min=${times.min}%.3f s")
    }
    pin match {
      case Some((idx, gen)) =>
        graft.io.Layout.withPinnedGeneration(spark, idx, gen)(timed())
      case None => timed()
    }
    spark.stop()
  }
}
