package graft.tools

import org.apache.spark.sql.SparkSession

/** Plan-audit helper: print the formatted physical plan of named
  * driver queries (all of them with no args) against a testdata dir —
  * the raw material for PLANS.md. Usage:
  * `runMain graft.tools.PlanDump [sfDir] [queryName...]`. */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names = if (args.length > 1) args.drop(1).toSeq
      else graft.SparkEntry.queries.keys.toSeq.sorted
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    try names.foreach { n =>
      println(s"==== $n ====")
      graft.SparkEntry.queries(n)(spark, sfDir).explain("formatted")
    } finally spark.stop()
  }
}
