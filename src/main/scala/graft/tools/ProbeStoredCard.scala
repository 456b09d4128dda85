package graft.tools

import org.apache.spark.sql.SparkSession

import graft.queries.SimilarityQueries

/** Measures the q103 cached-artifact claim: wall-clock of the
  * self-contained calibration card (trains every tier per run) vs
  * [[SimilarityQueries.annCalibrationCardStored]] reading the bundle
  * [[SimilarityQueries.writeCalibrationArtifacts]] persisted — the
  * near-free per-query cost a deployment pays once its indexes exist.
  * Usage: `runMain graft.tools.ProbeStoredCard <sfDir> [passes]`.
  * Prints one JSON line. */
object ProbeStoredCard {

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val passes = args.lift(1).map(_.toInt).getOrElse(2)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()
    val artDir = java.nio.file.Files
      .createTempDirectory("graft-annart").toString
    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def run(card: => org.apache.spark.sql.DataFrame): Double =
      (1 to passes).map(_ => time(
        graft.ops.Checkpoints.consume(card)(
          _.write.format("noop").mode("overwrite").save()))).min
    val tSelf = run(SimilarityQueries.annCalibrationCard(spark, sfDir))
    val tWrite = time(
      SimilarityQueries.writeCalibrationArtifacts(spark, sfDir, artDir))
    val tStored = run(
      SimilarityQueries.annCalibrationCardStored(spark, sfDir, artDir))
    println(f"""{"metric":"stored_card","self_contained_s":$tSelf%.2f,""" +
      f""""write_artifacts_s":$tWrite%.2f,"stored_s":$tStored%.2f,""" +
      f""""speedup":${tSelf / tStored}%.1f}""")
    spark.stop()
  }
}
