package graft.tools

import org.apache.spark.sql.SparkSession

import graft.queries.SimilarityQueries

/** A/B probe: stored card with vs without the persisted exact-recall
  * artifact — the measurement harness behind PLANS.md's stored-card
  * numbers (min-of-3 each side, artifact removed between runs). */
object ProbeCardSplit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()
    val artDir = java.nio.file.Files
      .createTempDirectory("annart").toString
    SimilarityQueries.writeCalibrationArtifacts(spark, sfDir, artDir)
    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def run(card: => org.apache.spark.sql.DataFrame): Double =
      (1 to 3).map(_ => time(
        graft.ops.Checkpoints.consume(card)(
          _.write.format("noop").mode("overwrite").save()))).min
    val withArt = run(
      SimilarityQueries.annCalibrationCardStored(spark, sfDir, artDir))
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm); f.delete()
    }
    rm(new java.io.File(artDir + "/exact_topk"))
    val noArt = run(
      SimilarityQueries.annCalibrationCardStored(spark, sfDir, artDir))
    println(f"""{"metric":"card_split","with_exact_artifact_s":$withArt%.2f,"without_s":$noArt%.2f}""")
    spark.stop()
  }
}
