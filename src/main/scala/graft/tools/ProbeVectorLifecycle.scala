package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.queries.SimilarityQueries

/** Per-codec phase breakdown of the stored VECTOR lifecycle (write /
  * append / delete / search, q146/q150/q151/q152's chain) — the
  * measurement harness behind PLANS.md's codec-layout numbers. Two
  * passes per codec; read the second (warm) one. */
object ProbeVectorLifecycle {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    spark.range(1000000).selectExpr("sum(id)").collect()
    val e = graft.io.Tables.embeddings(spark, sfDir)
      .select($"vec_id", $"embedding")
    val wm = e.agg(max($"vec_id")).head().getLong(0) * 4 / 5
    val train = e.filter($"vec_id" <= wm)
    val dead = e.filter($"vec_id" % 3 === 1)
      .select($"vec_id").collect().map(_.getLong(0)).toSeq
    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    for (codec <- Seq("pq", "residual", "opq", "sq8"); pass <- 1 to 2) {
      val idx = java.nio.file.Files
        .createTempDirectory(s"vlc-$codec").toFile.getAbsolutePath
      val tW = time(SimilarityQueries.writeIvfPqIndexFrames(
        train, train, idx,
        codec = codec))
      val tA = time(SimilarityQueries.appendToIvfPqIndex(spark, idx,
        e.filter($"vec_id" > wm)))
      val tD = time(SimilarityQueries.deleteFromIvfPqIndex(spark, idx,
        dead))
      // DEPLOYMENT settings (2 probes, shortlist 50), not gate-exact
      val tS = time(SimilarityQueries
        .ivfPqSearchStored(spark, idx, sfDir).collect())
      println(f"codec=$codec%-8s pass=$pass  write=$tW%6.2f  " +
        f"append=$tA%6.2f  delete=$tD%6.2f  search=$tS%6.2f")
    }
    spark.stop()
  }
}
