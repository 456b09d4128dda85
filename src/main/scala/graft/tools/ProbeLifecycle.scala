package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ops.FullText

/** Phase breakdown of q145's stored-text lifecycle (write / append /
  * delete / search) — the measurement harness behind PLANS.md's
  * lifecycle numbers. */
object ProbeLifecycle {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.files.openCostInBytes", 524288L)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    spark.range(1000000).selectExpr("sum(id)").collect()
    val docs = graft.io.Tables.documents(spark, sfDir)
    val wm = docs.agg(max($"doc_id")).head().getLong(0) * 4 / 5
    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    for (pass <- 1 to 2) {
      val idx = java.nio.file.Files
        .createTempDirectory("lcprobe").toFile.getAbsolutePath
      val tW = time(FullText.writeTextIndex(docs.filter($"doc_id" <= wm),
        "doc_id", "text", idx, storePositions = false,
        storeTermVectors = true))
      val tA = time(FullText.appendToTextIndex(spark,
        docs.filter($"doc_id" > wm), "doc_id", "text", idx))
      val dead = docs.filter($"doc_id" % 97 === 5)
        .select($"doc_id").collect().map(_.getLong(0)).toSeq
      val tD = time(FullText.deleteFromTextIndex(spark, idx, dead))
      val tS = time(FullText.bm25SearchStored(spark, idx,
        Seq("fast", "vector", "query"), k = 20)
        .write.format("noop").mode("overwrite").save())
      println(f"LIFECYCLE pass=$pass write=$tW%.2f append=$tA%.2f " +
        f"delete=$tD%.2f search=$tS%.2f ndead=${dead.size}")
    }
    spark.stop()
  }
}
