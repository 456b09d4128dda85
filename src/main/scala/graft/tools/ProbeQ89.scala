package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-by-stage timing of q89's containment chain at a given SF. */
object ProbeQ89 {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.ops.Dedup
    val threshold = 0.5
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[p89] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    try {
      val docs = graft.io.Tables.documentsDistributed(spark, sfDir)
        .select(col("doc_id"),
          Dedup.shingles(Dedup.tokens(col("text"))).as("shingles"))
      val base = docs.select(col("doc_id").as("id"), col("shingles").as("sh"))
      time("base count")(println(base.count()))
      val ex = base.select(col("id"), size(col("sh")).as("n"),
        explode_outer(col("sh")).as("shingle"))
        .filter(col("shingle").isNotNull)
      val wDf = org.apache.spark.sql.expressions.Window
        .partitionBy(col("shingle"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("id")).orderBy(col("_df").asc, col("shingle").asc)
      val ranked = ex.withColumn("_df", count(lit(1)).over(wDf))
        .withColumn("_rank", row_number().over(w))
      time("ranked count")(println(ranked.count()))
      val prefix = ranked
        .filter(col("_rank") <= col("n") - ceil(lit(threshold) * col("n")) + 1)
        .select(col("shingle"), col("id").as("small_id"),
          col("n").as("small_n"))
      val full = ranked.select(col("shingle"), col("id").as("big_id"),
        col("n").as("big_n"))
      val candidates = prefix.join(full, Seq("shingle"))
        .filter(col("small_n") < col("big_n") ||
          (col("small_n") === col("big_n") &&
            col("small_id") < col("big_id")))
        .select(least(col("small_id"), col("big_id")).as("doc_a"),
          greatest(col("small_id"), col("big_id")).as("doc_b"))
        .distinct()
      time("candidates count")(println(candidates.count()))
      val out = candidates
        .join(base.select(col("id").as("doc_a"), col("sh").as("sh_a")),
          Seq("doc_a"))
        .join(base.select(col("id").as("doc_b"), col("sh").as("sh_b")),
          Seq("doc_b"))
        .withColumn("inter", size(array_intersect(col("sh_a"), col("sh_b")))
          .cast("double"))
        .withColumn("ca", col("inter") / size(col("sh_a")))
        .withColumn("cb", col("inter") / size(col("sh_b")))
        .filter(greatest(col("ca"), col("cb")) >= threshold)
      time("verify count")(println(out.count()))
      time("full rerun")(println(
        Dedup.containmentPairs(docs, "doc_id", "shingles").count()))
    } finally spark.stop()
  }
}
