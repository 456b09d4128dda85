package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.Dedup

/** q22 (exact PPJoin) stage profiler — the reproducible harness behind
  * SURVEY §8b's contention analysis. Not part of the product surface;
  * run with SPARK_GRAFT_SF_DIR / SPARK_GRAFT_CPUS / SPARK_GRAFT_PARTS
  * to re-measure per-stage cost under a chosen config. */
object ProbeQ22 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val parts = sys.env.getOrElse("SPARK_GRAFT_PARTS", cpus)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", parts)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()

    def time(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[probe] $name%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }

    val docs = graft.queries.DedupQueries.shingledForProbe(spark, sfDir)
    val threshold = 0.5

    // stage 0: shingle kernel alone
    time("shingle-pass (noop)") {
      docs.write.format("noop").mode("overwrite").save()
    }

    val base = docs.select(col("doc_id").as("id"), col("shingles").as("sh"))
    val ex = base.select(col("id"), size(col("sh")).as("n"),
      explode_outer(col("sh")).as("shingle"))
      .filter(col("shingle").isNotNull)
    time("explode (noop)") {
      ex.write.format("noop").mode("overwrite").save()
    }

    val wDf = org.apache.spark.sql.expressions.Window
      .partitionBy(col("shingle"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("id")).orderBy(col("_df").asc, col("shingle").asc)
    val prefix = ex.withColumn("_df", count(lit(1)).over(wDf))
      .withColumn("_rank", row_number().over(w))
      .filter(col("_rank") <=
        col("n") - ceil(lit(threshold) * col("n")) + 1)
      .select(col("shingle"), col("id"), col("n"))
    time("prefix windows (noop)") {
      prefix.write.format("noop").mode("overwrite").save()
    }

    val candidates = prefix.as("a")
      .join(prefix.as("b"), Seq("shingle"))
      .filter(col("a.id") < col("b.id") &&
        least(col("a.n"), col("b.n")).cast("double") >=
          lit(threshold) * greatest(col("a.n"), col("b.n")).cast("double"))
      .select(col("a.id").as("doc_a"), col("b.id").as("doc_b"))
      .distinct()
    time("candidates (noop)") {
      candidates.write.format("noop").mode("overwrite").save()
    }

    time("full query (noop)") {
      Dedup.prefixFilterJaccard(docs, "doc_id", "shingles")
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
