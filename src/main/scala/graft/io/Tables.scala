package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Readers for the driver-generated parquet test tables (TESTDATA.md).
  *
  * All readers are plain parquet scans so Catalyst can push filters and
  * prune columns down to the file source. At cluster scale these tables
  * would be directories of many files; `spark.read.parquet` handles both
  * the single-file layout used here and partitioned directories.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def read(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame = read(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = read(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = read(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = read(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = read(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = read(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = read(s, d, "lineitem")
  /** events.parquet has shipped `ts` in two physical layouts across
    * driver generations: parquet TIMESTAMP(NANOS) (no native Spark
    * type — read as epoch-nanos LongType via the legacy conf and
    * converted with exact integer arithmetic; a double division would
    * lose precision above 2^53 ns) and plain TIMESTAMP(MICROS)
    * isAdjustedToUTC=false (reads as TIMESTAMP_NTZ). Both normalize
    * to a session-zone TimestampType column; the session zone is
    * pinned UTC everywhere (Verify/Bench/specs), so the NTZ cast is
    * wall-clock exact and downstream queries/oracles see identical
    * instants regardless of which layout the data arrived in. */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = read(s, d, "events")
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types._
    df.schema("ts").dataType match {
      case LongType =>
        df.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
      case TimestampNTZType =>
        df.withColumn("ts", col("ts").cast(TimestampType))
      case _ => df
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = read(s, d, "documents")

  /** documents spread across all cores for CPU-heavy per-row work:
    * the test tables are single parquet files (one input split), so
    * without an explicit repartition a hashing-heavy scan runs on one
    * core; explicit N keeps AQE from coalescing the few-MB shuffle
    * back to one partition. The repartition is CONDITIONAL on the scan
    * actually being narrower than the cluster — `repartition` always
    * shuffles, and at warehouse scale the scan already has more splits
    * than cores, so the narrow-input fix must not become a full-corpus
    * shuffle there. */
  def documentsDistributed(s: SparkSession, d: String): DataFrame = {
    val df = documents(s, d)
    val scanParts = df.rdd.getNumPartitions // plan-time, runs no job
    if (scanParts >= s.sparkContext.defaultParallelism) df
    else df.repartition(
      s.sparkContext.defaultParallelism,
      org.apache.spark.sql.functions.col("doc_id"))
  }
  def embeddings(s: SparkSession, d: String): DataFrame = read(s, d, "embeddings")

  /** embeddings spread across cores for CPU-heavy pair work — same
    * conditional-repartition contract as `documentsDistributed`. */
  def embeddingsDistributed(s: SparkSession, d: String): DataFrame = {
    val df = embeddings(s, d)
    val scanParts = df.rdd.getNumPartitions
    if (scanParts >= s.sparkContext.defaultParallelism) df
    else df.repartition(
      s.sparkContext.defaultParallelism,
      org.apache.spark.sql.functions.col("vec_id"))
  }

  /** Register every table as a temp view for `spark.sql` use. */
  def registerAll(s: SparkSession, d: String): Unit =
    all.foreach(n => read(s, d, n).createOrReplaceTempView(n))
}
