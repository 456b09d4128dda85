package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** Physical-layout helpers for the warehouse side of the engine: at
  * 100 TB the cheapest shuffle is the one the table layout already
  * paid for. Bucketed tables co-locate equal join keys, so repeated
  * joins/aggregations on the bucket key read pre-partitioned data and
  * plan no Exchange (LayoutSpec asserts this on the physical plan).
  *
  * Partition columns (coarse, low-cardinality — e.g. repo_name or an
  * ingest date) prune whole directories at scan time; bucket columns
  * (fine, high-cardinality join keys — custkey, doc_id) kill the
  * shuffle. The two compose.
  */
object Layout {

  /** Write df as a bucketed (and optionally sorted-in-bucket) managed
    * table. Joins/aggs on `bucketKeys` against tables bucketed the
    * same way are exchange-free. */
  def writeBucketed(df: DataFrame, table: String, bucketKeys: Seq[String],
      numBuckets: Int, partitionCols: Seq[String] = Nil): Unit = {
    var w = df.write.mode("overwrite").format("parquet")
      .bucketBy(numBuckets, bucketKeys.head, bucketKeys.tail: _*)
      .sortBy(bucketKeys.head, bucketKeys.tail: _*)
    if (partitionCols.nonEmpty)
      w = w.partitionBy(partitionCols: _*)
    w.saveAsTable(table)
  }

  /** In-place small-file compaction of a parquet directory — every
    * `append` (a stored-index delta, a streaming micro-batch) lands
    * new part-files, and a partitioned layout accumulates them PER
    * PARTITION VALUE, degrading exactly the file-pruned scans the
    * layout exists for. Rewrites the directory with rows clustered by
    * `partitionCols` (one task per hash bucket → one file per
    * partition value) and swaps directories keep-the-old-until-live
    * (the compactBandIndex rotation: crash before the swap leaves the
    * live dir untouched; crash between renames leaves a `.old` to
    * restore). Content is untouched — appends are NEW rows here, not
    * replays, so there is nothing to dedup, and callers' spec gates
    * pin frame equality across the rewrite. Run in a maintenance
    * window; online compaction wants a transactional table format.
    *
    * Returns (dataFilesBefore, dataFilesAfter, rows) — the
    * reclaimed-file observable the layout specs pin. */
  def compactParquetDir(spark: SparkSession, path: String,
      partitionCols: Seq[String] = Nil): (Long, Long, Long) = {
    def dataFiles(p: java.io.File): Long =
      if (!p.exists()) 0L
      else if (p.isDirectory) p.listFiles().map(dataFiles).sum
      else if (p.getName.endsWith(".parquet")) 1L else 0L
    val dir = new java.io.File(path)
    if (!dir.exists()) return (0L, 0L, 0L)
    val before = dataFiles(dir)
    val df0 = spark.read.parquet(path)
    // partitioned: cluster rows so each partition value writes one
    // file. Unpartitioned: the SCAN already packs small files into
    // few splits (openCostInBytes file packing), so the plain rewrite
    // shrinks the file count without a coalesce(1) single-thread trap.
    val df = if (partitionCols.nonEmpty)
      df0.repartition(partitionCols.map(col): _*) else df0
    val tmp = new java.io.File(path + ".compact")
    val old = new java.io.File(path + ".old")
    var w = df.write.mode("overwrite")
    if (partitionCols.nonEmpty) w = w.partitionBy(partitionCols: _*)
    w.parquet(tmp.getPath)
    val rows = spark.read.parquet(tmp.getPath).count()
    require(dir.renameTo(old), s"swap: $path -> .old failed")
    require(tmp.renameTo(dir), s"swap: .compact -> $path failed")
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm)
      f.delete()
    }
    rm(old)
    (before, dataFiles(dir), rows)
  }
}
