package graft.io

import org.apache.spark.sql.DataFrame

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
}
