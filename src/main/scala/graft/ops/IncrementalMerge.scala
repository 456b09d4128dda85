package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Incremental refresh semantics (reference collectors.py:582-657,
  * SURVEY §2.10): watermark computation, delta re-fetch window, and
  * merge-with-cache where freshly fetched records win over cached ones
  * (J5/J6).
  *
  * At scale the merge is one shuffle on the merge key (row_number
  * window); with a sorted/bucketed cache layout this is the batch
  * MERGE INTO pattern.
  */
object IncrementalMerge {

  /** A5 — refresh watermark: max of the given timestamp columns across
    * the cached snapshot, minus a late-data lookback. */
  def watermark(cached: DataFrame, tsCols: Seq[String],
      lookbackSec: Long = 300): Option[java.sql.Timestamp] = {
    val casts = tsCols.map(c => col(c).cast("timestamp"))
    val newest = if (casts.length == 1) casts.head else greatest(casts: _*)
    val m = cached.agg(max(newest).as("wm")).head().getTimestamp(0)
    Option(m).map(ts => new java.sql.Timestamp(ts.getTime - lookbackSec * 1000))
  }

  /** J5/J6 — merge fetched over cached by key: the fetched version of
    * a key wins; cached records without a fetched update survive. */
  def mergeLatest(cached: DataFrame, fetched: DataFrame,
      keys: Seq[String]): DataFrame = {
    val unioned = fetched.withColumn("_src", lit(1))
      .unionByName(cached.withColumn("_src", lit(0)))
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("_src").desc)
    unioned
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .drop("_rn")
      .withColumnRenamed("_src", "from_fetched")
  }
}
