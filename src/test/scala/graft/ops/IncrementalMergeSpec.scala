package graft.ops

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import graft.SparkSpecBase

/** Mirrors reference J5 merge semantics (collectors.py:596-609): the
  * fetched version of a key wins; cached-only records survive; the
  * watermark is max(ts) - lookback. */
class IncrementalMergeSpec extends SparkSpecBase {

  private val t = StructType(Seq(
    StructField("number", IntegerType),
    StructField("state", StringType),
    StructField("updated_at", StringType)))

  private def df(rows: Row*) =
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 2), t)

  test("fetched wins per key, cached residue survives") {
    val cached = df(
      Row(1, "open", "2020-01-01T00:00:00Z"),
      Row(2, "open", "2020-01-02T00:00:00Z"))
    val fetched = df(
      Row(2, "closed", "2020-02-01T00:00:00Z"),
      Row(3, "open", "2020-02-02T00:00:00Z"))
    val out = IncrementalMerge.mergeLatest(cached, fetched, Seq("number"))
      .collect().map(r => r.getInt(0) ->
        (r.getAs[String]("state"), r.getAs[Int]("from_fetched"))).toMap
    assert(out == Map(
      1 -> ("open", 0), 2 -> ("closed", 1), 3 -> ("open", 1)))
  }

  test("watermark = max ts minus lookback; None on empty cache") {
    val cached = df(
      Row(1, "open", "2020-01-01T00:00:00Z"),
      Row(2, "open", "2020-01-02T00:00:10Z"))
    val wm = IncrementalMerge.watermark(cached, Seq("updated_at"), 300)
    assert(wm.get.toInstant.toString == "2020-01-01T23:55:10Z")
    assert(IncrementalMerge.watermark(df(), Seq("updated_at")).isEmpty)
  }
}
