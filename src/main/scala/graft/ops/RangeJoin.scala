package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Point-in-interval range join with NO equality key — the join shape
  * Spark turns into a broadcast-nested-loop (every point × every
  * interval) if written directly, and the one every windowed-attribution
  * / maintenance-overlap / time-bucketed-enrichment query needs.
  *
  * Binned implementation: pick a bin duration; each interval explodes
  * into the bins it covers, each point maps to its single bin, the two
  * sides equi-join on the bin id, and the exact predicate
  * `lo <= point < hi` filters residual false candidates. Because a
  * point lives in exactly one bin and an interval covers that bin at
  * most once, each true (point, interval) pair surfaces exactly once —
  * no dedup pass.
  *
  * Scale: the bin id is a real shuffle key, so the join is a plain
  * shuffled hash join at any data size. Cost is governed by the bin
  * choice — set `binMicros` near the TYPICAL interval length: an
  * interval then explodes into ≤ 2 bins, and a bin pairs points with
  * only the intervals overlapping its time slice. Too-small bins
  * multiply the interval side (hi−lo)/bin ×; too-large bins pair each
  * point with intervals from a whole epoch only to filter them out.
  * Degenerate intervals (hi <= lo) match nothing and are dropped before
  * the explode.
  *
  * Column contract: output = every point column plus every interval
  * column; the two sets must be disjoint (rename first). Null
  * timestamps/bounds match nothing, as in a SQL inequality join.
  */
object RangeJoin {

  def pointInInterval(
      points: DataFrame, intervals: DataFrame,
      pointCol: String, loCol: String, hiCol: String,
      binMicros: Long): DataFrame = {
    require(binMicros > 0, s"binMicros must be positive: $binMicros")
    val overlap = points.columns.toSet.intersect(intervals.columns.toSet)
    require(overlap.isEmpty,
      s"point and interval column names collide: $overlap")
    val internal = Seq("__bin", "__p_us", "__lo_us", "__hi_us")
    require(!internal.exists(c =>
      points.columns.contains(c) || intervals.columns.contains(c)),
      s"inputs must not contain reserved columns $internal")

    val p = points
      .withColumn("__p_us", unix_micros(col(pointCol)))
      .filter(col("__p_us").isNotNull)
      .withColumn("__bin", floorDiv(col("__p_us"), binMicros))
    // hi is exclusive: the last covered bin holds instant hi−1µs.
    val iv = intervals
      .withColumn("__lo_us", unix_micros(col(loCol)))
      .withColumn("__hi_us", unix_micros(col(hiCol)))
      .filter(col("__lo_us").isNotNull && col("__hi_us") > col("__lo_us"))
      .withColumn("__bin", explode(sequence(
        floorDiv(col("__lo_us"), binMicros),
        floorDiv(col("__hi_us") - 1, binMicros))))

    p.join(iv, Seq("__bin"))
      .filter(col("__p_us") >= col("__lo_us") &&
        col("__p_us") < col("__hi_us"))
      .select((points.columns ++ intervals.columns).map(col): _*)
  }

  /** Floor division, correct for negative epochs too (truncating
    * division would round pre-1970 micros toward zero, off by one
    * bin). pmod makes the dividend exactly divisible, so the double
    * quotient is exact for |µs| < 2^53 (± ~285k years). */
  private def floorDiv(c: org.apache.spark.sql.Column, d: Long) =
    ((c - pmod(c, lit(d))) / d).cast("long")
}
