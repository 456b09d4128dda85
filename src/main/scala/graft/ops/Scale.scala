package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scale-out machinery for the 100 TB deployment profile: skew-salted
  * joins and sketch-based aggregation switches. These are the knobs a
  * job flips when a key distribution or cardinality makes the exact
  * plan pathological; semantics of each switch are documented at the
  * call site that adopts it.
  */
object Scale {

  /** Skew-salted equi-join (inner/left): the big side gets a
    * deterministic row-local salt in [0, saltFactor); the small side is
    * replicated saltFactor times, so one hot key spreads over
    * saltFactor reducers instead of pinning one. Use when AQE's
    * skew-join split is not enough (e.g. one key ≫ everything).
    *
    * Row-position salting (not key hashing — a hot key would hash to
    * ONE salt and stay hot). Join output equals the unsalted join
    * row-for-row.
    */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
      saltFactor: Int, joinType: String = "inner"): DataFrame = {
    val bigS = big.withColumn("_salt",
      pmod(monotonically_increasing_id(), lit(saltFactor.toLong)))
    val smallS = small.withColumn("_salt",
      explode(sequence(lit(0L), lit(saltFactor.toLong - 1))))
    bigS.join(smallS, Seq(key, "_salt"), joinType).drop("_salt")
  }

  /** A11 at scale: exact COUNT(DISTINCT x) needs a global shuffle of
    * every distinct value; the HLL++ sketch is one pass, mergeable,
    * and bounded-memory. rsd = relative standard deviation (0.05 ≈
    * ±5%). */
  def approxCountDistinct(c: Column, rsd: Double = 0.05): Column =
    approx_count_distinct(c, rsd)

  /** Top-k/percentile at scale: approx_percentile is a fixed-size
    * sketch vs a full sort. */
  def approxMedian(c: Column): Column =
    percentile_approx(c, lit(0.5), lit(10000))

  /** q49's multi-quantile shape at scale: the exact `percentile(c,
    * array(...))` keeps every group's values for a per-group sort —
    * fine at fixture cardinality, pathological at billions of rows per
    * group. This twin is the mergeable KLL-style sketch with bounded
    * memory: rank error ≤ n/accuracy, so accuracy=10000 pins every
    * returned quantile within ±0.01% of the true rank (ScaleSpec
    * asserts the bound). Returns an array aligned with `percentages`,
    * same as the exact form; values are actual data points rather than
    * interpolations, which is why the oracle-gated q49 keeps the exact
    * aggregate and this switch stays caller-opt-in. */
  def approxQuantiles(c: Column, percentages: Seq[Double],
      accuracy: Int = 10000): Column =
    percentile_approx(c, array(percentages.map(lit): _*), lit(accuracy))
}
