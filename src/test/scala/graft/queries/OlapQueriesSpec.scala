package graft.queries

import org.apache.spark.sql.functions._
import graft.SparkSpecBase

/** Structural invariants of the OLAP surface (q47 rollup, q48 pivot,
  * q49 exact quantiles) that the DuckDB hash-compare alone wouldn't
  * localize on failure: subtotal arithmetic, zero-fill, and quantile
  * ordering.
  */
class OlapQueriesSpec extends SparkSpecBase {
  private val dir = "/root/testdata/sf0.001"

  test("rollup levels are internally consistent") {
    val rows = Relational.revenueRollup(spark, dir).collect()
    val leaves = rows.filter(r => r.getLong(2) == 0 && r.getLong(3) == 0)
    val regionSub = rows.filter(r => r.getLong(2) == 0 && r.getLong(3) == 1)
    val grand = rows.filter(r => r.getLong(2) == 1 && r.getLong(3) == 1)
    assert(grand.length == 1)
    assert(grand.head.getString(0) == "ALL" && grand.head.getString(1) == "ALL")
    assert(grand.head.getLong(5) == leaves.map(_.getLong(5)).sum)
    // each region subtotal == sum of its nation leaves
    for (sub <- regionSub) {
      val mine = leaves.filter(_.getString(0) == sub.getString(0))
      assert(sub.getLong(5) == mine.map(_.getLong(5)).sum, sub.getString(0))
      assert(math.abs(sub.getDouble(4) - mine.map(_.getDouble(4)).sum) < 1e-6)
    }
    // 5 regions × leaves + 5 subtotals + 1 grand total, no duplicates
    assert(regionSub.length == 5)
    assert(rows.length == leaves.length + 6)
  }

  test("pivot covers every user once and zero-fills absent types") {
    val out = Relational.eventPivot(spark, dir)
    val ev = graft.io.Tables.events(spark, dir)
    val users = ev.select("user_id").distinct().count()
    assert(out.count() == users)
    // row sums reconstruct the per-user event count → nothing dropped
    val colSum = out.select(
      sum(col("n_click") + col("n_error") + col("n_purchase") +
        col("n_signup") + col("n_view"))).collect().head.getLong(0)
    assert(colSum == ev.count())
    // zero-fill: no nulls anywhere
    val nulls = out.columns.map(c =>
      out.filter(col(c).isNull).count()).sum
    assert(nulls == 0)
  }

  test("quantiles are ordered and bounded per group") {
    for (r <- TextQueries.lengthQuantiles(spark, dir).collect()) {
      val (p25, p50, p75) = (r.getDouble(2), r.getDouble(3), r.getDouble(4))
      val (lo, hi) = (r.getLong(5), r.getLong(6))
      assert(lo <= p25 && p25 <= p50 && p50 <= p75 && p75 <= hi,
        s"${r.getString(0)}: $lo $p25 $p50 $p75 $hi")
    }
  }

  test("q96 anomalies: spike flags, normal hour doesn't, zero variance scores 0") {
    import spark.implicits._
    import java.sql.Timestamp
    def hourEvents(day: Int, hour: Int, n: Int): Seq[(String, Timestamp)] =
      (0 until n).map(i => ("t",
        Timestamp.valueOf(f"2020-01-0$day $hour%02d:${i / 60}%02d:${i % 60}%02d")))
    // 24 baseline hours alternating 9/11 events (mean 10, sample var
    // 24/23), then one normal hour (10) and one spike hour (99)
    val baseline = (0 until 24).flatMap(h =>
      hourEvents(1, h, if (h % 2 == 0) 9 else 11))
    val normal = hourEvents(2, 0, 10)
    val spike = hourEvents(2, 1, 99)
    val out = Relational.eventAnomaliesFrame(
      (baseline ++ normal ++ spike).toDF("event_type", "ts"),
      lookback = 24, zThreshold = 3.0)
      .orderBy($"hour").collect()
    assert(out.length == 2, "only fully-windowed hours are scored")
    val n0 = out(0) // the normal hour
    assert(n0.getLong(2) == 10L && n0.getDouble(3) == 10.0)
    assert(math.abs(n0.getDouble(4)) < 0.01 && n0.getLong(5) == 0L)
    val sp = out(1) // the spike
    assert(sp.getLong(2) == 99L)
    // spike window = day1 hours 1..23 (12×11 + 11×9) + the normal 10:
    // s1 = 241, s2 = 2443 — recompute z from first principles
    val s1 = 241.0; val s2 = 2443.0
    val expVar = (s2 - s1 * s1 / 24) / 23
    val expZ = (99.0 - s1 / 24) / math.sqrt(expVar)
    assert(math.abs(sp.getDouble(4) - expZ) < 0.01,
      s"z ${sp.getDouble(4)} vs expected $expZ")
    assert(sp.getLong(5) == 1L, "the spike must flag")
  }

  test("q96 zero-variance baseline scores z = 0, never NaN/inf") {
    import spark.implicits._
    import java.sql.Timestamp
    // 24 identical day-1 hours + one day-2 hour: the day-2 hour scores
    // over a zero-variance window
    val flat = ((0 until 24).flatMap(h => (0 until 5).map(i =>
      ("t", Timestamp.valueOf(f"2020-01-01 $h%02d:00:$i%02d")))) ++
      (0 until 7).map(i =>
        ("t", Timestamp.valueOf(f"2020-01-02 00:00:$i%02d"))))
    val out = Relational.eventAnomaliesFrame(
      flat.toDF("event_type", "ts"), lookback = 24).collect()
    assert(out.length == 1)
    assert(out.head.getLong(2) == 7L)
    assert(out.head.getDouble(4) == 0.0 && out.head.getLong(5) == 0L)
  }

  test("q109 dense histogram: complete hour×type grid, zeros explicit, counts match q14") {
    import spark.implicits._
    val dir = "/root/testdata/sf0.001"
    val dense = Relational.hourlyRollupDense(spark, dir).collect()
    val hours = dense.map(_.getString(0)).distinct.sorted
    val types = dense.map(_.getString(1)).distinct.sorted
    // the grid is COMPLETE: every hour of the span × every type
    assert(dense.length == hours.length * types.length)
    assert(hours.zip(hours.tail).forall { case (a, b) =>
      java.sql.Timestamp.valueOf(b).getTime -
        java.sql.Timestamp.valueOf(a).getTime == 3600000L
    }, "no hour gaps in the dense axis")
    // the nonzero buckets ARE q14's sparse rollup
    val sparse = Relational.hourlyEventRollup(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val nonzero = dense.filter(_.getLong(2) > 0L)
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(nonzero == sparse)
    dense.filter(_.getLong(2) == 0L)
      .foreach(r => assert(r.getDouble(3) == 0.0, "empty bucket sums 0"))
  }

  test("q110 percentile ranks: bounded, monotone, hand-recomputed for one language") {
    import spark.implicits._
    val dir = "/root/testdata/sf0.001"
    val out = Relational.percentileRanks(spark, dir).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val prs = Seq(r.getDouble(2), r.getDouble(3), r.getDouble(4))
      prs.foreach(p => assert(p >= 0.0 && p <= 100.0))
      assert(prs == prs.sorted, "ranks are monotone in the threshold")
    }
    val lang = out.head.getString(0)
    val chars = graft.io.Tables.documents(spark, dir)
      .filter($"lang" === lang).select($"n_chars")
      .collect().map(_.getLong(0))
    val expect = BigDecimal(
      chars.count(_ <= 500) * 100.0 / chars.length)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(math.abs(out.head.getDouble(3) - expect) < 1e-9)
  }
}
