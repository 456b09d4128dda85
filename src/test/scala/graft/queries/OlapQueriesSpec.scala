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
}
