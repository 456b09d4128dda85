package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Point-in-time ("as-of") join: for each left row, attach the single
  * most recent right row at-or-before (or strictly before) the left
  * row's time, within the same key group — the lookup every
  * event-to-dimension-snapshot and feature-backfill pipeline needs and
  * plain SQL can only express as an inequality join + row_number.
  *
  * Implementation is the scalable union-and-sweep form, NOT a range
  * join: both sides are unioned, shuffled ONCE on the key, and sorted
  * by time within each key partition; a running `last(payload,
  * ignoreNulls)` over an unbounded-preceding frame then carries the
  * latest right payload forward into each left row. Costs exactly one
  * shuffle of |L|+|R| rows and one sort — no join node at all, so
  * there is no quadratic candidate blow-up however dense the right
  * side is, and the running-last frame is streaming (O(1) memory per
  * partition, not O(rows)).
  *
  * Semantics notes:
  *   - ties on the right side (several right rows at one instant for
  *     one key) resolve to the greatest `rightTies` tuple, so results
  *     are deterministic; pass a unique column.
  *   - rows whose key is NULL group together (window semantics): a
  *     null-keyed left row can match a null-keyed right row, unlike an
  *     equi-join. Filter nulls first for SQL-join semantics.
  *   - unmatched left rows survive with null payload (left-outer).
  *
  * Column contract: output = every left column, plus every non-key
  * right column (including `rightTime`); the two sets must be disjoint
  * — rename right-side columns before calling.
  *
  * Skew: the window partitions by key, so ONE hot key's entire
  * (left + right) history sorts inside one task — inherent to
  * running-last semantics (each row needs every earlier right row's
  * carry-forward), not a planning defect. The sort is disk-spillable
  * ExternalSort, so a hot key degrades to spilled-sort throughput
  * rather than OOM (TemporalJoinSpec pins correctness on a
  * one-key-dominates fixture). For a pathologically hot key at corpus
  * scale, pre-compact the RIGHT side first — keep only the last right
  * row per (key, coarse time bucket) that any later-bucket left row
  * could see, which shrinks the sorted run to ~buckets + left rows —
  * then as-of join the compacted side; the left side's own volume
  * parallelizes only across keys, by definition of the semantics.
  */
object AsofJoin {

  def leftAsof(
      left: DataFrame, right: DataFrame,
      keys: Seq[String],
      leftTime: String, rightTime: String,
      rightTies: Seq[String] = Nil,
      strict: Boolean = false): DataFrame = {
    require(keys.nonEmpty, "as-of join needs at least one key column")
    val payload = right.columns.filterNot(keys.contains).toSeq
    val overlap = payload.toSet.intersect(left.columns.toSet)
    require(overlap.isEmpty,
      s"right payload columns collide with left columns: $overlap")
    val internal = Seq("__ts", "__tag", "__r", "__m")
    require(!internal.exists(left.columns.contains),
      s"left must not contain reserved columns $internal")

    // Tag order decides whether an equal-timestamp right row is
    // visible to a left row: inclusive → right sorts first.
    val (rTag, lTag) = if (strict) (1, 0) else (0, 1)
    val r2 = right.select(
      keys.map(col) ++ Seq(
        col(rightTime).as("__ts"), lit(rTag).as("__tag"),
        struct(payload.map(col): _*).as("__r")): _*)
    val l2 = left
      .withColumn("__ts", col(leftTime))
      .withColumn("__tag", lit(lTag))
    val unioned = l2.unionByName(r2, allowMissingColumns = true)

    // Among right rows at one (key, ts): the LAST in sort order wins
    // the running-last, so ascending tie order == greatest-tuple-wins.
    // Left and right rows never share a __tag, so tie columns (null on
    // left rows) never reorder across sides.
    val order = col("__ts").asc +: col("__tag").asc +:
      rightTies.map(t => col(s"__r.$t").asc)
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    unioned
      .withColumn("__m", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__tag") === lTag)
      .select(left.columns.map(col) ++
        payload.map(p => col(s"__m.$p").as(p)): _*)
  }
}
