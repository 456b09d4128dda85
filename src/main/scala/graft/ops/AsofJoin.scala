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
  * scale use [[leftAsofBucketed]], which splits the sweep by coarse
  * time bucket (within-bucket join + per-bucket carry) so no sort
  * partition holds more than one bucket's history.
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

  /** [[leftAsof]] with time-bucketed skew mitigation — identical
    * output (TemporalJoinSpec pins equality on random and hot-key
    * fixtures), different cost shape: instead of one sort partition
    * holding a hot key's ENTIRE history, work splits into
    *
    *   1. a within-bucket as-of join partitioned by (key, bucket) —
    *      each sort bounded by one bucket's rows;
    *   2. a carry table: the last right row per (key, bucket)
    *      (one aggregation, max_by the (time, ties) tuple);
    *   3. a bucket-index as-of sweep of the left's DISTINCT
    *      (key, bucket) pairs against the carry table — ~|buckets|
    *      rows per key, not |history|;
    *   4. per left row: the within-bucket match if one exists, else
    *      its bucket's carried match.
    *
    * Correct because only the LAST right row of an earlier bucket can
    * ever be the as-of match for a later-bucket left row (anything
    * else in that bucket is dominated), and same-bucket matches are
    * exact by (1). `bucketSeconds` trades the two extremes: huge →
    * degenerates to [[leftAsof]]'s single sweep; tiny → the carry
    * sweep dominates. Event times must be orderable after a
    * cast-to-seconds floor (any monotone bucketing is correct; the
    * floor keeps pre-1970 times monotone too). */
  def leftAsofBucketed(
      left: DataFrame, right: DataFrame,
      keys: Seq[String],
      leftTime: String, rightTime: String,
      bucketSeconds: Long = 3600,
      rightTies: Seq[String] = Nil,
      strict: Boolean = false): DataFrame = {
    require(bucketSeconds > 0, s"bucketSeconds must be > 0: $bucketSeconds")
    val reserved = Seq("__b", "__bb", "__cb", "__c", "__matched")
    require(!reserved.exists(c =>
        left.columns.contains(c) || right.columns.contains(c)),
      s"left/right must not contain reserved columns $reserved")
    val payload = right.columns.filterNot(keys.contains).toSeq
    // epoch-seconds floor division; floor() keeps negatives monotone
    def bucketOf(t: String) = floor(col(t).cast("timestamp").cast("long")
      .cast("double") / lit(bucketSeconds.toDouble)).cast("long")

    // __matched marks real within-bucket matches (a matched row's
    // payload may be legitimately all-null, so payload nullness can't)
    val lb = left.withColumn("__b", bucketOf(leftTime))
    val rb = right.withColumn("__matched", lit(true))
      .withColumn("__b", bucketOf(rightTime))

    // (1) within-bucket: the bucket joins the key, so each window
    // partition holds one bucket's history only
    val sameBucket = leftAsof(lb, rb, keys :+ "__b", leftTime, rightTime,
      rightTies, strict)

    // (2) last right row per (key, bucket): max_by the same
    // (time, ties) tuple the sweep's tie order uses
    val tieOrder = struct((rightTime +: rightTies).map(col): _*)
    val carry = rb.groupBy((keys :+ "__b").map(col): _*)
      .agg(max_by(struct((payload :+ "__matched").map(col): _*), tieOrder)
        .as("__c"))
      .select(keys.map(col) ++ Seq(col("__b").as("__cb"), col("__c")): _*)

    // (3) strict bucket-index sweep: a left bucket takes the carry of
    // the LATEST EARLIER bucket (its own bucket is step 1's job)
    val lDist = lb.select((keys :+ "__b").map(col): _*).distinct()
    val boundary = leftAsof(lDist, carry, keys, "__b", "__cb",
      rightTies = Nil, strict = true)

    // (4) within-bucket match wins; else the carried one. The
    // re-join must be NULL-SAFE on both the keys and the bucket:
    // leftAsof groups null keys together (window semantics) and a
    // null event time yields a null bucket — a plain equi-join here
    // would silently drop their carried matches (round-6 review
    // finding; the parity spec covers a null-keyed history).
    val bSel = boundary.select(
      keys.zipWithIndex.map { case (k, i) => col(k).as(s"__k$i") } ++
        Seq(col("__b").as("__bb"), col("__c")): _*)
    val joinCond = keys.zipWithIndex
      .map { case (k, i) => col(k) <=> col(s"__k$i") }
      .reduce(_ && _) && (col("__b") <=> col("__bb"))
    sameBucket
      .join(bSel, joinCond, "left")
      .select(left.columns.map(col) ++
        payload.map(p =>
          when(col("__matched").isNotNull, col(p))
            .otherwise(col(s"__c.$p")).as(p)): _*)
  }
}
