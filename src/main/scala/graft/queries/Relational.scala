package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType

import graft.io.Tables

/** Core relational operator surface (SURVEY.md §2.3–§2.9), expressed
  * declaratively over the driver test tables so Catalyst plans the
  * physical execution (pushdown, partial aggregation, broadcast joins).
  *
  * Determinism conventions shared with the DuckDB oracles:
  *   - money sums go through DECIMAL(18,2/4) so they are exact and
  *     order-independent, then surface as DOUBLE;
  *   - timestamps surface as formatted UTC strings;
  *   - every query has a total deterministic ORDER BY (ties broken by a
  *     unique key) so LIMIT/top-k agree across engines.
  */
object Relational {

  private val dec2 = DecimalType(18, 2)
  private val dec4 = DecimalType(18, 4)

  /** A1/A2/A9 — grouped aggregation with exact sums (TPC-H Q1 shape).
    * Partial (map-side) aggregation + 2-phase hash agg come from Catalyst. */
  def pricingSummary(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.lineitem(spark, dir)
      .groupBy($"l_returnflag", $"l_linestatus")
      .agg(
        sum($"l_quantity").cast("double").as("sum_qty"),
        sum($"l_extendedprice".cast(dec2)).cast("double").as("sum_base_price"),
        sum(($"l_extendedprice" * (lit(1.0) - $"l_discount")).cast(dec4))
          .cast("double").as("sum_disc_price"),
        count(lit(1)).as("count_order"))
      .orderBy($"l_returnflag", $"l_linestatus")
  }

  /** P1-style filter + projection; both reach the parquet scan
    * (PushedFilters / ReadSchema) so a 100 TB scan reads only 5 columns. */
  def filterProject(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.lineitem(spark, dir)
      .filter($"l_shipdate" >= lit("1999-01-01").cast("timestamp") &&
        $"l_quantity" > 45)
      .select(
        $"l_orderkey", $"l_partkey", $"l_linenumber",
        $"l_quantity".cast("double").as("l_quantity"),
        date_format($"l_shipdate", "yyyy-MM-dd HH:mm:ss").as("ship_ts"))
      .orderBy($"l_orderkey", $"l_linenumber")
  }

  /** A10 — conditional counts, SUM(CASE(...)) (open/closed split of the
    * reference's scenario 1, docs/test_scenario.md:21-23). */
  def conditionalAgg(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.orders(spark, dir)
      .groupBy($"o_orderpriority")
      .agg(
        count(lit(1)).as("n_orders"),
        sum(when($"o_orderstatus" === "F", 1).otherwise(0)).as("n_finished"),
        sum(when($"o_orderstatus" === "O", 1).otherwise(0)).as("n_open"),
        sum(when($"o_orderstatus" === "P", 1).otherwise(0)).as("n_partial"))
      .orderBy($"o_orderpriority")
  }

  /** A11 — COUNT_DISTINCT (distinct authors of scenario 2). Exact here;
    * `approx_count_distinct` is the 100 TB switch (see Scale.scala). */
  def countDistinctAgg(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.orders(spark, dir)
      .groupBy($"o_orderstatus")
      .agg(
        countDistinct($"o_custkey").as("n_customers"),
        count(lit(1)).as("n_orders"))
      .orderBy($"o_orderstatus")
  }

  /** A12 — MIN/MAX over timestamps (commit-history range, scenario 6). */
  def timestampRange(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.orders(spark, dir)
      .groupBy($"o_orderpriority")
      .agg(
        date_format(min($"o_orderdate"), "yyyy-MM-dd HH:mm:ss").as("first_ts"),
        date_format(max($"o_orderdate"), "yyyy-MM-dd HH:mm:ss").as("last_ts"),
        count(lit(1)).as("n_orders"))
      .orderBy($"o_orderpriority")
  }

  /** A13/W1 — grouped count + SORT DESC + LIMIT (top-k hotspots,
    * scenario 5). Spark plans this as partial-agg → shuffle → TakeOrdered. */
  def topKCustomers(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.orders(spark, dir)
      .groupBy($"o_custkey")
      .agg(
        count(lit(1)).as("n_orders"),
        sum($"o_totalprice".cast(dec2)).cast("double").as("total_spend"))
      .orderBy($"n_orders".desc, $"o_custkey".asc)
      .limit(10)
  }

  /** J3 — enrichment join against a small dimension: broadcast so the
    * fact side never shuffles (dict-lookup of collectors.py:122-142). */
  def broadcastEnrich(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val li = Tables.lineitem(spark, dir)
    val p = Tables.part(spark, dir)
    li.join(broadcast(p), $"l_partkey" === $"p_partkey")
      .groupBy($"p_brand")
      .agg(
        sum($"l_quantity").cast("double").as("sum_qty"),
        sum(($"l_extendedprice" * (lit(1.0) - $"l_discount")).cast(dec4))
          .cast("double").as("revenue"),
        count(lit(1)).as("n_lines"))
      .orderBy($"p_brand")
  }

  /** ES|QL-implied cross-entity join chain by shared keys
    * (docs/pipeline_outputs.md:220): fact table joined through three
    * broadcast dimensions, aggregated per region/nation. */
  def regionalRevenue(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val o = Tables.orders(spark, dir)
    val c = Tables.customer(spark, dir)
    val n = Tables.nation(spark, dir)
    val r = Tables.region(spark, dir)
    o.join(broadcast(c), $"o_custkey" === $"c_custkey")
      .join(broadcast(n), $"c_nationkey" === $"n_nationkey")
      .join(broadcast(r), $"n_regionkey" === $"r_regionkey")
      .groupBy($"r_name", $"n_name")
      .agg(
        sum($"o_totalprice".cast(dec2)).cast("double").as("revenue"),
        count(lit(1)).as("n_orders"),
        countDistinct($"o_custkey").as("n_customers"))
      .orderBy($"r_name", $"n_name")
  }

  /** J7/§2.8 — set-difference semantics as a left-anti join (cache-diff
    * of collectors.py:339-364): customers with no order since 2001. */
  def antiJoinDormant(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val c = Tables.customer(spark, dir)
    val recent = Tables.orders(spark, dir)
      .filter($"o_orderdate" >= lit("2001-01-01").cast("timestamp"))
    c.join(recent, $"c_custkey" === $"o_custkey", "left_anti")
      .select($"c_custkey", $"c_name", $"c_mktsegment")
      .orderBy($"c_custkey")
  }

  /** J5/W4 — dedup-by-recency: latest record per key via row_number over
    * (key, recency desc), the merge-winner rule of collectors.py:596-609. */
  def latestOrderPerCustomer(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"o_custkey")
      .orderBy($"o_orderdate".desc, $"o_orderkey".desc)
    Tables.orders(spark, dir)
      .withColumn("rn", row_number().over(w))
      .filter($"rn" === 1)
      .select(
        $"o_custkey", $"o_orderkey",
        date_format($"o_orderdate", "yyyy-MM-dd HH:mm:ss").as("latest_order_ts"),
        $"o_totalprice".cast(dec2).cast("double").as("o_totalprice"))
      .orderBy($"o_custkey")
  }

  /** M3/M4 — union of two differently-shaped sources into one schema
    * (linkers.py:253-263 issues ∪ PRs). */
  def unionEntities(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val c = Tables.customer(spark, dir).select(
      $"c_name".as("name"), $"c_acctbal".as("acctbal"),
      lit("customer").as("kind"))
    val s = Tables.supplier(spark, dir).select(
      $"s_name".as("name"), $"s_acctbal".as("acctbal"),
      lit("supplier").as("kind"))
    c.unionByName(s).orderBy($"kind", $"name")
  }

  /** P11/P12 — deterministic document identity: composite key via
    * concat_ws + content hash (schema.py:303-366, stable_hash_id). */
  def stableIds(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.orders(spark, dir)
      .filter($"o_orderkey" <= 1000)
      .select(
        $"o_orderkey",
        concat_ws("#", lit("tpch"), lit("order"), $"o_orderkey").as("doc_id"),
        sha2(concat_ws("#", lit("tpch"), lit("order"), $"o_orderkey"), 256)
          .as("doc_sha"))
      .orderBy($"o_orderkey")
  }

  /** Dynamic-fringe JSON extraction (§1.3): pull a typed field out of an
    * untyped JSON props column, then aggregate. */
  def jsonExtractAgg(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.events(spark, dir)
      .withColumn("k", get_json_object($"props", "$.k").cast("long"))
      .groupBy($"event_type")
      .agg(
        count(lit(1)).as("n_events"),
        sum($"k").as("sum_k"),
        min($"k").as("min_k"),
        max($"k").as("max_k"))
      .orderBy($"event_type")
  }

  /** §2.10 — tumbling-window (hourly) aggregation over the event stream;
    * batch form of the watermarked streaming agg (see streaming/). */
  def hourlyEventRollup(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.events(spark, dir)
      .groupBy(
        date_format(date_trunc("hour", $"ts"), "yyyy-MM-dd HH:mm:ss").as("hour"),
        $"event_type")
      .agg(
        count(lit(1)).as("n_events"),
        sum($"value".cast(dec4)).cast("double").as("sum_value"))
      .orderBy($"hour", $"event_type")
  }

  /** q109 — ZERO-FILLED date histogram (the ES `date_histogram` with
    * `min_doc_count: 0` + `extended_bounds`): q14's hourly rollup
    * over a DENSE bucket grid — every hour of [min, max] × every
    * event type reports, empty buckets as explicit zeros. The face
    * every dashboard needs (a gap in a sparse rollup reads as
    * "no data point", not "zero events") and the reason ES grew the
    * option.
    *
    * Scale shape: the corpus pays exactly q14's one aggregation
    * shuffle; the GRID is hours × types — bounded by the time range
    * and type cardinality, never the corpus — built from a 1-row
    * min/max broadcast and a distinct-types frame, then left-joined
    * with the bucket counts (bucket-frame-sized join). Zero-fill is
    * a coalesce. */
  def hourlyRollupDense(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = Tables.events(spark, dir)
      .select(date_trunc("hour", $"ts").as("h"), $"event_type", $"value")
    val counts = ev.groupBy($"h", $"event_type")
      .agg(count(lit(1)).as("n_events"),
        sum($"value".cast(dec4)).cast("double").as("sum_value"))
    val hours = ev.agg(min($"h").as("h0"), max($"h").as("h1"))
      .select(explode(sequence($"h0", $"h1",
        expr("interval 1 hour"))).as("h"))
    val types = ev.select($"event_type").distinct()
    hours.crossJoin(broadcast(types))
      .join(counts, Seq("h", "event_type"), "left")
      .select(date_format($"h", "yyyy-MM-dd HH:mm:ss").as("hour"),
        $"event_type",
        coalesce($"n_events", lit(0L)).as("n_events"),
        coalesce($"sum_value", lit(0.0)).as("sum_value"))
      .orderBy($"hour", $"event_type")
  }

  /** q110 — percentile ranks (the ES `percentile_ranks` aggregation,
    * the inverse of q49's `percentiles`): per language, the percent
    * of documents at or below each fixed length threshold — "where
    * does 500 chars sit in this language's distribution". EXACT from
    * integer conditional sums (no sketch, no sort): one aggregation
    * shuffle, the same single-pass conditional-agg mechanism as q03;
    * at corpus scale the same values come from
    * `Scale.approxQuantiles`' inverse lookup if a sketch is
    * preferred, but exact ranks need no per-group sort — counting
    * beats ordering. */
  def percentileRanks(spark: SparkSession, dir: String,
      values: Seq[Int] = Seq(200, 500, 1000)): DataFrame = {
    import spark.implicits._
    val prs = values.map(v =>
      round(sum(when($"n_chars" <= v, 1L).otherwise(0L)) * 100.0 /
        count(lit(1)), 4).as(s"pr_$v"))
    val aggs = count(lit(1)).as("n_docs") +: prs
    Tables.documents(spark, dir)
      .groupBy($"lang")
      .agg(aggs.head, aggs.tail: _*)
      .orderBy($"lang")
  }

  /** q119 — composite aggregation with after-key pagination (the ES
    * `composite` agg, its ONLY agg designed for exhaustively paging
    * high-cardinality bucket spaces): buckets over the source tuple
    * (lang, source) stream in composite-key order, each page starting
    * strictly AFTER the previous page's last key — keyset pagination,
    * never offset. Emits page 2 of size 10: the after key is page 1's
    * last bucket key, derived here as a bounded (1-row) driver
    * artifact (the q98 convention; a deployment passes the `after`
    * its client received).
    *
    * Scale shape — why ES built composite and why this translation
    * keeps its property: a plain terms agg materializes ALL buckets
    * to rank them (OOM at high cardinality); composite instead
    * streams buckets in key order, and the after-key predicate means
    * page N+1 never pays for pages 1..N (no deep offset). Here the
    * bucket frame is ONE map-side-combined shuffle (|lang×source|
    * rows, corpus-independent), the after predicate pushes into the
    * bucket scan, and each page is a TakeOrdered — no global sort of
    * the bucket space, same shape at any key cardinality. */
  def compositeAggPage(spark: SparkSession, dir: String,
      size: Int = 10): DataFrame = {
    import spark.implicits._
    val buckets = Tables.documents(spark, dir)
      .groupBy($"lang", $"source")
      .agg(count(lit(1)).as("doc_count"))
    // page 1's last key = the after cursor (1-row driver artifact)
    val after = buckets.select($"lang", $"source")
      .orderBy($"lang", $"source").limit(size)
      .orderBy($"lang".desc, $"source".desc).limit(1)
      .collect().head
    val (aLang, aSrc) = (after.getString(0), after.getString(1))
    buckets
      .filter($"lang" > aLang ||
        ($"lang" === aLang && $"source" > aSrc))
      .orderBy($"lang", $"source")
      .limit(size)
  }

  /** q125 — pipeline aggregations (ES `derivative`, `moving_fn`
    * average, `cumulative_sum` — the bucket-script family that
    * post-processes a date_histogram's buckets): per event type over
    * the hourly rollup, bucket-to-bucket derivative (null first
    * bucket, as ES emits no derivative for it), trailing-24-bucket
    * moving average, and the running total. Windows run over EXISTING
    * buckets (ES pipeline aggs see the histogram's buckets; compose
    * with q109's dense grid when gap buckets must count as zeros).
    *
    * Scale shape: the corpus pays q14's one aggregation shuffle; all
    * three pipeline columns are windows over the hour×type AGGREGATE
    * (bounded by the time range, never the corpus), one window
    * shuffle keyed by event_type. */
  def pipelineAggs(spark: SparkSession, dir: String,
      window: Int = 24): DataFrame = {
    import spark.implicits._
    val hourly = Tables.events(spark, dir)
      .groupBy(date_trunc("hour", $"ts").as("h"), $"event_type")
      .agg(count(lit(1)).as("n_events"))
    val w = Window.partitionBy($"event_type").orderBy($"h")
    hourly
      .withColumn("derivative",
        $"n_events" - lag($"n_events", 1).over(w))
      .withColumn("moving_avg", round(
        avg($"n_events").over(w.rowsBetween(-(window - 1), 0)), 4))
      .withColumn("cum_sum", sum($"n_events").over(
        w.rowsBetween(Window.unboundedPreceding, 0)))
      .select(date_format($"h", "yyyy-MM-dd HH:mm:ss").as("hour"),
        $"event_type", $"n_events", $"derivative", $"moving_avg",
        $"cum_sum")
      .orderBy($"hour", $"event_type")
  }

  /** A1–A4 blame-rollup shape under the oracle gate: synthetic blame
    * ranges derived from lineitem (path/author/lines columns), rolled
    * up per file with the dominant author — the same
    * per-(path,author) sum → per-path argmax pipeline
    * `Blame.summarizeBlame` runs, with deterministic (lines desc,
    * author asc) tiebreaks both engines agree on. */
  def blameRollup(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ranges = Tables.lineitem(spark, dir).select(
      concat(lit("f"), ($"l_partkey" % 100).cast("string")).as("path"),
      concat(lit("a"), ($"l_suppkey" % 25).cast("string")).as("author"),
      ($"l_linenumber" + 1).cast("long").as("lines"))
    val perAuthor = ranges.groupBy($"path", $"author")
      .agg(sum($"lines").as("author_lines"), count(lit(1)).as("n_ranges"))
    val w = Window.partitionBy($"path")
      .orderBy($"author_lines".desc, $"author".asc)
    perAuthor
      .withColumn("rn", row_number().over(w))
      .groupBy($"path")
      .agg(
        sum($"author_lines").as("total_lines"),
        sum($"n_ranges").as("ranges_count"),
        max(when($"rn" === 1, $"author")).as("top_author"),
        max(when($"rn" === 1, $"author_lines")).as("top_author_lines"))
      .orderBy($"path")
  }

  /** Skew-salted join under the oracle gate: a synthetically hot key
    * (80% of lineitem rows collapse to partkey 1) joined to the part
    * dimension through Scale.saltedJoin — output must equal the plain
    * join, which is exactly what the DuckDB oracle runs. */
  def saltedJoinRollup(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val big = Tables.lineitem(spark, dir).select(
      when($"l_orderkey" % 10 < 8, 1L).otherwise($"l_partkey").as("k"),
      $"l_quantity")
    val dim = Tables.part(spark, dir)
      .select($"p_partkey".as("k"), $"p_brand")
    graft.ops.Scale.saltedJoin(big, dim, "k", 16)
      .groupBy($"p_brand")
      .agg(
        count(lit(1)).as("n_lines"),
        sum($"l_quantity").cast("double").as("sum_qty"))
      .orderBy($"p_brand")
  }

  /** §2.9 OLAP hierarchy rollup: (region, nation) revenue, per-region
    * subtotals, and the grand total in ONE aggregation pass — Spark
    * expands the grouping sets map-side and partial-aggregates all
    * three levels in the same shuffle, vs. three scans + a union.
    * grouping() flags disambiguate a real 'ALL' value from a subtotal
    * row and give the deterministic level sort. */
  def revenueRollup(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val o = Tables.orders(spark, dir)
    val c = Tables.customer(spark, dir)
    val n = Tables.nation(spark, dir)
    val r = Tables.region(spark, dir)
    o.join(broadcast(c), $"o_custkey" === $"c_custkey")
      .join(broadcast(n), $"c_nationkey" === $"n_nationkey")
      .join(broadcast(r), $"n_regionkey" === $"r_regionkey")
      .rollup($"r_name", $"n_name")
      .agg(
        grouping($"r_name").cast("long").as("g_region"),
        grouping($"n_name").cast("long").as("g_nation"),
        sum($"o_totalprice".cast(dec2)).cast("double").as("revenue"),
        count(lit(1)).as("n_orders"))
      .select(
        coalesce($"r_name", lit("ALL")).as("region"),
        coalesce($"n_name", lit("ALL")).as("nation"),
        $"g_region", $"g_nation", $"revenue", $"n_orders")
      .orderBy($"g_region", $"g_nation", $"region", $"nation")
  }

  /** §2.9 OLAP cube: (status, priority) over the FULL grouping
    * lattice — all four combinations in one aggregation pass (rollup
    * covers only the hierarchy prefix). Same single-shuffle property
    * as q47: Spark Expands the grouping sets map-side and
    * partial-aggregates every level in the same exchange; grouping()
    * flags disambiguate a real value from a subtotal row. */
  def orderCube(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.orders(spark, dir)
      .cube($"o_orderstatus", $"o_orderpriority")
      .agg(
        grouping($"o_orderstatus").cast("long").as("g_status"),
        grouping($"o_orderpriority").cast("long").as("g_priority"),
        count(lit(1)).as("n_orders"),
        sum($"o_totalprice".cast(dec2)).cast("double").as("revenue"))
      .select(
        coalesce($"o_orderstatus", lit("ALL")).as("status"),
        coalesce($"o_orderpriority", lit("ALL")).as("priority"),
        $"g_status", $"g_priority", $"n_orders", $"revenue")
      .orderBy($"g_status", $"g_priority", $"status", $"priority")
  }

  /** §2.9 pivot: per-customer-segmentless event matrix — one row per
    * user, one column per event type. The pivot is a single groupBy
    * with a fixed column list (values supplied, so no extra distinct
    * scan to discover them), i.e. one shuffle on user_id. */
  def eventPivot(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val types = Seq("click", "error", "purchase", "signup", "view")
    Tables.events(spark, dir)
      .groupBy($"user_id")
      .pivot("event_type", types)
      .agg(count(lit(1)))
      .na.fill(0L, types)
      .select($"user_id" +: types.map(t => col(t).as(s"n_$t")): _*)
      .orderBy($"user_id")
  }

  /** q84 — strict sequential conversion funnel over the events
    * stream: view → click-after-view → purchase-after-click, per-user
    * first-occurrence times, reported as per-stage user counts and
    * mean seconds from the previous stage. Each stage is one
    * FILTERED aggregation on user_id (the funnel predicate prunes at
    * the scan; the stage frames are user-count-sized, so the chained
    * joins are broadcast-or-small shuffles — never events-sized
    * twice). Latency math is exact: epoch-microsecond longs, summed
    * exactly, divided once at the end (4dp). */
  def conversionFunnel(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = Tables.events(spark, dir)
      .select($"user_id", $"event_type", unix_micros($"ts").as("us"))
    val tv = ev.filter($"event_type" === "view")
      .groupBy($"user_id").agg(min($"us").as("t1"))
    val tc = ev.filter($"event_type" === "click")
      .join(tv, Seq("user_id"))
      .filter($"us" > $"t1")
      .groupBy($"user_id").agg(min($"us").as("t2"), first($"t1").as("t1"))
    val tp = ev.filter($"event_type" === "purchase")
      .join(tc, Seq("user_id"))
      .filter($"us" > $"t2")
      .groupBy($"user_id").agg(min($"us").as("t3"), first($"t2").as("t2"))
    val s1 = tv.agg(count(lit(1)).as("n_users"))
      .select(lit("1_view").as("stage"), $"n_users",
        lit(0.0).as("mean_secs_from_prev"))
    val s2 = tc.agg(count(lit(1)).as("n_users"),
        sum($"t2" - $"t1").as("d"))
      .select(lit("2_click").as("stage"), $"n_users",
        round($"d".cast("double") / $"n_users" / 1000000d, 4)
          .as("mean_secs_from_prev"))
    val s3 = tp.agg(count(lit(1)).as("n_users"),
        sum($"t3" - $"t2").as("d"))
      .select(lit("3_purchase").as("stage"), $"n_users",
        round($"d".cast("double") / $"n_users" / 1000000d, 4)
          .as("mean_secs_from_prev"))
    s1.unionByName(s2).unionByName(s3).orderBy($"stage")
  }

  /** q85 — retention cohorts: users grouped by first-seen day, then
    * distinct active users per (cohort, day-offset) for the first
    * week — the standard engagement triangle. First-seen is one
    * user-keyed aggregation; the offset join probes it user-by-user
    * (user-count-sized build side → broadcast at any realistic
    * events:users ratio); the final rollup is one (cohort, offset)
    * aggregation. Dates compare as DATE-truncated epochs — no
    * timezone arithmetic beyond the session's pinned UTC. */
  def retentionCohorts(spark: SparkSession, dir: String,
      maxOffset: Int = 7): DataFrame = {
    import spark.implicits._
    val ev = Tables.events(spark, dir)
      .select($"user_id", to_date($"ts").as("d"))
    val first = ev.groupBy($"user_id").agg(min($"d").as("cohort"))
    ev.join(first, Seq("user_id"))
      .withColumn("day_offset", datediff($"d", $"cohort").cast("long"))
      .filter($"day_offset" <= maxOffset)
      .groupBy(date_format($"cohort", "yyyy-MM-dd").as("cohort"),
        $"day_offset")
      .agg(count_distinct($"user_id").as("n_users"))
      .orderBy($"cohort", $"day_offset")
  }

  /** q96 — event-rate anomaly flags: per (event_type, hour), the
    * z-score of the hourly event count against its trailing
    * `lookback`-hour window — the operational monitor a streaming
    * ingest runs beside the pipeline (traffic spike, dead source,
    * replay storm). Only fully-windowed hours are scored (count = 24
    * baseline hours), so every z has the same support.
    *
    * Determinism across engines: mean and variance come from EXACT
    * integer window sums (Σx, Σx² over integer counts) rather than
    * the engines' native stddev aggregates — Spark's stddev is a
    * Welford-style online update and DuckDB's a different pass
    * structure, so their last-ulp floats can disagree; (Σx² −
    * (Σx)²/n)/(n−1) from exact integers is one bit-identical double
    * chain, and IEEE sqrt is correctly rounded, so z matches to the
    * bit. Zero-variance windows score z = 0 (flagging "any change
    * after 24 identical hours" is a policy, not a statistic).
    *
    * Scale shape: the corpus pays ONE aggregation (hour × type); the
    * window runs over that AGGREGATE frame (|types| × |hours| rows —
    * monitoring-scale), partitioned by event_type: a type's full
    * history in one task is fine because the frame is already
    * thousands of rows per year, not events. */
  def eventAnomalies(spark: SparkSession, dir: String,
      lookback: Int = 24, zThreshold: Double = 3.0): DataFrame =
    eventAnomaliesFrame(Tables.events(spark, dir), lookback, zThreshold)
      .orderBy(col("event_type"), col("hour"))

  /** Frame-level q96 over any `events(event_type, ts)` — what the
    * fixture specs drive directly. Unordered. */
  def eventAnomaliesFrame(events: DataFrame,
      lookback: Int = 24, zThreshold: Double = 3.0): DataFrame = {
    import events.sparkSession.implicits._
    val hourly = events
      .groupBy($"event_type", date_trunc("hour", $"ts").as("h"))
      .agg(count(lit(1)).as("n_events"))
    val w = Window.partitionBy($"event_type").orderBy($"h")
      .rowsBetween(-lookback, -1)
    hourly
      .withColumn("base_n", count($"n_events").over(w))
      .withColumn("s1", sum($"n_events").over(w))
      .withColumn("s2", sum($"n_events" * $"n_events").over(w))
      .filter($"base_n" === lookback)
      .withColumn("base_avg", $"s1".cast("double") / lookback)
      .withColumn("variance",
        ($"s2".cast("double") - $"s1".cast("double") * $"s1" / lookback) /
          (lookback - 1))
      .withColumn("z",
        when($"variance" > 0d,
          ($"n_events" - $"base_avg") / sqrt($"variance"))
          .otherwise(lit(0d)))
      .select($"event_type",
        date_format($"h", "yyyy-MM-dd HH:mm:ss").as("hour"),
        $"n_events", round($"base_avg", 4).as("base_avg"),
        round($"z", 4).as("z"),
        ($"z" > zThreshold || $"z" < -zThreshold).cast("long")
          .as("anomaly"))
  }

  /** SQL strings the DuckDB oracle runs on the same tables. Column names
    * and ordering must match the DataFrame outputs above exactly. */
  val oracles: Map[String, String] = Map(
    // q125: windows over the hour×type aggregate, never the events
    "q125_pipeline_aggs" ->
      """WITH hourly AS (SELECT event_type, date_trunc('hour', ts) AS h,
        |    COUNT(*) AS n_events
        |  FROM events GROUP BY 1, 2)
        |SELECT strftime(h, '%Y-%m-%d %H:%M:%S') AS hour, event_type,
        |  CAST(n_events AS BIGINT) AS n_events,
        |  CAST(n_events - lag(n_events) OVER w AS BIGINT) AS derivative,
        |  round(AVG(n_events) OVER (PARTITION BY event_type ORDER BY h
        |    ROWS BETWEEN 23 PRECEDING AND CURRENT ROW), 4) AS moving_avg,
        |  CAST(SUM(n_events) OVER (PARTITION BY event_type ORDER BY h
        |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_sum
        |FROM hourly
        |WINDOW w AS (PARTITION BY event_type ORDER BY h)
        |ORDER BY hour, event_type""".stripMargin,
    // q119: the after key is page 1's last composite key (row size);
    // page 2 = keyset predicate + limit, never offset
    "q119_composite_agg" ->
      """WITH b AS (SELECT lang, source,
        |    CAST(COUNT(*) AS BIGINT) AS doc_count
        |  FROM documents GROUP BY lang, source),
        |o AS (SELECT *, row_number() OVER (ORDER BY lang, source) AS rn
        |  FROM b),
        |a AS (SELECT lang AS a_lang, source AS a_src FROM o WHERE rn = 10)
        |SELECT lang, source, doc_count
        |FROM b CROSS JOIN a
        |WHERE lang > a_lang OR (lang = a_lang AND source > a_src)
        |ORDER BY lang, source LIMIT 10""".stripMargin,
    "q109_dense_histogram" ->
      """WITH ev AS (SELECT date_trunc('hour', ts) AS h, event_type, value
        |  FROM events),
        |cnt AS (SELECT h, event_type, COUNT(*) AS n_events,
        |    CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
        |  FROM ev GROUP BY 1, 2),
        |b AS (SELECT min(h) AS h0, max(h) AS h1 FROM ev),
        |hrs AS (SELECT unnest(generate_series(h0, h1, INTERVAL 1 HOUR))
        |    AS h FROM b),
        |ty AS (SELECT DISTINCT event_type FROM ev),
        |grid AS (SELECT h, event_type FROM hrs CROSS JOIN ty)
        |SELECT strftime(g.h, '%Y-%m-%d %H:%M:%S') AS hour, g.event_type,
        |  COALESCE(c.n_events, 0) AS n_events,
        |  COALESCE(c.sum_value, 0.0) AS sum_value
        |FROM grid g LEFT JOIN cnt c
        |  ON g.h = c.h AND g.event_type = c.event_type
        |ORDER BY hour, g.event_type""".stripMargin,
    "q110_percentile_ranks" ->
      """SELECT lang, COUNT(*) AS n_docs,
        | round(SUM(CASE WHEN n_chars <= 200 THEN 1 ELSE 0 END) * 100.0
        |   / COUNT(*), 4) AS pr_200,
        | round(SUM(CASE WHEN n_chars <= 500 THEN 1 ELSE 0 END) * 100.0
        |   / COUNT(*), 4) AS pr_500,
        | round(SUM(CASE WHEN n_chars <= 1000 THEN 1 ELSE 0 END) * 100.0
        |   / COUNT(*), 4) AS pr_1000
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,
    "q84_conversion_funnel" ->
      """WITH ev AS (SELECT user_id, event_type, epoch_us(ts) AS us
        |            FROM events),
        |tv AS (SELECT user_id, MIN(us) AS t1 FROM ev
        |       WHERE event_type = 'view' GROUP BY user_id),
        |tc AS (SELECT e.user_id, MIN(e.us) AS t2, ANY_VALUE(tv.t1) AS t1
        |       FROM ev e JOIN tv USING (user_id)
        |       WHERE e.event_type = 'click' AND e.us > tv.t1
        |       GROUP BY e.user_id),
        |tp AS (SELECT e.user_id, MIN(e.us) AS t3, ANY_VALUE(tc.t2) AS t2
        |       FROM ev e JOIN tc USING (user_id)
        |       WHERE e.event_type = 'purchase' AND e.us > tc.t2
        |       GROUP BY e.user_id)
        |SELECT '1_view' AS stage, COUNT(*) AS n_users,
        |  0.0 AS mean_secs_from_prev FROM tv
        |UNION ALL
        |SELECT '2_click', COUNT(*),
        |  round(CAST(SUM(t2 - t1) AS BIGINT)::DOUBLE / COUNT(*)
        |    / 1000000, 4) FROM tc
        |UNION ALL
        |SELECT '3_purchase', COUNT(*),
        |  round(CAST(SUM(t3 - t2) AS BIGINT)::DOUBLE / COUNT(*)
        |    / 1000000, 4) FROM tp
        |ORDER BY stage""".stripMargin,
    "q85_retention_cohorts" ->
      """WITH ev AS (SELECT user_id, CAST(ts AS DATE) AS d FROM events),
        |f AS (SELECT user_id, MIN(d) AS cohort FROM ev GROUP BY user_id)
        |SELECT strftime(cohort, '%Y-%m-%d') AS cohort,
        |  CAST(date_diff('day', cohort, d) AS BIGINT) AS day_offset,
        |  COUNT(DISTINCT user_id) AS n_users
        |FROM ev JOIN f USING (user_id)
        |WHERE date_diff('day', cohort, d) <= 7
        |GROUP BY 1, 2 ORDER BY cohort, day_offset""".stripMargin,
    "q47_revenue_rollup" ->
      """SELECT coalesce(r_name, 'ALL') AS region,
        | coalesce(n_name, 'ALL') AS nation,
        | CAST(GROUPING(r_name) AS BIGINT) AS g_region,
        | CAST(GROUPING(n_name) AS BIGINT) AS g_nation,
        | CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
        | COUNT(*) AS n_orders
        |FROM orders
        | JOIN customer ON o_custkey = c_custkey
        | JOIN nation ON c_nationkey = n_nationkey
        | JOIN region ON n_regionkey = r_regionkey
        |GROUP BY ROLLUP(r_name, n_name)
        |ORDER BY g_region, g_nation, region, nation""".stripMargin,
    "q56_order_cube" ->
      """SELECT coalesce(o_orderstatus, 'ALL') AS status,
        | coalesce(o_orderpriority, 'ALL') AS priority,
        | CAST(GROUPING(o_orderstatus) AS BIGINT) AS g_status,
        | CAST(GROUPING(o_orderpriority) AS BIGINT) AS g_priority,
        | COUNT(*) AS n_orders,
        | CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |FROM orders
        |GROUP BY CUBE(o_orderstatus, o_orderpriority)
        |ORDER BY g_status, g_priority, status, priority""".stripMargin,
    "q48_event_pivot" ->
      """SELECT user_id,
        | CAST(COUNT(*) FILTER (event_type = 'click') AS BIGINT) AS n_click,
        | CAST(COUNT(*) FILTER (event_type = 'error') AS BIGINT) AS n_error,
        | CAST(COUNT(*) FILTER (event_type = 'purchase') AS BIGINT)
        |   AS n_purchase,
        | CAST(COUNT(*) FILTER (event_type = 'signup') AS BIGINT) AS n_signup,
        | CAST(COUNT(*) FILTER (event_type = 'view') AS BIGINT) AS n_view
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,
    "q01_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        | CAST(SUM(l_quantity) AS DOUBLE) AS sum_qty,
        | CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        | CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc_price,
        | COUNT(*) AS count_order
        |FROM lineitem GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q02_filter_project" ->
      """SELECT l_orderkey, l_partkey, l_linenumber,
        | CAST(l_quantity AS DOUBLE) AS l_quantity,
        | strftime(l_shipdate, '%Y-%m-%d %H:%M:%S') AS ship_ts
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1999-01-01' AND l_quantity > 45
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q03_conditional_agg" ->
      """SELECT o_orderpriority, COUNT(*) AS n_orders,
        | CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_finished,
        | CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_open,
        | CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS n_partial
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "q04_count_distinct" ->
      """SELECT o_orderstatus, COUNT(DISTINCT o_custkey) AS n_customers,
        | COUNT(*) AS n_orders
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    "q05_timestamp_range" ->
      """SELECT o_orderpriority,
        | strftime(MIN(o_orderdate), '%Y-%m-%d %H:%M:%S') AS first_ts,
        | strftime(MAX(o_orderdate), '%Y-%m-%d %H:%M:%S') AS last_ts,
        | COUNT(*) AS n_orders
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "q06_topk_customers" ->
      """SELECT o_custkey, COUNT(*) AS n_orders,
        | CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_spend
        |FROM orders GROUP BY o_custkey
        |ORDER BY n_orders DESC, o_custkey ASC LIMIT 10""".stripMargin,
    "q07_broadcast_enrich" ->
      """SELECT p_brand,
        | CAST(SUM(l_quantity) AS DOUBLE) AS sum_qty,
        | CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
        | COUNT(*) AS n_lines
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |GROUP BY p_brand ORDER BY p_brand""".stripMargin,
    "q08_regional_revenue" ->
      """SELECT r_name, n_name,
        | CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
        | COUNT(*) AS n_orders,
        | COUNT(DISTINCT o_custkey) AS n_customers
        |FROM orders
        | JOIN customer ON o_custkey = c_custkey
        | JOIN nation ON c_nationkey = n_nationkey
        | JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name ORDER BY r_name, n_name""".stripMargin,
    "q09_anti_join" ->
      """SELECT c_custkey, c_name, c_mktsegment FROM customer
        |WHERE NOT EXISTS (
        |  SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey
        |    AND o_orderdate >= TIMESTAMP '2001-01-01')
        |ORDER BY c_custkey""".stripMargin,
    "q10_latest_per_key" ->
      """SELECT o_custkey, o_orderkey,
        | strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS latest_order_ts,
        | CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS o_totalprice
        |FROM (
        |  SELECT *, ROW_NUMBER() OVER (
        |    PARTITION BY o_custkey
        |    ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
        |  FROM orders) WHERE rn = 1
        |ORDER BY o_custkey""".stripMargin,
    "q11_union_entities" ->
      """SELECT c_name AS name, c_acctbal AS acctbal, 'customer' AS kind FROM customer
        |UNION ALL
        |SELECT s_name AS name, s_acctbal AS acctbal, 'supplier' AS kind FROM supplier
        |ORDER BY kind, name""".stripMargin,
    "q12_stable_ids" ->
      """SELECT o_orderkey,
        | concat_ws('#', 'tpch', 'order', o_orderkey) AS doc_id,
        | sha256(concat_ws('#', 'tpch', 'order', o_orderkey)) AS doc_sha
        |FROM orders WHERE o_orderkey <= 1000 ORDER BY o_orderkey""".stripMargin,
    "q13_json_extract" ->
      """SELECT event_type, COUNT(*) AS n_events,
        | CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
        | CAST(MIN(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS min_k,
        | CAST(MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS max_k
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q14_hourly_rollup" ->
      """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour,
        | event_type, COUNT(*) AS n_events,
        | CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY hour, event_type""".stripMargin,
    // q96 mirrors the exact-integer-sums variance (Σx, Σx² windows);
    // the anomaly flag tests the UNROUNDED z, the output rounds at 4dp
    "q96_event_anomalies" ->
      """WITH hourly AS (SELECT event_type, date_trunc('hour', ts) AS h,
        |    count(*) AS n_events
        |  FROM events GROUP BY 1, 2),
        |win AS (SELECT event_type, h, n_events,
        |    count(n_events) OVER w AS base_n,
        |    SUM(n_events) OVER w AS s1,
        |    SUM(n_events * n_events) OVER w AS s2
        |  FROM hourly
        |  WINDOW w AS (PARTITION BY event_type ORDER BY h
        |               ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING)),
        |sc AS (SELECT event_type, h, n_events,
        |    CAST(s1 AS DOUBLE) / 24 AS base_avg,
        |    (CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)
        |       / 24) / 23 AS variance
        |  FROM win WHERE base_n = 24),
        |z AS (SELECT event_type, h, n_events, base_avg,
        |    CASE WHEN variance > 0
        |         THEN (n_events - base_avg) / sqrt(variance)
        |         ELSE 0 END AS zv
        |  FROM sc)
        |SELECT event_type, strftime(h, '%Y-%m-%d %H:%M:%S') AS hour,
        |  n_events, round(base_avg, 4) AS base_avg, round(zv, 4) AS z,
        |  CAST(CASE WHEN zv > 3.0 OR zv < -3.0 THEN 1 ELSE 0 END AS BIGINT)
        |    AS anomaly
        |FROM z ORDER BY event_type, hour""".stripMargin,
    "q36_blame_rollup" ->
      """WITH ranges AS (
        |  SELECT 'f' || CAST(l_partkey % 100 AS VARCHAR) AS path,
        |    'a' || CAST(l_suppkey % 25 AS VARCHAR) AS author,
        |    CAST(l_linenumber + 1 AS BIGINT) AS lines
        |  FROM lineitem),
        |per_author AS (
        |  SELECT path, author, CAST(SUM(lines) AS BIGINT) AS author_lines,
        |    COUNT(*) AS n_ranges
        |  FROM ranges GROUP BY path, author),
        |ranked AS (
        |  SELECT *, ROW_NUMBER() OVER (
        |    PARTITION BY path ORDER BY author_lines DESC, author ASC) AS rn
        |  FROM per_author)
        |SELECT path,
        |  CAST(SUM(author_lines) AS BIGINT) AS total_lines,
        |  CAST(SUM(n_ranges) AS BIGINT) AS ranges_count,
        |  MAX(CASE WHEN rn = 1 THEN author END) AS top_author,
        |  CAST(MAX(CASE WHEN rn = 1 THEN author_lines END) AS BIGINT)
        |    AS top_author_lines
        |FROM ranked GROUP BY path ORDER BY path""".stripMargin,
    "q37_salted_join" ->
      """WITH big AS (
        |  SELECT CASE WHEN l_orderkey % 10 < 8 THEN 1
        |         ELSE l_partkey END AS k, l_quantity
        |  FROM lineitem),
        |dim AS (SELECT p_partkey AS k, p_brand FROM part)
        |SELECT p_brand, COUNT(*) AS n_lines,
        | CAST(SUM(l_quantity) AS DOUBLE) AS sum_qty
        |FROM big JOIN dim USING (k)
        |GROUP BY p_brand ORDER BY p_brand""".stripMargin,
  )
}
