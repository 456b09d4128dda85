package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.io.Tables
import graft.ops.{Dedup, IncrementalMerge, Multimodal, TextAnalysis}

/** Pipeline-machinery queries: multimodal metadata/decode, the
  * incremental watermark merge (reference J5/J6), and event
  * sessionization — the stateful/windowed end of the surface.
  */
object PipelineQueries {

  private val dec4 = DecimalType(18, 4)

  /** Multimodal metadata pass: typed metadata over opaque binary
    * payloads — size, content hash, frame count. Pure projection, no
    * shuffle; the scan prunes to (doc_id, text). */
  def multimodalMeta(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Multimodal.deriveMedia(Tables.documents(spark, dir))
      .select(
        $"media_id",
        $"media_type",
        length($"payload").cast("long").as("n_bytes"),
        sha2($"payload", 256).as("payload_sha"),
        ceil(length($"payload").cast("double") / Multimodal.FrameBytes)
          .cast("long").as("n_frames"))
      .orderBy($"media_id")
  }

  /** Multimodal decode stub: batched per-partition decode + feature
    * extraction (see Multimodal scaladoc). No SQL oracle — binary
    * decode isn't expressible in DuckDB; driver does the rows check,
    * MultimodalSpec pins the per-frame math. */
  def multimodalDecode(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val media = Multimodal.deriveMedia(Tables.documents(spark, dir))
      .as[Multimodal.MediaRow]
    Multimodal.decodeFeatures(media)
      .toDF()
      .select($"media_id", $"media_type", $"n_bytes", $"n_frames",
        round($"feature_norm", 4).as("feature_norm"))
      .orderBy($"media_id")
  }

  /** J5 — incremental merge: a cached snapshot (orders before the
    * cutoff) merged with a re-fetched delta window that overlaps it by
    * a lookback; fetched rows win per key. Output: per-status counts
    * plus how many winners came from the fetch. */
  def incrementalMerge(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val orders = Tables.orders(spark, dir)
    val cutoff = lit("2001-01-01").cast("timestamp")
    val lookback = lit("2000-12-01").cast("timestamp")
    val cached = orders.filter($"o_orderdate" < cutoff)
    val fetched = orders.filter($"o_orderdate" >= lookback)
    IncrementalMerge.mergeLatest(cached, fetched, Seq("o_orderkey"))
      .groupBy($"o_orderstatus")
      .agg(
        count(lit(1)).as("n_orders"),
        sum($"from_fetched").cast("long").as("n_from_fetched"),
        countDistinct($"o_custkey").as("n_customers"))
      .orderBy($"o_orderstatus")
  }

  /** Frame-sampling metadata pass (the keyframe-subsample step of a
    * video pipeline) under the oracle gate: frame geometry and the
    * first/last sampled frame digests are pure byte arithmetic over
    * the opaque payload, so DuckDB can verify them exactly — the
    * binary-column analogue of partition pruning (sample before the
    * expensive per-frame model runs). The stride is fixed at 4
    * because the q41 oracle SQL hard-codes it — a parameter here
    * would silently desynchronize engine and oracle. */
  def multimodalFrameSample(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val every = 4 // pinned by the q41 oracle
    val fb = Multimodal.FrameBytes
    Multimodal.deriveMedia(Tables.documents(spark, dir))
      .withColumn("n_frames",
        ceil(length($"payload").cast("double") / fb).cast("long"))
      .withColumn("n_sampled",
        ceil($"n_frames".cast("double") / every).cast("long"))
      .select(
        $"media_id",
        $"n_frames",
        $"n_sampled",
        // digests over the (uppercase, byte-aligned) hex rendering of
        // the frame — DuckDB's sha256/slicing are VARCHAR-only, so the
        // portable frame fingerprint hashes hex text in both engines
        sha2(hex(substring($"payload", 1, fb)), 256).as("first_frame_sha"),
        sha2(hex($"payload".substr(
          (($"n_sampled" - 1) * every * fb + 1).cast("int"), lit(fb))), 256)
          .as("last_sampled_frame_sha"))
      .orderBy($"media_id")
  }

  /** J6 — selective enrichment under the oracle gate: orders whose
    * key is divisible by 3 play the already-enriched cache (detail
    * "cached"); `enrichNew` must route ONLY the rest through the
    * expensive detail join (broadcast customer lookup) and union the
    * halves back. The oracle expresses the same result as one CASE
    * over the full join — equality proves the split-and-union is
    * lossless. */
  def selectiveEnrich(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val merged = Tables.orders(spark, dir)
      .select($"o_orderkey", $"o_custkey",
        when($"o_orderkey" % 3 === 0, lit("cached"))
          .otherwise(lit(null).cast("string")).as("detail"))
    val enrichedKeys = merged.filter($"detail".isNotNull)
    val customers = Tables.customer(spark, dir)
      .select($"c_custkey", $"c_name")
    IncrementalMerge.enrichNew(merged, enrichedKeys, Seq("o_orderkey")) {
      fresh =>
        fresh.drop("detail")
          .join(broadcast(customers), $"o_custkey" === $"c_custkey")
          .select($"o_orderkey", $"o_custkey", $"c_name".as("detail"))
    }.orderBy($"o_orderkey")
  }

  /** Sessionization: per-user event streams split at >30 min gaps
    * (lag + running sum of boundaries), then per-session aggregates.
    * One shuffle on user_id; both windows share the partitioning. */
  def sessionize(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(spark, dir)
      .withColumn("prev_us", lag(unix_micros($"ts"), 1).over(w))
      .withColumn("new_sess",
        when($"prev_us".isNull ||
          unix_micros($"ts") - $"prev_us" > 1800L * 1000000L, 1L)
          .otherwise(0L))
      .withColumn("session_id", sum($"new_sess").over(wRun))
      .groupBy($"user_id", $"session_id")
      .agg(
        count(lit(1)).as("n_events"),
        date_format(min($"ts"), "yyyy-MM-dd HH:mm:ss").as("start_ts"),
        date_format(max($"ts"), "yyyy-MM-dd HH:mm:ss").as("end_ts"),
        sum($"value".cast(dec4)).cast("double").as("sum_value"))
      .orderBy($"user_id", $"session_id")
  }

  /** §LLM curation funnel (q53): the end-to-end training-data pass —
    * quality gate (q29's keep rule) → language gate (declared 'en') →
    * exact dedup (md5, min-id wins) → MinHash-LSH near-dup removal
    * (q21's pairs, the larger id of each verified pair drops) — with
    * per-stage document and token counts, the numbers a curation run
    * reports.
    *
    * Scale shape: stages 0–2 are ONE conditional-aggregation scan
    * (no per-stage rescan); exact dedup is one hash shuffle; near-dup
    * reuses the banded-LSH pair machinery (collision join carries
    * (band, hash, id) only). The dedup-survivor frame — read by its
    * own stats, both pair-join sides, and the keep stage — is
    * localCheckpoint'd (the reference pipeline's per-stage artifact,
    * in-memory form) rather than re-derived per consumer; callers
    * free it via Checkpoints.consume as with the other checkpointed
    * results. */
  def curationFunnel(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val enStops = TextAnalysis.stopwords.toMap.apply("en")
    val flagged = Tables.documentsDistributed(spark, dir)
      .withColumn("toks", TextAnalysis.tokensOf($"text"))
      .withColumn("n_tokens", size($"toks").cast("long"))
      .withColumn("q_ok",
        $"n_tokens".between(20, 1000) &&
          round(TextAnalysis.stopwordHits($"toks", enStops).cast("double") /
            $"n_tokens".cast("double"), 4) >= 0.05)
      .withColumn("l_ok", $"q_ok" && $"lang" === "en")
    val s012 = flagged.agg(
      count(lit(1)).as("n0"),
      coalesce(sum(when($"q_ok", 1L).otherwise(0L)), lit(0L)).as("n1"),
      coalesce(sum(when($"l_ok", 1L).otherwise(0L)), lit(0L)).as("n2"),
      coalesce(sum($"n_tokens"), lit(0L)).as("t0"),
      coalesce(sum(when($"q_ok", $"n_tokens").otherwise(0L)), lit(0L))
        .as("t1"),
      coalesce(sum(when($"l_ok", $"n_tokens").otherwise(0L)), lit(0L))
        .as("t2"))
      .selectExpr("stack(3, '0_raw', n0, t0, '1_quality', n1, t1, " +
        "'2_lang', n2, t2) AS (stage, n_docs, total_tokens)")
    // The exact-dedup survivor frame is read ~5 more times (its own
    // stats, both sides of the LSH pair join, the shingle join-backs,
    // and the final keep stats) — materialize it instead of
    // re-deriving the scan+window chain per consumer (plan audit
    // showed 6 parquet scans without this). This IS the reference's
    // per-stage artifact, in in-memory form; the caller's
    // Checkpoints.consume frees it with the result.
    val exact = flagged.filter($"l_ok")
      .withColumn("rn", row_number().over(
        Window.partitionBy(md5($"text")).orderBy($"doc_id")))
      .filter($"rn" === 1)
      .localCheckpoint()
    val pairs = Dedup.minhashLshPairs(
      exact.select($"doc_id", Dedup.shingles($"toks").as("shingles")),
      "doc_id", "shingles")
    val keep = exact.join(pairs.select($"doc_b".as("doc_id")).distinct(),
      Seq("doc_id"), "left_anti")
    def stat(name: String, df: DataFrame) =
      df.agg(count(lit(1)).as("n_docs"),
        coalesce(sum($"n_tokens"), lit(0L)).as("total_tokens"))
        .select(lit(name).as("stage"), $"n_docs", $"total_tokens")
    s012.unionByName(stat("3_exact_dedup", exact))
      .unionByName(stat("4_near_dedup", keep))
      .orderBy($"stage")
  }

  /** §LLM dataset split (q54): stable md5-bucket train/val/test
    * assignment (90/5/5) — reproducible across runs, engines, and
    * corpus growth (an id's split never changes when other documents
    * arrive, unlike `rand`/`sample`). Pure per-row map; see
    * [[graft.ops.Sampling]]. */
  def datasetSplit(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select($"doc_id",
        graft.ops.Sampling.assignSplit($"doc_id", "split",
          Seq("train" -> 90, "val" -> 95), "test").as("split"))
      .orderBy($"doc_id")
  }

  val oracles: Map[String, String] = Map(
    "q54_dataset_split" ->
      """SELECT doc_id,
        |  CASE WHEN b < 90 THEN 'train' WHEN b < 95 THEN 'val'
        |       ELSE 'test' END AS split
        |FROM (SELECT doc_id,
        |        CAST(('0x' || substr(md5('split|' || doc_id::VARCHAR), 1, 8))
        |          AS BIGINT) % 100 AS b
        |      FROM documents)
        |ORDER BY doc_id""".stripMargin,
    "q53_curation_funnel" ->
      s"""WITH base AS (
        |  SELECT doc_id, lang, text,
        |    list_filter(string_split_regex(lower(text), '\\s+'),
        |                t -> length(t) > 0) AS tokens
        |  FROM documents),
        |m AS (
        |  SELECT doc_id, lang, text, tokens,
        |    CAST(len(tokens) AS BIGINT) AS n_tokens,
        |    round(len(list_filter(tokens, t -> t IN
        |       ('the','a','of','and','is','not','to','in')))::DOUBLE
        |      / len(tokens), 4) AS stop_ratio
        |  FROM base),
        |f AS (
        |  SELECT *,
        |    (n_tokens BETWEEN 20 AND 1000 AND stop_ratio >= 0.05) AS q_ok,
        |    (n_tokens BETWEEN 20 AND 1000 AND stop_ratio >= 0.05
        |      AND lang = 'en') AS l_ok
        |  FROM m),
        |ex AS (
        |  SELECT * FROM (
        |    SELECT *, row_number() OVER
        |      (PARTITION BY md5(text) ORDER BY doc_id) AS rn
        |    FROM f WHERE l_ok) WHERE rn = 1),
        |${DedupQueries.shCte("ex")},
        |${DedupQueries.sigCte},
        |${DedupQueries.bandsCte},
        |${DedupQueries.candPairsCte},
        |nd AS (SELECT DISTINCT doc_b AS doc_id FROM cand WHERE j >= 0.7),
        |keep AS (SELECT * FROM ex
        |  WHERE doc_id NOT IN (SELECT doc_id FROM nd))
        |SELECT '0_raw' AS stage, COUNT(*) AS n_docs,
        |  CAST(COALESCE(SUM(n_tokens), 0) AS BIGINT) AS total_tokens FROM m
        |UNION ALL SELECT '1_quality', COUNT(*),
        |  CAST(COALESCE(SUM(n_tokens), 0) AS BIGINT) FROM f WHERE q_ok
        |UNION ALL SELECT '2_lang', COUNT(*),
        |  CAST(COALESCE(SUM(n_tokens), 0) AS BIGINT) FROM f WHERE l_ok
        |UNION ALL SELECT '3_exact_dedup', COUNT(*),
        |  CAST(COALESCE(SUM(n_tokens), 0) AS BIGINT) FROM ex
        |UNION ALL SELECT '4_near_dedup', COUNT(*),
        |  CAST(COALESCE(SUM(n_tokens), 0) AS BIGINT) FROM keep
        |ORDER BY stage""".stripMargin,
    "q30_multimodal_meta" ->
      """SELECT doc_id AS media_id,
        | CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
        |   ELSE 'video' END AS media_type,
        | CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        | sha256(text) AS payload_sha,
        | CAST(ceil(octet_length(encode(text)) / 256.0) AS BIGINT) AS n_frames
        |FROM documents ORDER BY media_id""".stripMargin,
    "q32_incremental_merge" ->
      """WITH unioned AS (
        |  SELECT *, 1 AS from_fetched FROM orders
        |  WHERE o_orderdate >= TIMESTAMP '2000-12-01'
        |  UNION ALL
        |  SELECT *, 0 AS from_fetched FROM orders
        |  WHERE o_orderdate < TIMESTAMP '2001-01-01'),
        |merged AS (
        |  SELECT * FROM (
        |    SELECT *, ROW_NUMBER() OVER (
        |      PARTITION BY o_orderkey ORDER BY from_fetched DESC) AS rn
        |    FROM unioned) WHERE rn = 1)
        |SELECT o_orderstatus, COUNT(*) AS n_orders,
        | CAST(SUM(from_fetched) AS BIGINT) AS n_from_fetched,
        | COUNT(DISTINCT o_custkey) AS n_customers
        |FROM merged GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    "q41_multimodal_frame_sample" ->
      """WITH m AS (
        |  SELECT doc_id AS media_id, encode(text) AS payload,
        |    CAST(ceil(octet_length(encode(text)) / 256.0) AS BIGINT)
        |      AS n_frames
        |  FROM documents),
        |s AS (
        |  SELECT media_id, payload, n_frames,
        |    CAST(ceil(n_frames / 4.0) AS BIGINT) AS n_sampled
        |  FROM m)
        |SELECT media_id, n_frames, n_sampled,
        | sha256(substring(hex(payload), 1, 512)) AS first_frame_sha,
        | sha256(substring(hex(payload),
        |   CAST((n_sampled - 1) * 4 * 256 * 2 + 1 AS BIGINT), 512))
        |   AS last_sampled_frame_sha
        |FROM s ORDER BY media_id""".stripMargin,
    "q38_selective_enrich" ->
      """SELECT o_orderkey, o_custkey,
        | CASE WHEN o_orderkey % 3 = 0 THEN 'cached' ELSE c_name END AS detail
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |ORDER BY o_orderkey""".stripMargin,
    "q33_sessionize" ->
      """WITH x AS (
        |  SELECT user_id, ts, event_id, value,
        |    CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
        |      OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800 * 1000000
        |      THEN 1 ELSE 0 END AS new_sess
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |s AS (
        |  SELECT *, SUM(new_sess) OVER (
        |    PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS UNBOUNDED PRECEDING) AS session_id
        |  FROM x)
        |SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
        | COUNT(*) AS n_events,
        | strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS start_ts,
        | strftime(MAX(ts), '%Y-%m-%d %H:%M:%S') AS end_ts,
        | CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
        |FROM s GROUP BY user_id, session_id
        |ORDER BY user_id, session_id""".stripMargin,
  )
}
