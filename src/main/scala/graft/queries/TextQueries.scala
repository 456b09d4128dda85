package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.io.Tables

/** Text-analysis operator surface over the `documents` table: tokenize /
  * explode (MV_EXPAND, §2.9), exact dedup, and per-document quality
  * statistics — the text half of the LLM-pipeline extensions.
  *
  * Everything here is built from codegen'd `functions._` primitives
  * (split/explode/length/md5), so the hot path stays inside
  * whole-stage codegen and distributes trivially: per-document work is
  * embarrassingly parallel, and the only shuffles are the final
  * aggregations on (token) or (hash) keys.
  */
object TextQueries {

  /** M1 — MV_EXPAND: tokenize text, explode, count tokens corpus-wide,
    * top-k with deterministic tiebreak. */
  def topTokens(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select(explode(split($"text", "\\s+")).as("token"))
      .filter(length($"token") > 0)
      .groupBy($"token")
      .agg(count(lit(1)).as("n"))
      .orderBy($"n".desc, $"token".asc)
      .limit(20)
  }

  /** Exact deduplication: content-hash groupBy; the canonical doc is the
    * min doc_id per hash (maps 1:1 to a 100 TB hash-shuffle dedup). */
  def exactDedup(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .groupBy(md5($"text").as("content_hash"))
      .agg(
        min($"doc_id").as("canonical_id"),
        count(lit(1)).as("n_copies"))
      .orderBy($"content_hash")
  }

  /** Token counting + quality scoring: per-document stats used for
    * corpus filtering (length, token count, distinct-token ratio). */
  def docStats(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .withColumn("tokens",
        filter(split($"text", "\\s+"), t => length(t) > 0))
      .select(
        $"doc_id",
        length($"text").cast("long").as("n_chars"),
        size($"tokens").cast("long").as("n_tokens"),
        size(array_distinct($"tokens")).cast("long").as("n_distinct_tokens"),
        when(size($"tokens") >= 20 && size($"tokens") <= 400, 1)
          .otherwise(0).cast("long").as("quality_ok"))
      .orderBy($"doc_id")
  }

  /** Per-language corpus profile joining the doc stats back to the
    * labeled language column. */
  def langProfile(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .withColumn("tokens",
        filter(split($"text", "\\s+"), t => length(t) > 0))
      .groupBy($"lang")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(size($"tokens").cast("long")).as("total_tokens"),
        min($"n_chars").as("min_chars"),
        max($"n_chars").as("max_chars"))
      .orderBy($"lang")
  }

  val oracles: Map[String, String] = Map(
    "q15_top_tokens" ->
      """SELECT token, COUNT(*) AS n FROM (
        |  SELECT unnest(string_split_regex(text, '\s+')) AS token
        |  FROM documents)
        |WHERE length(token) > 0
        |GROUP BY token ORDER BY n DESC, token ASC LIMIT 20""".stripMargin,
    "q16_exact_dedup" ->
      """SELECT md5(text) AS content_hash, MIN(doc_id) AS canonical_id,
        | COUNT(*) AS n_copies
        |FROM documents GROUP BY 1 ORDER BY content_hash""".stripMargin,
    "q17_doc_stats" ->
      """SELECT doc_id,
        | CAST(length(text) AS BIGINT) AS n_chars,
        | CAST(len(list_filter(string_split_regex(text, '\s+'), t -> length(t) > 0)) AS BIGINT) AS n_tokens,
        | CAST(len(list_distinct(list_filter(string_split_regex(text, '\s+'), t -> length(t) > 0))) AS BIGINT) AS n_distinct_tokens,
        | CAST(CASE WHEN len(list_filter(string_split_regex(text, '\s+'), t -> length(t) > 0)) BETWEEN 20 AND 400
        |      THEN 1 ELSE 0 END AS BIGINT) AS quality_ok
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q18_lang_profile" ->
      """SELECT lang, COUNT(*) AS n_docs,
        | CAST(SUM(len(list_filter(string_split_regex(text, '\s+'), t -> length(t) > 0))) AS BIGINT) AS total_tokens,
        | MIN(n_chars) AS min_chars, MAX(n_chars) AS max_chars
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,
  )
}
