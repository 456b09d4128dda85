package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.io.Tables
import graft.ops.{Dedup, TextAnalysis}

/** Near-duplicate detection queries over the `documents` table — the
  * dedup half of the training-data-pipeline surface. Each query is the
  * driver-facing face of a `graft.ops.Dedup` primitive; the DuckDB
  * oracles replicate the same md5-based arithmetic exactly (see
  * Dedup's scaladoc for the determinism contract).
  */
object DedupQueries {

  /** Shingled docs, spread across the cluster BEFORE the expensive
    * per-row minhash work: the test tables are single parquet files
    * (one input split), and signature hashing is CPU-bound per row —
    * without an explicit repartition the whole corpus would hash on
    * one core. At warehouse scale the scan has many splits and this
    * repartition collapses into the existing distribution. */
  private def withShingles(spark: SparkSession, dir: String): DataFrame =
    Tables.documentsDistributed(spark, dir)
      .select(col("doc_id"),
        Dedup.shingles(Dedup.tokens(col("text"))).as("shingles"))

  /** Profiling hook (ProbeQ22) — same frame as the gated queries. */
  def shingledForProbe(spark: SparkSession, dir: String): DataFrame =
    withShingles(spark, dir)

  /** Per-document MinHash signature digest + LSH band keys. Pure
    * per-row map — no shuffle at any scale. The multi-referenced
    * `sig`/`bands` columns stay as withColumn projections on purpose:
    * CollapseProject keeps non-cheap expressions with multiple
    * references in their own Project, so the signature is evaluated
    * once per row (measured faster than element-wise expansion, which
    * costs one extra evaluation per extra reference). */
  def minhashSignature(spark: SparkSession, dir: String): DataFrame = {
    withShingles(spark, dir)
      .withColumn("sig", Dedup.minhashSignature(col("shingles")))
      .withColumn("bands", Dedup.bandHashes(col("sig")))
      .select(col("doc_id"),
        md5(concat_ws(",", col("sig"))).as("sig_digest"),
        col("bands")(0).as("band0"), col("bands")(1).as("band1"),
        col("bands")(2).as("band2"), col("bands")(3).as("band3"))
      .orderBy(col("doc_id"))
  }

  /** Banded-LSH candidate pairs verified with exact Jaccard ≥ 0.7. */
  def minhashLshDedup(spark: SparkSession, dir: String): DataFrame =
    Dedup.minhashLshPairs(withShingles(spark, dir), "doc_id", "shingles")
      .orderBy(col("doc_a"), col("doc_b"))

  /** q68 — incremental near-dup: the doc_id ≥ 250 slice arrives as a
    * new batch and collides against the existing corpus's band index
    * ([[graft.ops.Dedup.minhashLshPairsIncremental]]); only the new
    * batch is hashed and exploded, the old side is the persisted-index
    * stand-in. Output = the q21 pair set restricted to new-batch
    * doc_b — the per-batch delta a running dedup pipeline emits. */
  def incrementalNearDup(spark: SparkSession, dir: String,
      watermark: Long = 250L): DataFrame = {
    val d = withShingles(spark, dir)
    Dedup.minhashLshPairsIncremental(
      d.filter(col("doc_id") < watermark),
      d.filter(col("doc_id") >= watermark),
      "doc_id", "shingles")
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** q71 — exact repeated-substring dedup (Lee et al. 2022,
    * "Deduplicating Training Data Makes Language Models Better": the
    * suffix-array pass that removes VERBATIM repeated spans, which
    * document-level dedup misses when only a quote or boilerplate
    * block repeats). Distributed approximation at k-token resolution:
    * every k-gram occurrence beyond the corpus-wide FIRST (global
    * (doc_id, pos) order — the all-but-first convention) marks a
    * removable span; per document the report is the interval UNION of
    * its removable spans (the q69 window-lead machinery), i.e. how
    * many tokens a span-removal pass would delete. k=13 matches the
    * decontamination gram convention; the paper's 50-token threshold
    * is the production k.
    *
    * Scale shape: ONE corpus-token-sized shuffle keyed by the gram
    * hash for the first-occurrence rank — inherent to exact substring
    * dedup (the suffix array it approximates is also corpus-scale) —
    * then only the repeated positions (df-heavy tail, a small
    * fraction) flow to the per-document window/aggregation, which
    * reuse the scan's doc_id distribution. */
  def substringDedup(spark: SparkSession, dir: String,
      k: Int = 13): DataFrame = {
    import spark.implicits._
    val wG = Window.partitionBy($"g").orderBy($"doc_id", $"pos")
    val wD = Window.partitionBy($"doc_id").orderBy($"pos")
    Tables.documentsDistributed(spark, dir)
      .select($"doc_id", Dedup.tokens($"text").as("toks"))
      .withColumn("n_tokens", size($"toks").cast("long"))
      .select($"doc_id", $"n_tokens", posexplode_outer(
        graft.expressions.TextHashes.kgramMd5($"toks", k))
        .as(Seq("pos", "g")))
      .withColumn("rn", row_number().over(wG))
      .filter($"rn" > 1)
      .withColumn("cov", least(lit(k.toLong),
        coalesce((lead($"pos", 1).over(wD) - $"pos").cast("long"),
          lit(k.toLong))))
      .groupBy($"doc_id")
      .agg(first($"n_tokens").as("n_tokens"),
        count(lit(1)).as("n_repeated_positions"),
        sum($"cov").as("s"))
      .select($"doc_id", $"n_tokens", $"n_repeated_positions",
        least($"s", $"n_tokens").as("removed_tokens"),
        round(least($"s", $"n_tokens").cast("double") / $"n_tokens", 4)
          .as("removed_frac"))
      .orderBy($"doc_id")
  }

  /** Exact n-gram Jaccard pairs ≥ 0.5, via prefix filtering (PPJoin):
    * identical output to the naive inverted-index join, but only each
    * document's rarest-shingle prefix is indexed (DedupSpec proves the
    * equality on a clustered fixture). */
  def ngramJaccard(spark: SparkSession, dir: String): DataFrame =
    Dedup.prefixFilterJaccard(withShingles(spark, dir), "doc_id", "shingles")
      .orderBy(col("doc_a"), col("doc_b"))

  /** Near-dup clusters: connected components over the verified LSH
    * pairs, with the minimum doc id as the canonical representative —
    * the keep-one-per-cluster step of corpus dedup. */
  def dedupClusters(spark: SparkSession, dir: String): DataFrame = {
    val pairs = Dedup.minhashLshPairs(withShingles(spark, dir),
      "doc_id", "shingles")
    Dedup.connectedComponents(pairs)
      .select(col("doc_id"), col("cluster_id"),
        when(col("doc_id") === col("cluster_id"), 1L).otherwise(0L)
          .as("is_canonical"))
      .orderBy(col("doc_id"))
  }

  /** q117 — near-dup cluster RETENTION policy: q35 labels the
    * clusters; this query makes the actual curation DECISION — which
    * member survives. Real pipelines do not keep the min-id member
    * (q35's canonical marker is a label, not a policy): RefinedWeb /
    * Gopher-style dedup keeps the best-quality or longest member, so
    * per cluster the survivor is argmax(keep flag, then n_tokens,
    * then min doc_id) with q29's exact keep criterion — a quality
    * clone of a boilerplate page must win over a longer junk member.
    * Singleton documents (no near-dup pair) are their own cluster and
    * always survive — the connectedComponents absence convention made
    * explicit with a coalesce.
    *
    * Scale shape: quality columns are per-row scan-riders; clusters
    * are q35's audited CC (label exchange only); the policy itself is
    * ONE window shuffle keyed by cluster_id — cluster sizes are
    * near-dup group sizes (small by construction at the 0.7
    * threshold), so no hot key, and singletons partition evenly by
    * their own id. */
  def clusterRetention(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val enStops = TextAnalysis.stopwords.toMap.apply("en")
    val docs = Tables.documentsDistributed(spark, dir)
      .withColumn("toks", TextAnalysis.tokensOf($"text"))
      .withColumn("n_tokens", size($"toks").cast("long"))
      .withColumn("stop_ratio",
        TextAnalysis.stopwordHits($"toks", enStops).cast("double") /
          $"n_tokens".cast("double"))
      .select($"doc_id", $"n_tokens",
        when($"n_tokens".between(20, 1000) && $"stop_ratio" >= 0.05, 1L)
          .otherwise(0L).as("keep"))
    val clusters = Dedup.connectedComponents(
      Dedup.minhashLshPairs(withShingles(spark, dir),
        "doc_id", "shingles"))
      .select(col("doc_id"), col("cluster_id"))
    retentionPolicy(docs, clusters).orderBy($"doc_id")
  }

  /** The policy window of [[clusterRetention]] on given frames —
    * `docs` (doc_id, n_tokens, keep), `clusters` (doc_id, cluster_id;
    * absent = singleton). DedupSpec drives it on constructed clusters
    * to pin that a keep=1 member beats a LONGER keep=0 member. */
  def retentionPolicy(docs: DataFrame, clusters: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    docs.join(clusters, Seq("doc_id"), "left")
      .withColumn("cluster_id", coalesce($"cluster_id", $"doc_id"))
      .withColumn("rn", row_number().over(Window.partitionBy($"cluster_id")
        .orderBy($"keep".desc, $"n_tokens".desc, $"doc_id".asc)))
      .select($"doc_id", $"cluster_id", $"n_tokens", $"keep",
        when($"rn" === 1, 1L).otherwise(0L).as("retained"))
  }

  /** q76 — normalization-aware exact dedup: the q16 hash-groupBy run
    * over [[Dedup.normalizeText]] instead of raw text, catching the
    * reprints exact dedup misses (case changes, re-punctuation,
    * injected digits/whitespace — the "near-exact" tier of Lee et al.
    * 2022 between q16 and MinHash). The word-soup corpus has no such
    * reprints, so the query first synthesizes them deterministically
    * (the q59 construction): doc_id ≡ 0 mod 10 gains a clone at
    * doc_id + 1e6 that is uppercased, indented, and suffixed with
    * punctuation and digits — all of which normalization erases.
    * Output is per-document: the canonical (min) doc_id of its
    * normalized-hash group, a kept flag, and the clone marker; every
    * clone must resolve to its original, never the reverse.
    *
    * Scale shape: identical to q16 — normalization is a per-row map,
    * then ONE shuffle keyed by the normalized hash (a window min, no
    * self-join). */
  def normalizedDedup(spark: SparkSession, dir: String): DataFrame = {
    val base = Tables.documents(spark, dir).select(col("doc_id"), col("text"))
    val clones = base.filter(col("doc_id") % 10 === 0)
      .select((col("doc_id") + 1000000L).as("doc_id"),
        concat(lit("  "), upper(col("text")), lit("  !!! 1999 ??")).as("text"))
    base.unionByName(clones)
      .withColumn("h", md5(Dedup.normalizeText(col("text"))))
      .withColumn("canonical_id",
        min(col("doc_id")).over(Window.partitionBy(col("h"))))
      .select(col("doc_id"), col("canonical_id"),
        (col("doc_id") === col("canonical_id")).cast("long").as("kept"),
        (col("doc_id") >= 1000000L).cast("long").as("is_clone"))
      .orderBy(col("doc_id"))
  }

  /** q80 — near-dup accounting by source pair: q21's verified LSH
    * pairs joined back to document metadata and rolled up per
    * unordered source pair — the dataset-card view that shows WHERE
    * duplication lives (intra-source boilerplate vs cross-source
    * syndication), which decides whether dedup should run per-source
    * or corpus-wide. The pair frame is the small side by construction
    * (verified near-dups); both metadata joins are hint-free, so AQE
    * broadcasts the pair side against the corpus-sized id→source map
    * at scale. max_jaccard aggregates the 4dp-rounded verify score —
    * order-independent. */
  def nearDupBySource(spark: SparkSession, dir: String): DataFrame = {
    val pairs = Dedup.minhashLshPairs(withShingles(spark, dir),
      "doc_id", "shingles")
    val src = Tables.documents(spark, dir).select(col("doc_id"), col("source"))
    pairs
      .join(src.toDF("doc_a", "src_a"), Seq("doc_a"))
      .join(src.toDF("doc_b", "src_b"), Seq("doc_b"))
      .groupBy(least(col("src_a"), col("src_b")).as("source_lo"),
        greatest(col("src_a"), col("src_b")).as("source_hi"))
      .agg(count(lit(1)).as("n_pairs"), max(col("jaccard")).as("max_jaccard"))
      .orderBy(col("source_lo"), col("source_hi"))
  }

  /** q82 — MinHash sketch calibration over the banded candidates:
    * estimated-vs-exact Jaccard per exact-J decile (see
    * [[Dedup.minhashCalibration]]). The dataset-card view that
    * validates the sketch parameters (16 hashes, 4 bands) BEFORE a
    * 100 TB run trusts q21's threshold. */
  def minhashCalibrationReport(spark: SparkSession, dir: String): DataFrame =
    Dedup.minhashCalibration(withShingles(spark, dir), "doc_id", "shingles")

  /** q89 — containment near-dup over the banded candidates (see
    * [[Dedup.containmentPairs]]): the asymmetric dedup report that
    * catches short-in-long duplication q21's symmetric Jaccard
    * threshold dilutes away. */
  def containmentDedup(spark: SparkSession, dir: String): DataFrame =
    Dedup.containmentPairs(withShingles(spark, dir), "doc_id", "shingles")
      .orderBy(col("doc_a"), col("doc_b"))

  /** q92 — edit-distance verified near-dup: the character-level
    * ground-truth verify over q21's banded-LSH candidates. Shingle
    * Jaccard is insensitive to WITHIN-token edits (typo clones share
    * few shingles but most characters) and blind to token order
    * swaps' true cost; normalized Levenshtein similarity
    * 1 − lev/max(|a|,|b|) is the standard fuzzy-dedup verdict when
    * the corpus is OCR/typo-noisy. Emitting both scores per pair is
    * the calibration view (the q82 pattern): where jaccard and
    * lev_ratio disagree is exactly where a Jaccard-threshold dedup
    * mislabels.
    *
    * Scale shape: candidate generation is q21's (band collisions,
    * pair-dedup before any verify — threshold 0.0 keeps every
    * candidate); the texts join onto the SMALL pair frame (hint-free;
    * AQE broadcasts the pair side against the corpus id→text map).
    * Levenshtein is O(|a|·|b|) per pair — affordable precisely
    * because it runs on banded candidates, never all pairs (the
    * PPJoin verifier-role argument, SURVEY §8b). */
  /** q92's near-dup verdict threshold — interpolated into the oracle
    * SQL (the Pii convention) so the engines cannot drift. 0.98 sits
    * inside the observed candidate-ratio spread at both test SFs
    * (0.93–0.99), so the verdict actually separates candidates
    * instead of rubber-stamping them. */
  val editDistanceThreshold: Double = 0.98

  def editDistanceDedup(spark: SparkSession, dir: String,
      threshold: Double = editDistanceThreshold): DataFrame = {
    val pairs = Dedup.minhashLshPairs(withShingles(spark, dir),
      "doc_id", "shingles", threshold = 0.0)
    val txt = Tables.documents(spark, dir).select(col("doc_id"), col("text"))
    pairs
      .join(txt.toDF("doc_a", "text_a"), Seq("doc_a"))
      .join(txt.toDF("doc_b", "text_b"), Seq("doc_b"))
      .withColumn("lev",
        levenshtein(col("text_a"), col("text_b")).cast("long"))
      .withColumn("lev_ratio",
        round(lit(1.0) - col("lev").cast("double") /
          greatest(length(col("text_a")), length(col("text_b"))), 4))
      .select(col("doc_a"), col("doc_b"), col("jaccard"), col("lev"),
        col("lev_ratio"),
        (col("lev_ratio") >= threshold).cast("long").as("near_dup"))
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** Per-document 32-bit SimHash (near-dup docs differ in few bits). */
  def simhash(spark: SparkSession, dir: String): DataFrame =
    Tables.documentsDistributed(spark, dir)
      .select(col("doc_id"),
        Dedup.simhash32(Dedup.tokens(col("text"))).as("simhash"))
      .orderBy(col("doc_id"))

  /** SimHash near-dup pairs at Hamming distance <= 2, via Hamming-band
    * LSH (exact for the threshold — see Dedup.simhashNearDupPairs).
    * The oracle runs the all-pairs Hamming scan; identical output. */
  def simhashNearDup(spark: SparkSession, dir: String): DataFrame = {
    val fp = Tables.documentsDistributed(spark, dir)
      .select(col("doc_id"),
        Dedup.simhash32(Dedup.tokens(col("text"))).as("simhash"))
    Dedup.simhashNearDupPairs(fp, "doc_id", "simhash")
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** 64-bit SimHash near-dup pairs at Hamming distance <= 3 with
    * 16-bit Hamming-band LSH — the corpus-scale form of q44 (65k
    * buckets per band vs 256; see Dedup.simhashNearDupPairs64). The
    * oracle re-derives the 64-bit fingerprint from two uint32 md5
    * halves (no 64-bit float math) and runs the all-pairs scan. */
  def simhashNearDup64(spark: SparkSession, dir: String): DataFrame = {
    val fp = Tables.documentsDistributed(spark, dir)
      .select(col("doc_id"),
        Dedup.simhash64(Dedup.tokens(col("text"))).as("simhash"))
    Dedup.simhashNearDupPairs64(fp, "doc_id", "simhash")
      .orderBy(col("doc_a"), col("doc_b"))
  }

  // Shared oracle CTE fragments (DuckDB SQL mirroring Dedup's math).
  // private[queries] so composite oracles (q53's curation funnel)
  // compose the EXACT MinHash scheme instead of copying it — a scheme
  // change (hash count, band width, salt format) then reaches every
  // oracle from one place.
  private[queries] val toksCte =
    """toks AS (SELECT doc_id,
      |  list_filter(string_split_regex(lower(text), '\s+'),
      |              t -> length(t) > 0) AS tokens
      | FROM documents)""".stripMargin
  /** Shingle CTE over any source CTE exposing (doc_id, tokens). */
  private[queries] def shCte(src: String = "toks") =
    s"""sh AS (SELECT doc_id, CASE WHEN len(tokens) >= 3
       |  THEN list_distinct(list_transform(
       |         generate_series(1, len(tokens) - 2),
       |         i -> array_to_string(tokens[i:i+2], ' ')))
       |  ELSE [array_to_string(tokens[1:3], ' ')] END AS shingles
       | FROM $src)""".stripMargin
  private[queries] val sigCte =
    """sig AS (SELECT doc_id, shingles,
      |  list_transform(generate_series(0, 15),
      |    s -> list_min(list_transform(shingles, g -> md5(s || '|' || g))))
      |    AS sig
      | FROM sh)""".stripMargin
  private[queries] val bandsCte =
    """bands AS (SELECT doc_id, shingles, b,
      |  md5(array_to_string(sig[b*4+1:b*4+4], ',')) AS band_hash
      | FROM sig, unnest(generate_series(0, 3)) AS t(b))""".stripMargin
  /** Banded-collision candidates with exact Jaccard (q21/q35/q53's
    * shared pair source; consumers filter `j >= threshold`). */
  private[queries] val candPairsCte =
    """cand AS (
      |  SELECT DISTINCT a.doc_id AS doc_a, b2.doc_id AS doc_b,
      |    len(list_intersect(a.shingles, b2.shingles))::DOUBLE
      |      / len(list_distinct(list_concat(a.shingles, b2.shingles))) AS j
      |  FROM bands a JOIN bands b2 USING (b, band_hash)
      |  WHERE a.doc_id < b2.doc_id)""".stripMargin
  private val simhashCte =
    """h AS (SELECT doc_id,
      |  list_transform(tokens,
      |    t -> CAST(('0x' || substr(md5(t), 1, 8)) AS BIGINT)) AS hashes
      | FROM toks),
      |fp AS (SELECT doc_id,
      |  CAST(list_sum(list_transform(generate_series(0, 31),
      |   i -> CASE WHEN list_sum(list_transform(hashes,
      |          h2 -> CASE WHEN CAST(floor(h2 / pow(2, i)) AS BIGINT) % 2 = 1
      |                THEN 1 ELSE -1 END)) > 0
      |        THEN CAST(floor(pow(2, i)) AS BIGINT) ELSE 0 END))
      |   AS BIGINT) AS simhash
      | FROM h)""".stripMargin

  // 64-bit SimHash oracle: the signed two's-complement value is
  // assembled WITHOUT 64-bit float math — bits 0..31 from the low
  // uint32 half (md5 hex chars 9..16), bits 32..62 from the high half
  // (chars 1..8), and bit 63 as an explicit Long.MinValue addend (2^63
  // itself overflows BIGINT; u − 2^64 ≡ low bits + (−2^63 when bit 63
  // set)). Bit tests use DuckDB's native >>/& on BIGINT halves.
  private val simhash64Cte =
    """h64 AS (SELECT doc_id,
      |  list_transform(tokens,
      |    t -> CAST(('0x' || substr(md5(t), 1, 8)) AS BIGINT)) AS his,
      |  list_transform(tokens,
      |    t -> CAST(('0x' || substr(md5(t), 9, 8)) AS BIGINT)) AS los
      | FROM toks),
      |fp64 AS (SELECT doc_id, CAST(
      |   list_sum(list_transform(generate_series(0, 31), i ->
      |     CASE WHEN list_sum(list_transform(los,
      |            h2 -> CASE WHEN (h2 >> i) & 1 = 1 THEN 1 ELSE -1 END)) > 0
      |          THEN CAST(pow(2, i) AS BIGINT) ELSE 0 END))
      | + list_sum(list_transform(generate_series(32, 62), i ->
      |     CASE WHEN list_sum(list_transform(his,
      |            h2 -> CASE WHEN (h2 >> (i - 32)) & 1 = 1 THEN 1 ELSE -1 END)) > 0
      |          THEN CAST(pow(2, i) AS BIGINT) ELSE 0 END))
      | + CASE WHEN list_sum(list_transform(his,
      |          h2 -> CASE WHEN (h2 >> 31) & 1 = 1 THEN 1 ELSE -1 END)) > 0
      |        THEN -9223372036854775807 - 1 ELSE 0 END
      | AS BIGINT) AS simhash64
      | FROM h64)""".stripMargin

  val oracles: Map[String, String] = Map(
    // The normalization regexes interpolate from Dedup's constants
    // (the Pii convention) — engines cannot drift.
    "q76_normalized_dedup" ->
      s"""WITH all_docs AS (
         |  SELECT doc_id, text FROM documents
         |  UNION ALL
         |  SELECT doc_id + 1000000 AS doc_id,
         |    '  ' || upper(text) || '  !!! 1999 ??' AS text
         |  FROM documents WHERE doc_id % 10 = 0),
         |h AS (SELECT doc_id,
         |    md5(trim(regexp_replace(regexp_replace(lower(text),
         |      '${Dedup.normStripPattern}', '', 'g'),
         |      '${Dedup.normSpacePattern}', ' ', 'g'))) AS h
         |  FROM all_docs),
         |c AS (SELECT doc_id,
         |    MIN(doc_id) OVER (PARTITION BY h) AS canonical_id
         |  FROM h)
         |SELECT doc_id, canonical_id,
         |  CAST(CASE WHEN doc_id = canonical_id THEN 1 ELSE 0 END AS BIGINT)
         |    AS kept,
         |  CAST(CASE WHEN doc_id >= 1000000 THEN 1 ELSE 0 END AS BIGINT)
         |    AS is_clone
         |FROM c ORDER BY doc_id""".stripMargin,
    "q20_minhash_signature" ->
      s"""WITH $toksCte, ${shCte()}, $sigCte
         |SELECT doc_id, md5(array_to_string(sig, ',')) AS sig_digest,
         | md5(array_to_string(sig[1:4], ',')) AS band0,
         | md5(array_to_string(sig[5:8], ',')) AS band1,
         | md5(array_to_string(sig[9:12], ',')) AS band2,
         | md5(array_to_string(sig[13:16], ',')) AS band3
         |FROM sig ORDER BY doc_id""".stripMargin,
    // exact inverted-index form; the df ≤ 1000 filter mirrors the
    // operator's default hot-shingle guard (Dedup.containmentPairs
    // dfCap) so the guard itself sits inside the parity check
    "q89_containment_dedup" ->
      s"""WITH $toksCte, ${shCte()},
         |ex0 AS (SELECT doc_id, unnest(shingles) AS shingle FROM sh),
         |cold AS (SELECT shingle FROM ex0
         |  GROUP BY shingle HAVING COUNT(*) <= 1000),
         |ex AS (SELECT ex0.doc_id, ex0.shingle
         |  FROM ex0 JOIN cold USING (shingle)),
         |p AS (SELECT a.doc_id AS doc_a, b2.doc_id AS doc_b,
         |    COUNT(*)::DOUBLE AS i
         |  FROM ex a JOIN ex b2 USING (shingle)
         |  WHERE a.doc_id < b2.doc_id GROUP BY 1, 2),
         |sz AS (SELECT doc_id, len(shingles)::DOUBLE AS n FROM sh),
         |x AS (SELECT p.doc_a, p.doc_b, p.i, sa.n AS la, sb.n AS lb
         |  FROM p JOIN sz sa ON p.doc_a = sa.doc_id
         |    JOIN sz sb ON p.doc_b = sb.doc_id)
         |SELECT doc_a, doc_b, round(i / (la + lb - i), 4) AS jaccard,
         |  round(i / la, 4) AS containment_a,
         |  round(i / lb, 4) AS containment_b
         |FROM x WHERE greatest(i / la, i / lb) >= 0.5
         |ORDER BY doc_a, doc_b""".stripMargin,
    "q82_minhash_calibration" ->
      s"""WITH $toksCte, ${shCte()}, $sigCte, $bandsCte,
         |cp AS (SELECT DISTINCT a.doc_id AS doc_a, b2.doc_id AS doc_b
         |  FROM bands a JOIN bands b2 USING (b, band_hash)
         |  WHERE a.doc_id < b2.doc_id),
         |x AS (SELECT cp.doc_a, cp.doc_b,
         |    len(list_filter(generate_series(1, 16),
         |      i -> sa.sig[i] = sb.sig[i]))::DOUBLE / 16 AS est,
         |    len(list_intersect(sa.shingles, sb.shingles))::DOUBLE
         |      / len(list_distinct(list_concat(sa.shingles, sb.shingles)))
         |      AS j
         |  FROM cp JOIN sig sa ON cp.doc_a = sa.doc_id
         |    JOIN sig sb ON cp.doc_b = sb.doc_id),
         |f AS (SELECT LEAST(CAST(floor(j * 10) AS BIGINT), 9) AS bucket,
         |    CAST(round(est * 16777216.0) AS BIGINT) AS est_fp,
         |    CAST(round(abs(est - j) * 16777216.0) AS BIGINT) AS err_fp
         |  FROM x)
         |SELECT bucket, COUNT(*) AS n_pairs,
         |  round((CAST(SUM(est_fp) AS BIGINT)::DOUBLE / 16777216.0)
         |    / COUNT(*), 4) AS mean_est,
         |  round((CAST(SUM(err_fp) AS BIGINT)::DOUBLE / 16777216.0)
         |    / COUNT(*), 4) AS mean_abs_err
         |FROM f GROUP BY bucket ORDER BY bucket""".stripMargin,
    "q80_near_dup_by_source" ->
      s"""WITH $toksCte, ${shCte()}, $sigCte, $bandsCte, $candPairsCte,
         |v AS (SELECT doc_a, doc_b, round(j, 4) AS jaccard FROM cand
         |      WHERE j >= 0.7),
         |ds AS (SELECT doc_id, source FROM documents)
         |SELECT least(a.source, b.source) AS source_lo,
         |  greatest(a.source, b.source) AS source_hi,
         |  COUNT(*) AS n_pairs, MAX(v.jaccard) AS max_jaccard
         |FROM v JOIN ds a ON v.doc_a = a.doc_id
         |  JOIN ds b ON v.doc_b = b.doc_id
         |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q21_minhash_lsh_dedup" ->
      s"""WITH $toksCte, ${shCte()}, $sigCte, $bandsCte, $candPairsCte
         |SELECT doc_a, doc_b, round(j, 4) AS jaccard FROM cand
         |WHERE j >= 0.7 ORDER BY doc_a, doc_b""".stripMargin,
    // q92 keeps EVERY banded candidate (threshold 0.0) and verifies
    // with DuckDB's native levenshtein — same unit (codepoints) as
    // Spark's builtin.
    "q92_edit_distance_dedup" ->
      s"""WITH $toksCte, ${shCte()}, $sigCte, $bandsCte, $candPairsCte,
         |v AS (SELECT doc_a, doc_b, round(j, 4) AS jaccard FROM cand),
         |t AS (SELECT doc_id, text FROM documents),
         |x AS (SELECT v.doc_a, v.doc_b, v.jaccard,
         |    CAST(levenshtein(a.text, b.text) AS BIGINT) AS lev,
         |    round(1.0 - levenshtein(a.text, b.text)::DOUBLE /
         |      greatest(length(a.text), length(b.text)), 4) AS lev_ratio
         |  FROM v JOIN t a ON v.doc_a = a.doc_id
         |    JOIN t b ON v.doc_b = b.doc_id)
         |SELECT doc_a, doc_b, jaccard, lev, lev_ratio,
         |  CAST(CASE WHEN lev_ratio >= $editDistanceThreshold
         |       THEN 1 ELSE 0 END AS BIGINT) AS near_dup
         |FROM x ORDER BY doc_a, doc_b""".stripMargin,
    // the incremental delta IS the batch pair set restricted to
    // new-batch doc_b (the operator's pinned equivalence), so the
    // oracle is q21's with the watermark filter
    "q68_incremental_near_dup" ->
      s"""WITH $toksCte, ${shCte()}, $sigCte, $bandsCte, $candPairsCte
         |SELECT doc_a, doc_b, round(j, 4) AS jaccard FROM cand
         |WHERE j >= 0.7 AND doc_b >= 250
         |ORDER BY doc_a, doc_b""".stripMargin,
    "q71_substring_dedup" ->
      s"""WITH $toksCte,
         |kgp AS (SELECT doc_id, CAST(len(tokens) AS BIGINT) AS n_tokens,
         |  CASE WHEN len(tokens) >= 13
         |    THEN list_transform(generate_series(1, len(tokens) - 12),
         |           i -> md5(array_to_string(tokens[i:i+12], ' ')))
         |    ELSE [md5(array_to_string(tokens[1:13], ' '))] END AS kg
         | FROM toks),
         |p AS (SELECT doc_id, n_tokens, i AS pos, kg[i] AS g
         |  FROM kgp, unnest(generate_series(1, len(kg))) t(i)),
         |r AS (SELECT doc_id, n_tokens, pos FROM
         |    (SELECT *, row_number() OVER (PARTITION BY g
         |       ORDER BY doc_id, pos) AS rn FROM p)
         |  WHERE rn > 1),
         |c AS (SELECT doc_id, n_tokens, pos,
         |  LEAST(13, COALESCE(LEAD(pos) OVER
         |    (PARTITION BY doc_id ORDER BY pos) - pos, 13)) AS cov
         | FROM r)
         |SELECT doc_id, ANY_VALUE(n_tokens) AS n_tokens,
         |  COUNT(*) AS n_repeated_positions,
         |  CAST(LEAST(SUM(cov), ANY_VALUE(n_tokens)) AS BIGINT)
         |    AS removed_tokens,
         |  round(LEAST(SUM(cov), ANY_VALUE(n_tokens))::DOUBLE
         |    / ANY_VALUE(n_tokens), 4) AS removed_frac
         |FROM c GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "q22_ngram_jaccard" ->
      s"""WITH $toksCte, ${shCte()},
         |ex AS (SELECT doc_id, len(shingles) AS n, unnest(shingles) AS shingle
         |       FROM sh),
         |pairs AS (
         |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |    count(*) AS inter,
         |    any_value(a.n) AS n_a, any_value(b.n) AS n_b
         |  FROM ex a JOIN ex b ON a.shingle = b.shingle
         |    AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2)
         |SELECT doc_a, doc_b,
         |  round(inter::DOUBLE / (n_a + n_b - inter), 4) AS jaccard
         |FROM pairs WHERE inter::DOUBLE / (n_a + n_b - inter) >= 0.5
         |ORDER BY doc_a, doc_b""".stripMargin,
    "q35_dedup_clusters" ->
      s"""WITH RECURSIVE $toksCte, ${shCte()}, $sigCte, $bandsCte,
         |$candPairsCte,
         |pairs AS (SELECT doc_a, doc_b FROM cand WHERE j >= 0.7),
         |edges AS (SELECT doc_a AS u, doc_b AS v FROM pairs
         |          UNION ALL SELECT doc_b, doc_a FROM pairs),
         |reach(u, v) AS (
         |  SELECT u, v FROM edges
         |  UNION
         |  SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u
         |  WHERE e.v <> r.u),
         |labels AS (
         |  SELECT u AS doc_id, least(u, min(v)) AS cluster_id
         |  FROM reach GROUP BY u)
         |SELECT doc_id, cluster_id,
         |  CAST(CASE WHEN doc_id = cluster_id THEN 1 ELSE 0 END AS BIGINT)
         |    AS is_canonical
         |FROM labels ORDER BY doc_id""".stripMargin,
    // q117 composes q35's recursive-CC cluster CTEs with q29's
    // quality columns; the policy window mirrors the Spark orderBy
    "q117_cluster_retention" ->
      s"""WITH RECURSIVE $toksCte, ${shCte()}, $sigCte, $bandsCte,
         |$candPairsCte,
         |pairs AS (SELECT doc_a, doc_b FROM cand WHERE j >= 0.7),
         |edges AS (SELECT doc_a AS u, doc_b AS v FROM pairs
         |          UNION ALL SELECT doc_b, doc_a FROM pairs),
         |reach(u, v) AS (
         |  SELECT u, v FROM edges
         |  UNION
         |  SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u
         |  WHERE e.v <> r.u),
         |labels AS (
         |  SELECT u AS doc_id, least(u, min(v)) AS cluster_id
         |  FROM reach GROUP BY u),
         |q AS (SELECT doc_id,
         |  CAST(len(tokens) AS BIGINT) AS n_tokens,
         |  len(list_filter(tokens,
         |    t -> t IN ('the','a','of','and','is','not','to','in')))::DOUBLE
         |    / len(tokens) AS stop_ratio
         |  FROM toks),
         |lab AS (SELECT q.doc_id, q.n_tokens,
         |  CAST(CASE WHEN q.n_tokens BETWEEN 20 AND 1000
         |       AND q.stop_ratio >= 0.05 THEN 1 ELSE 0 END AS BIGINT)
         |    AS keep,
         |  COALESCE(l.cluster_id, q.doc_id) AS cluster_id
         |  FROM q LEFT JOIN labels l ON q.doc_id = l.doc_id),
         |r AS (SELECT *, row_number() OVER (PARTITION BY cluster_id
         |    ORDER BY keep DESC, n_tokens DESC, doc_id ASC) AS rn
         |  FROM lab)
         |SELECT doc_id, cluster_id, n_tokens, keep,
         |  CAST(CASE WHEN rn = 1 THEN 1 ELSE 0 END AS BIGINT) AS retained
         |FROM r ORDER BY doc_id""".stripMargin,
    "q23_simhash" ->
      s"""WITH $toksCte, $simhashCte
         |SELECT doc_id, simhash FROM fp ORDER BY doc_id""".stripMargin,
    "q44_simhash_near_dup" ->
      s"""WITH $toksCte, $simhashCte
         |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |  CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
         |FROM fp a JOIN fp b ON a.doc_id < b.doc_id
         |WHERE bit_count(xor(a.simhash, b.simhash)) <= 2
         |ORDER BY doc_a, doc_b""".stripMargin,
    "q50_simhash64_near_dup" ->
      s"""WITH $toksCte, $simhash64Cte
         |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |  CAST(bit_count(xor(a.simhash64, b.simhash64)) AS BIGINT) AS hamming
         |FROM fp64 a JOIN fp64 b ON a.doc_id < b.doc_id
         |WHERE bit_count(xor(a.simhash64, b.simhash64)) <= 3
         |ORDER BY doc_a, doc_b""".stripMargin,
  )
}
