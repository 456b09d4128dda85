package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.io.Tables
import graft.ops.{Decontaminate, Dedup, IncrementalMerge, LangModel, Multimodal, Pii, Sampling, TextAnalysis}

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

  /** q63 — the END-TO-END curation sweep: every hygiene pass of the
    * engine composed in deployment order over one corpus, reporting
    * per-stage (n_docs, total_tokens) — the artifact a training-data
    * run actually ships with its dataset card:
    *
    *   0_raw → 1_quality (length/stopword/lang, q53's rule)
    *         → 2_repetition (Gopher gram rules, q58)
    *         → 3_pii (redaction TRANSFORM, q59 — counts survive, text
    *           and token totals are re-derived from the redacted text,
    *           which all later stages consume)
    *         → 4_decontaminate (13-gram eval overlap, q57; the eval
    *           slice itself leaves the corpus here too)
    *         → 5_exact_dedup (md5 keep-smallest, q16)
    *         → 6_near_dedup (MinHash LSH ≥ 0.7, q21/q53)
    *         → 7_semantic_dedup (SemDeDup over the survivors'
    *           embeddings, q60 — subset k-means, rank-seeded)
    *         → 8_lm_filter (self-trained bigram LM, drop
    *           avg_nll > `nllThreshold`, q61)
    *         → 9_split_{train,val,test} (stable md5 split, q54).
    *
    * Composing forces the stage interfaces to agree: each stage
    * consumes exactly the previous stage's survivor frame (and the
    * PII stage's redacted text), and the oracle composes the SAME
    * shared CTE fragments the individual queries gate on
    * (DedupQueries.sh/sig/bands/cand, CurationQueries.rep/gram,
    * SimilarityQueries.semDedupCtes), so a scheme change anywhere
    * breaks parity here first.
    *
    * Scale shape: stages 0–3 ride one scan (per-row kernels +
    * conditional aggregation); decontamination broadcasts only eval
    * grams; the dedup stages are the bucketed candidate generators of
    * their standalone queries; the LM scoring join is hint-free
    * (broadcast below threshold, shuffle above). Stage frames that
    * feed multiple consumers (pair-join sides + stats + next stage)
    * are localCheckpoint'd, each reachable from the returned plan, so
    * the caller's Checkpoints.consume frees all of them. */
  def curationSweep(spark: SparkSession, dir: String,
      nllThreshold: Double = 3.43, k: Int = 13): DataFrame =
    curationSweepFrames(spark, dir, nllThreshold, k)._1

  /** The sweep's two artifacts: (stats, corpus) — the per-stage
    * accounting rows AND the final curated corpus
    * (doc_id, rtext, rn_tokens, split), which is what a deployment
    * actually writes out (tools/RunCuration persists it partitioned
    * by split). Both share one stage chain; consuming either (or
    * both) through Checkpoints.consume frees the checkpointed stage
    * frames, every one of which is reachable from the STATS plan. */
  def curationSweepFrames(spark: SparkSession, dir: String,
      nllThreshold: Double = 3.43, k: Int = 13): (DataFrame, DataFrame) = {
    import spark.implicits._
    val enStops = TextAnalysis.stopwords.toMap.apply("en")
    val rep = graft.expressions.TextHashes.gramRepetitionStats _
    // Stages 0–2: flags on one scan (q53's conditional-agg mechanism).
    val base = Tables.documentsDistributed(spark, dir)
      .withColumn("toks", TextAnalysis.tokensOf($"text"))
      .withColumn("n_tokens", size($"toks").cast("long"))
      .withColumn("q_ok",
        $"n_tokens".between(20, 1000) &&
          round(TextAnalysis.stopwordHits($"toks", enStops).cast("double") /
            $"n_tokens".cast("double"), 4) >= 0.05 && $"lang" === "en")
      .withColumn("bi", rep($"toks", 2))
      .withColumn("tri", rep($"toks", 3))
      .withColumn("rep_ok", $"q_ok" &&
        !(when($"bi".getItem(0) === 0L, lit(0d))
          .otherwise(round($"bi".getItem(1).cast("double") /
            $"bi".getItem(0), 4)) > 0.1) &&
        !(when($"tri".getItem(0) === 0L, lit(0d))
          .otherwise(round($"tri".getItem(2).cast("double") /
            $"tri".getItem(0), 4)) > 0.1))
      .localCheckpoint() // feeds stats 0–2, the eval-gram side, and s3
    // Stage 3: redact, re-tokenize — later stages see REDACTED text.
    val s3 = base.filter($"rep_ok")
      .select($"doc_id", Pii.redact($"text").as("rtext"))
      .withColumn("rtoks", TextAnalysis.tokensOf($"rtext"))
      .withColumn("rn_tokens", size($"rtoks").cast("long"))
      .localCheckpoint() // feeds stat 3 + decontamination sides
    // Stage 4: eval slice out + contaminated out (q57 mechanism; eval
    // grams come from the RAW corpus — the benchmark is an external
    // artifact, not a pipeline product).
    val bench = base.filter($"doc_id" % 7 === 0)
      .select($"doc_id", Decontaminate.gramHashes($"toks", k).as("grams"))
    val corpus4 = s3.filter($"doc_id" % 7 =!= 0)
    val report = Decontaminate.overlapReport(
      corpus4.select($"doc_id",
        Decontaminate.gramHashes($"rtoks", k).as("grams")),
      bench, "doc_id", "grams")
    val s4 = Decontaminate.removeContaminated(corpus4, report, "doc_id")
    // Stage 5: exact dedup on the redacted text, keep smallest id.
    val s5 = s4.withColumn("__rn", row_number().over(
        Window.partitionBy(md5($"rtext")).orderBy($"doc_id")))
      .filter($"__rn" === 1).drop("__rn")
      .localCheckpoint() // feeds stat 5 + both LSH pair sides + s6
    // Stage 6: near-dup (the q21/q53 MinHash LSH, drop doc_b).
    val pairs = Dedup.minhashLshPairs(
      s5.select($"doc_id", Dedup.shingles($"rtoks").as("shingles")),
      "doc_id", "shingles")
    val s6 = s5.join(pairs.select($"doc_b".as("doc_id")).distinct(),
        Seq("doc_id"), "left_anti")
      .localCheckpoint() // feeds stat 6 + the embedding subset + s7
    // Stage 7: SemDeDup over the SURVIVORS' embeddings (subset
    // k-means — rank seeding makes the sparse survivor id space
    // cluster correctly).
    val eSub = Tables.embeddingsDistributed(spark, dir)
      .select($"vec_id", $"embedding")
      .join(s6.select($"doc_id".as("vec_id")), Seq("vec_id"))
    val semDrops = SimilarityQueries.semanticDedupFrame(eSub)
      .filter($"kept" === 0L).select($"vec_id".as("doc_id"))
    val s7 = s6.join(semDrops, Seq("doc_id"), "left_anti")
      .localCheckpoint() // feeds stat 7 + LM build/probe + s8
    // s7's checkpoint truncated semDrops — and with it SemDeDup's
    // internal checkpointed assignment frame — out of every surviving
    // plan, so the caller's consume can never reach those blocks: free
    // them NOW, deterministically, instead of leaving them to the
    // ContextCleaner's GC timing (the semanticDedup-frees-cents
    // ownership rule at a second truncation boundary;
    // RunCurationSpec's leak check pins it).
    graft.ops.Checkpoints.unpersist(semDrops)
    // Stage 8: self-trained bigram LM (q61's shape over survivors).
    val bg = s7.select($"doc_id", explode_outer(
      graft.expressions.TextHashes.tokenGrams($"rtoks", 2)).as("g"))
    val scored = LangModel.score(bg, LangModel.train(bg))
    val s8 = s7.join(
        scored.filter($"avg_nll" > nllThreshold).select($"doc_id"),
        Seq("doc_id"), "left_anti")
      .localCheckpoint() // feeds stat 8 + the split stats
    // Stage 9: stable split of the final corpus.
    val s9 = s8.withColumn("split", Sampling.assignSplit($"doc_id",
      "split", Seq("train" -> 90, "val" -> 95), "test"))
    def stat(name: String, df: DataFrame, tok: String) =
      df.agg(count(lit(1)).as("n_docs"),
        coalesce(sum(col(tok)), lit(0L)).as("total_tokens"))
        .select(lit(name).as("stage"), $"n_docs", $"total_tokens")
    val stats = base.agg(
        count(lit(1)).as("n0"),
        coalesce(sum(when($"q_ok", 1L).otherwise(0L)), lit(0L)).as("n1"),
        coalesce(sum(when($"rep_ok", 1L).otherwise(0L)), lit(0L)).as("n2"),
        coalesce(sum($"n_tokens"), lit(0L)).as("t0"),
        coalesce(sum(when($"q_ok", $"n_tokens").otherwise(0L)), lit(0L))
          .as("t1"),
        coalesce(sum(when($"rep_ok", $"n_tokens").otherwise(0L)), lit(0L))
          .as("t2"))
      .selectExpr("stack(3, '0_raw', n0, t0, '1_quality', n1, t1, " +
        "'2_repetition', n2, t2) AS (stage, n_docs, total_tokens)")
      .unionByName(stat("3_pii", s3, "rn_tokens"))
      .unionByName(stat("4_decontaminate", s4, "rn_tokens"))
      .unionByName(stat("5_exact_dedup", s5, "rn_tokens"))
      .unionByName(stat("6_near_dedup", s6, "rn_tokens"))
      .unionByName(stat("7_semantic_dedup", s7, "rn_tokens"))
      .unionByName(stat("8_lm_filter", s8, "rn_tokens"))
      .unionByName(s9.groupBy($"split")
        .agg(count(lit(1)).as("n_docs"),
          coalesce(sum($"rn_tokens"), lit(0L)).as("total_tokens"))
        .select(concat(lit("9_split_"), $"split").as("stage"),
          $"n_docs", $"total_tokens"))
      .orderBy($"stage")
    (stats, s9.select($"doc_id", $"rtext", $"rn_tokens", $"split"))
  }

  /** q111 — sliding-window document chunking (the RAG/embedding
    * ingestion staple: split every document into overlapping
    * fixed-size token windows before embedding — window 50, stride
    * 40 → 10-token overlap, the shape LangChain/LlamaIndex call
    * "chunk_size/chunk_overlap"). Emits per chunk: ordinal, global
    * token start, length (the tail chunk may be shorter), and the
    * md5 of the chunk text (the row stays fixed-width; a deployment
    * materializes the text or feeds it straight to the embedder).
    * Documents shorter than one window yield exactly one chunk;
    * empty documents one empty chunk (never zero rows — a chunker
    * that silently drops documents breaks id joins downstream).
    *
    * Scale shape: pure scan-rider — per-row tokenize, a per-row
    * start-offset sequence (|starts| = ⌈n/stride⌉, data-bounded),
    * one explode; no shuffle at all above the scan. The md5 keeps
    * the exploded rows ~50 B wide regardless of window size. */
  def chunkDocuments(spark: SparkSession, dir: String,
      window: Int = 50, stride: Int = 40): DataFrame = {
    import spark.implicits._
    chunkFrame(Tables.documentsDistributed(spark, dir),
      "doc_id", "text", window, stride)
      .orderBy($"doc_id", $"chunk_id")
  }

  /** The chunker as a frame transform — stateless per-row work, so
    * it composes onto a STREAMING frame unchanged
    * ([[graft.streaming.Streams.chunkStream]] is exactly this on a
    * readStream source; StreamsSpec pins batch/stream equality). */
  def chunkFrame(docs: DataFrame, idCol: String, textCol: String,
      window: Int = 50, stride: Int = 40): DataFrame = {
    import docs.sparkSession.implicits._
    docs
      .select(col(idCol).as("doc_id"),
        TextAnalysis.tokensOf(col(textCol)).as("toks"))
      .withColumn("n_tokens", size($"toks").cast("long"))
      .select($"doc_id", $"toks", $"n_tokens",
        posexplode_outer(sequence(lit(0L),
          greatest($"n_tokens" - 1L, lit(0L)), lit(stride.toLong)))
          .as(Seq("chunk_id", "start_tok")))
      .withColumn("chunk_len", least(lit(window.toLong),
        $"n_tokens" - $"start_tok"))
      .select($"doc_id", $"chunk_id".cast("long").as("chunk_id"),
        $"start_tok", $"chunk_len",
        md5(array_join(slice($"toks", $"start_tok" + 1,
          $"chunk_len"), " ")).as("chunk_md5"))
  }

  /** Resumable twin of [[curationSweepFrames]] — the CLI face
    * (tools/RunCuration): every stage boundary PERSISTS its survivor
    * frame to `<stageDir>/<stage>/` (the reference's per-stage
    * artifact discipline, runner.py:27-77: each pass writes its
    * output before the next starts), and a re-run SKIPS any stage
    * whose artifact carries a `_SUCCESS` marker — a sweep killed
    * after stage k resumes from k+1 against the persisted frames
    * instead of recomputing the whole chain. A partial artifact (dir
    * present, no marker — the mid-write crash) is rebuilt.
    *
    * Returns (stats, corpus, builtStages): `builtStages` lists the
    * stages COMPUTED this run, in order — the recompute-accounting
    * observable RunCurationSpec pins (a resumed run must list only
    * the stages after the kill point). Stats/corpus values are
    * identical to the one-shot sweep (spec-pinned): the stage bodies
    * are the same operator compositions; only the materialization
    * strategy differs (parquet round-trip instead of
    * localCheckpoint, which also replaces the in-memory
    * multi-consumer reuse — each stage is read back from its
    * artifact). Per-stage internal checkpoints (SemDeDup's
    * assignment, the LM model) are freed as soon as the stage's
    * artifact is written. */
  def curationSweepResumable(spark: SparkSession, dir: String,
      stageDir: String, nllThreshold: Double = 3.43, k: Int = 13)
      : (DataFrame, DataFrame, Seq[String]) = {
    import spark.implicits._
    val builtStages = scala.collection.mutable.ArrayBuffer[String]()
    def stage(name: String)(build: => DataFrame): DataFrame = {
      val path = s"$stageDir/$name"
      if (!graft.io.Layout.pathExists(spark, s"$path/_SUCCESS")) {
        val df = build
        df.write.mode("overwrite").parquet(path)
        // free any checkpoint the stage body created (SemDeDup
        // assignment, LM model) — the artifact is on disk now
        graft.ops.Checkpoints.unpersist(df)
        builtStages += name
      }
      spark.read.parquet(path)
    }
    val enStops = TextAnalysis.stopwords.toMap.apply("en")
    val rep = graft.expressions.TextHashes.gramRepetitionStats _
    val base = stage("s012_flags") {
      Tables.documentsDistributed(spark, dir)
        .withColumn("toks", TextAnalysis.tokensOf($"text"))
        .withColumn("n_tokens", size($"toks").cast("long"))
        .withColumn("q_ok",
          $"n_tokens".between(20, 1000) &&
            round(TextAnalysis.stopwordHits($"toks", enStops).cast("double") /
              $"n_tokens".cast("double"), 4) >= 0.05 && $"lang" === "en")
        .withColumn("bi", rep($"toks", 2))
        .withColumn("tri", rep($"toks", 3))
        .withColumn("rep_ok", $"q_ok" &&
          !(when($"bi".getItem(0) === 0L, lit(0d))
            .otherwise(round($"bi".getItem(1).cast("double") /
              $"bi".getItem(0), 4)) > 0.1) &&
          !(when($"tri".getItem(0) === 0L, lit(0d))
            .otherwise(round($"tri".getItem(2).cast("double") /
              $"tri".getItem(0), 4)) > 0.1))
        .select($"doc_id", $"text", $"toks", $"n_tokens", $"q_ok",
          $"rep_ok")
    }
    val s3 = stage("s3_pii") {
      base.filter($"rep_ok")
        .select($"doc_id", Pii.redact($"text").as("rtext"))
        .withColumn("rtoks", TextAnalysis.tokensOf($"rtext"))
        .withColumn("rn_tokens", size($"rtoks").cast("long"))
    }
    val s4 = stage("s4_decontaminate") {
      val bench = base.filter($"doc_id" % 7 === 0)
        .select($"doc_id", Decontaminate.gramHashes($"toks", k).as("grams"))
      val corpus4 = s3.filter($"doc_id" % 7 =!= 0)
      val report = Decontaminate.overlapReport(
        corpus4.select($"doc_id",
          Decontaminate.gramHashes($"rtoks", k).as("grams")),
        bench, "doc_id", "grams")
      Decontaminate.removeContaminated(corpus4, report, "doc_id")
    }
    val s5 = stage("s5_exact_dedup") {
      s4.withColumn("__rn", row_number().over(
          Window.partitionBy(md5($"rtext")).orderBy($"doc_id")))
        .filter($"__rn" === 1).drop("__rn")
    }
    val s6 = stage("s6_near_dedup") {
      val pairs = Dedup.minhashLshPairs(
        s5.select($"doc_id", Dedup.shingles($"rtoks").as("shingles")),
        "doc_id", "shingles")
      s5.join(pairs.select($"doc_b".as("doc_id")).distinct(),
        Seq("doc_id"), "left_anti")
    }
    val s7 = stage("s7_semantic_dedup") {
      val eSub = Tables.embeddingsDistributed(spark, dir)
        .select($"vec_id", $"embedding")
        .join(s6.select($"doc_id".as("vec_id")), Seq("vec_id"))
      val semDrops = SimilarityQueries.semanticDedupFrame(eSub)
        .filter($"kept" === 0L).select($"vec_id".as("doc_id"))
      s6.join(semDrops, Seq("doc_id"), "left_anti")
    }
    val s8 = stage("s8_lm_filter") {
      val bg = s7.select($"doc_id", explode_outer(
        graft.expressions.TextHashes.tokenGrams($"rtoks", 2)).as("g"))
      val scored = LangModel.score(bg, LangModel.train(bg))
      s7.join(
        scored.filter($"avg_nll" > nllThreshold).select($"doc_id"),
        Seq("doc_id"), "left_anti")
    }
    val s9 = s8.withColumn("split", Sampling.assignSplit($"doc_id",
      "split", Seq("train" -> 90, "val" -> 95), "test"))
    def stat(name: String, df: DataFrame) =
      df.agg(count(lit(1)).as("n_docs"),
        coalesce(sum($"rn_tokens"), lit(0L)).as("total_tokens"))
        .select(lit(name).as("stage"), $"n_docs", $"total_tokens")
    val stats = base.agg(
        count(lit(1)).as("n0"),
        coalesce(sum(when($"q_ok", 1L).otherwise(0L)), lit(0L)).as("n1"),
        coalesce(sum(when($"rep_ok", 1L).otherwise(0L)), lit(0L)).as("n2"),
        coalesce(sum($"n_tokens"), lit(0L)).as("t0"),
        coalesce(sum(when($"q_ok", $"n_tokens").otherwise(0L)), lit(0L))
          .as("t1"),
        coalesce(sum(when($"rep_ok", $"n_tokens").otherwise(0L)), lit(0L))
          .as("t2"))
      .selectExpr("stack(3, '0_raw', n0, t0, '1_quality', n1, t1, " +
        "'2_repetition', n2, t2) AS (stage, n_docs, total_tokens)")
      .unionByName(stat("3_pii", s3))
      .unionByName(stat("4_decontaminate", s4))
      .unionByName(stat("5_exact_dedup", s5))
      .unionByName(stat("6_near_dedup", s6))
      .unionByName(stat("7_semantic_dedup", s7))
      .unionByName(stat("8_lm_filter", s8))
      .unionByName(s9.groupBy($"split")
        .agg(count(lit(1)).as("n_docs"),
          coalesce(sum($"rn_tokens"), lit(0L)).as("total_tokens"))
        .select(concat(lit("9_split_"), $"split").as("stage"),
          $"n_docs", $"total_tokens"))
      .orderBy($"stage")
    (stats, s9.select($"doc_id", $"rtext", $"rn_tokens", $"split"),
      builtStages.toList)
  }

  /** q66 — training-sequence packing (the GPT-style concat-and-chunk
    * that turns a curated corpus into fixed-length training
    * sequences): documents are concatenated in doc_id order and cut
    * into `seqLen`-token sequences; each document reports its global
    * token offset, its first sequence id, and how many sequences it
    * spans (the packing metadata a dataloader needs to slice
    * sequences without re-tokenizing).
    *
    * The interesting part at 100 TB is the GLOBAL PREFIX SUM: the
    * naive `Window.orderBy(doc_id)` with no partition key collapses
    * the corpus into ONE task — the classic ordered-window
    * anti-pattern. Instead the cumsum decomposes over fixed id
    * blocks: (1) per-block token totals — one small aggregate, N/B
    * rows; (2) running block offsets — a window over that TINY frame
    * (bounded by N/blockSize, driver-scale by construction); (3) a
    * broadcast join back and a window PARTITIONED by block for the
    * within-block running sum. Every corpus-sized operation is
    * either a hash aggregate or a partitioned window; nothing global
    * ever sorts in one task. The oracle computes the same values
    * with the plain global cumsum (DuckDB sorts locally — fine at
    * oracle scale), which checks the decomposition is EXACT. */
  def sequencePack(spark: SparkSession, dir: String,
      seqLen: Long = 512L, blockSize: Long = 64L): DataFrame = {
    import spark.implicits._
    sequencePackFrame(
      Tables.documentsDistributed(spark, dir)
        .select($"doc_id",
          size(TextAnalysis.tokensOf($"text")).cast("long")
            .as("n_tokens")),
      seqLen, blockSize)
      .orderBy($"doc_id")
  }

  /** Frame-level packing over any `d(doc_id, n_tokens)` — what
    * tools/RunCuration applies to the curated train split (the packing
    * index is the third artifact of a training-data run, beside the
    * dataset card and the corpus itself). Unordered; see
    * [[sequencePack]] for the block-decomposition scale argument. */
  def sequencePackFrame(d0: DataFrame,
      seqLen: Long = 512L, blockSize: Long = 64L): DataFrame = {
    import d0.sparkSession.implicits._
    val d = d0.withColumn("blk", floor($"doc_id" / blockSize).cast("long"))
    val offsets = d.groupBy($"blk").agg(sum($"n_tokens").as("bt"))
      .withColumn("boff", coalesce(
        sum($"bt").over(Window.orderBy($"blk")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select($"blk", $"boff")
    val firstSeq = floor($"start_tok" / seqLen).cast("long")
    d.join(broadcast(offsets), Seq("blk"))
      .withColumn("start_tok", $"boff" + coalesce(
        sum($"n_tokens").over(Window.partitionBy($"blk")
          .orderBy($"doc_id")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select($"doc_id", $"n_tokens", $"start_tok",
        firstSeq.as("first_seq"),
        when($"n_tokens" === 0L, 0L)
          .otherwise(floor(($"start_tok" + $"n_tokens" - 1) / seqLen)
            .cast("long") - firstSeq + 1L).as("n_seqs"))
  }

  /** q67 — mixture sampling (the data-mixing stage of a pretraining
    * recipe): given per-source target WEIGHTS, downsample each source
    * with a deterministic hash so the kept corpus realizes the target
    * proportions at the largest size no source can exceed (the
    * binding-source cap): T = min_s ⌊count_s·W/w_s⌋ docs total,
    * k_s = ⌊w_s·T/W⌋ per source, applied as a basis-point keep rate
    * through the q54 stable md5 bucket — reproducible across runs,
    * engines, and corpus growth, unlike `sample()`. Weights here
    * derive deterministically from the source id (suffix mod 4 + 1 —
    * four mixture tiers over the synthetic sources); a deployment
    * passes its recipe as a literal map the same way.
    *
    * Scale shape: the rate derivation runs entirely on the per-source
    * count frame (|sources| rows — broadcast-scale by definition);
    * the corpus pays one broadcast join + a per-row md5 — a
    * scan-rider. All rate math is integer-derived (floors of exact
    * double divisions below 2^53), so both engines derive identical
    * basis-point rates. Output: per-source accounting
    * (n_docs, n_kept, kept_tokens, rate_bp). */
  def mixtureSample(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val d = Tables.documentsDistributed(spark, dir)
      .select($"doc_id", $"source",
        size(TextAnalysis.tokensOf($"text")).cast("long").as("n_tokens"))
      .withColumn("w",
        (regexp_extract($"source", "(\\d+)$", 1).cast("long") % 4L) + 1L)
    val counts = d.groupBy($"source", $"w").agg(count(lit(1)).as("cnt"))
    val wsum = counts.agg(sum($"w").as("wsum"))
    val capped = counts.crossJoin(broadcast(wsum))
      .withColumn("cap", floor($"cnt" * $"wsum" / $"w").cast("long"))
    val t = capped.agg(min($"cap").as("t"))
    val rates = capped.crossJoin(broadcast(t))
      .withColumn("k", floor($"w" * $"t" / $"wsum").cast("long"))
      .withColumn("rate_bp", floor($"k" * 10000L / $"cnt").cast("long"))
      .select($"source", $"rate_bp")
    d.join(broadcast(rates), Seq("source"))
      .withColumn("keep",
        Sampling.stableBucket($"doc_id", "mix", 10000) < $"rate_bp")
      .groupBy($"source")
      .agg(count(lit(1)).as("n_docs"),
        sum(when($"keep", 1L).otherwise(0L)).as("n_kept"),
        sum(when($"keep", $"n_tokens").otherwise(0L)).as("kept_tokens"),
        first($"rate_bp").as("rate_bp"))
      .orderBy($"source")
  }

  /** q121 — temperature-scaled mixture PLAN (the data-mixture table
    * of pretraining papers, UniMax/multilingual-sampling style): per
    * source, weight ∝ n_tokens^τ (τ = 0.7, the standard
    * low-resource-upsampling temperature — τ=1 is proportional, τ=0
    * uniform), planned tokens = weight × a token budget (half the
    * corpus here, self-contained), sampling rate = planned/actual,
    * and epochs = ⌈rate⌉ — rate > 1 means the source repeats, the
    * quantity model cards report as "epochs over the source". q67
    * SELECTS documents at fixed weights; this PLANS the weights from
    * the size profile — the step before it.
    *
    * Determinism: the only transcendental (n_tokens^0.7) is pinned
    * through the LM fixed-point convention (round(x·2²⁴) as BIGINT)
    * so an ulp of libm divergence cannot move a weight; everything
    * downstream is integer/double arithmetic in identical operation
    * order.
    *
    * Scale shape: one corpus aggregation to the |sources|-row size
    * profile; the plan math lives on that tiny frame (1-row totals
    * broadcast). */
  def mixturePlan(spark: SparkSession, dir: String, tau: Double = 0.7,
      budgetFrac: Double = 0.5): DataFrame = {
    import spark.implicits._
    val fp = 16777216d
    val src = Tables.documentsDistributed(spark, dir)
      .select($"source",
        size(TextAnalysis.tokensOf($"text")).cast("long").as("n"))
      .groupBy($"source")
      .agg(count(lit(1)).as("n_docs"), sum($"n").as("n_tokens"))
      .withColumn("w_fp",
        round(pow($"n_tokens".cast("double"), tau) * fp).cast("long"))
    val tot = src.agg(sum($"w_fp").as("wsum"),
      sum($"n_tokens").as("tok_total"))
    val planned = floor($"tok_total".cast("double") * lit(budgetFrac) *
      $"w_fp".cast("double") / $"wsum".cast("double")).cast("long")
    src.crossJoin(broadcast(tot))
      .withColumn("planned_tokens", planned)
      .select($"source", $"n_docs", $"n_tokens",
        round($"w_fp".cast("double") / $"wsum".cast("double"), 6)
          .as("weight"),
        $"planned_tokens",
        round($"planned_tokens".cast("double") /
          $"n_tokens".cast("double"), 4).as("rate"),
        ceil($"planned_tokens".cast("double") / $"n_tokens".cast("double"))
          .cast("long").as("epochs"))
      .orderBy($"source")
  }

  /** q127 — mixture REALIZATION (upsampling): q121 plans per-source
    * rates; this materializes them — a rate of 2.3 means every
    * document repeats twice and a stable 30% of documents get a third
    * copy (integer epochs + a deterministic fractional epoch via the
    * q54/q67 md5 bucket — no rand(), rerun-identical, the way small
    * high-quality sources actually upsample into a training mix).
    * Rates quantize to basis points (q67's convention) so both
    * engines realize the identical copy set. Emits the per-source
    * accounting card: realized docs/tokens vs the plan's
    * rate-implied target, and the realized/plan ratio (1 ± the
    * basis-point floor).
    *
    * Scale shape: the plan math rides q121's |sources|-row profile;
    * materialization is one broadcast rate join + a per-row
    * `explode(sequence(1, copies))` — output volume is exactly the
    * realized mixture (the unavoidable cost of upsampling), nothing
    * shuffles but the final per-source rollup. */
  def mixtureRealize(spark: SparkSession, dir: String, tau: Double = 0.7,
      budgetFrac: Double = 0.5): DataFrame = {
    import spark.implicits._
    val fp = 16777216d
    val d = Tables.documentsDistributed(spark, dir)
      .select($"doc_id", $"source",
        size(TextAnalysis.tokensOf($"text")).cast("long").as("n"))
    val src = d.groupBy($"source")
      .agg(count(lit(1)).as("n_docs"), sum($"n").as("n_tokens"))
      .withColumn("w_fp",
        round(pow($"n_tokens".cast("double"), tau) * fp).cast("long"))
    val tot = src.agg(sum($"w_fp").as("wsum"),
      sum($"n_tokens").as("tok_total"))
    val rates = src.crossJoin(broadcast(tot))
      .withColumn("planned", floor($"tok_total".cast("double") *
        lit(budgetFrac) * $"w_fp".cast("double") /
        $"wsum".cast("double")).cast("long"))
      .withColumn("rate_bp", floor($"planned" * lit(10000L) /
        $"n_tokens").cast("long"))
      .select($"source", $"rate_bp")
    // whole epochs: rate_bp is quantized, so the subtraction makes
    // the division exact in doubles (multiple of 10000 / 10000)
    d.join(broadcast(rates), Seq("source"))
      .withColumn("copies",
        (($"rate_bp" - $"rate_bp" % 10000L) / 10000L).cast("long") +
        when(Sampling.stableBucket($"doc_id", "up", 10000) <
          $"rate_bp" % 10000L, 1L).otherwise(0L))
      .filter($"copies" > 0)
      .select($"source", $"n",
        explode(sequence(lit(1L), $"copies")).as("copy"))
      .groupBy($"source")
      .agg(count(lit(1)).as("realized_docs"),
        sum($"n").as("realized_tokens"))
      .join(broadcast(rates), Seq("source"))
      .join(src.select($"source", $"n_tokens"), Seq("source"))
      .select($"source", $"realized_docs", $"realized_tokens",
        $"rate_bp",
        round($"realized_tokens".cast("double") * 10000d /
          ($"n_tokens".cast("double") * $"rate_bp".cast("double")), 4)
          .as("realized_over_plan"))
      .orderBy($"source")
  }

  /** q122 — length-bucketed batching plan (the dataloader padding
    * card): documents bucket by token length (width-64 integer
    * buckets — no FP bucketing edge), sort by length within the
    * bucket, group into batches of 32, and pad each batch to ITS OWN
    * max — per bucket: batch count, padding tokens wasted, and the
    * padded-slot waste fraction. The card quantifies what
    * length-bucketed batching buys over pad-to-global-max — the
    * standard efficiency table of sequence-training dataloaders.
    *
    * Scale shape: one corpus scan to (doc, len); ONE window shuffle
    * keyed by bucket for in-bucket ranking (bucket key cardinality =
    * length ranges — bounded; ties rank by doc_id); then
    * aggregations on (bucket, batch) and bucket. Everything after
    * the rank is integer arithmetic; the one ratio rounds 4dp. */
  def paddingPlan(spark: SparkSession, dir: String,
      batchSize: Int = 32): DataFrame = {
    import spark.implicits._
    val d = Tables.documentsDistributed(spark, dir)
      .select($"doc_id",
        size(TextAnalysis.tokensOf($"text")).cast("long").as("n"))
      .withColumn("bucket", (floor($"n" / 64L) * 64L).cast("long"))
    val ranked = d.withColumn("rn", row_number().over(
      Window.partitionBy($"bucket").orderBy($"n".desc, $"doc_id".asc)))
      .withColumn("batch", floor(($"rn" - 1) / batchSize).cast("long"))
    ranked
      .groupBy($"bucket", $"batch")
      .agg(max($"n").as("mx"), count(lit(1)).as("bn"), sum($"n").as("toks"))
      .groupBy($"bucket")
      .agg(sum($"bn").as("n_docs"), count(lit(1)).as("n_batches"),
        sum($"mx" * $"bn" - $"toks").as("pad_tokens"),
        sum($"mx" * $"bn").as("slots"))
      .select($"bucket", $"n_docs", $"n_batches", $"pad_tokens",
        round($"pad_tokens".cast("double") / $"slots".cast("double"), 4)
          .as("pad_frac"))
      .orderBy($"bucket")
  }

  /** q133 — training-shard plan (the write-the-training-data step
    * every pretraining pipeline ends with): documents take a
    * DETERMINISTIC GLOBAL SHUFFLE order (md5 of a salted id — the
    * q54 stable-hash convention, so the order is reproducible across
    * runs and engines, unlike `repartition`'s round-robin) and
    * round-robin into `shards` output shards by shuffled rank —
    * which balances BOTH doc counts (exactly) and token counts (in
    * expectation, no source/length clustering survives the hash
    * order). Emits the per-shard card: docs, tokens, and each
    * shard's token balance vs the ideal 1/shards share.
    *
    * The scale argument is the GLOBAL RANK: a bare
    * `row_number() OVER (ORDER BY key)` collapses the corpus into
    * one task (the q66 anti-pattern). The rank decomposes over the
    * md5 key's 2-hex-char PREFIX — 256 blocks whose ordering agrees
    * with the full-key ordering (equal-length strings compare
    * lexicographically): per-block counts (one aggregate), running
    * block offsets (a window over 256 rows), then a window
    * PARTITIONED by block. The oracle computes the same ranks with
    * the plain global window — pinning the decomposition exact. */
  def shardPlan(spark: SparkSession, dir: String,
      shards: Int = 16): DataFrame = {
    import spark.implicits._
    val d = Tables.documentsDistributed(spark, dir)
      .select($"doc_id",
        size(TextAnalysis.tokensOf($"text")).cast("long").as("n"))
      .withColumn("key",
        md5(concat(lit("shard|"), $"doc_id".cast("string"))))
      .withColumn("blk", substring($"key", 1, 2))
    val offsets = d.groupBy($"blk").agg(count(lit(1)).as("bc"))
      .withColumn("boff", coalesce(
        sum($"bc").over(Window.orderBy($"blk")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select($"blk", $"boff")
    val tot = d.agg(sum($"n").as("t"))
    d.join(broadcast(offsets), Seq("blk"))
      .withColumn("rank", $"boff" + row_number().over(
        Window.partitionBy($"blk").orderBy($"key", $"doc_id")))
      .withColumn("shard", (($"rank" - 1L) % shards).cast("long"))
      .groupBy($"shard")
      .agg(count(lit(1)).as("n_docs"), sum($"n").as("n_tokens"))
      .crossJoin(broadcast(tot))
      .select($"shard", $"n_docs", $"n_tokens",
        round($"n_tokens".cast("double") * shards /
          $"t".cast("double"), 4).as("tok_balance"))
      .orderBy($"shard")
  }

  /** q134 — token-budget data selection (the "best data under a
    * compute budget" step — DoReMi/DsDm-style quality ranking meets
    * a fixed token budget): documents rank by a quality score
    * (stopword ratio, the q29 surface-quality proxy — higher reads
    * as more natural text; 4dp-rounded so both engines order
    * identically) and are kept greedily until the budget
    * (`budgetFrac` of corpus tokens) fills; the cut is exact — a
    * document is kept iff the tokens BEFORE it in (quality desc,
    * doc_id) order are under budget. Emits the per-source
    * accounting: what the selection did to the mixture.
    *
    * Scale shape: the greedy cut is a GLOBAL cumulative sum in
    * quality order — decomposed like q66/q133, with the 4dp
    * fixed-point quality VALUE as the block key: per-value totals
    * (≤ 10⁴ rows), running offsets over that tiny frame, within-value
    * window partitioned by value. No global single-task sort; the
    * corpus pays one scan + one value-keyed window. */
  def budgetSelect(spark: SparkSession, dir: String,
      budgetFrac: Double = 0.25): DataFrame = {
    import spark.implicits._
    val enStops = TextAnalysis.stopwords.toMap.apply("en")
    val d = Tables.documentsDistributed(spark, dir)
      .withColumn("toks", TextAnalysis.tokensOf($"text"))
      .select($"doc_id", $"source",
        size($"toks").cast("long").as("n"),
        round(TextAnalysis.stopwordHits($"toks", enStops).cast("double") /
          size($"toks").cast("double"), 4).as("q"))
      .filter($"n" > 0)
      .withColumn("qfp", round($"q" * 10000).cast("long"))
    val offsets = d.groupBy($"qfp").agg(sum($"n").as("bt"))
      .withColumn("boff", coalesce(
        sum($"bt").over(Window.orderBy($"qfp".desc)
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select($"qfp", $"boff")
    val tot = d.agg(sum($"n").as("t"))
    d.join(broadcast(offsets), Seq("qfp"))
      .withColumn("cum_before", $"boff" + coalesce(
        sum($"n").over(Window.partitionBy($"qfp").orderBy($"doc_id")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .crossJoin(broadcast(tot))
      .withColumn("keep", $"cum_before" <
        floor($"t".cast("double") * budgetFrac).cast("long"))
      .groupBy($"source")
      .agg(count(lit(1)).as("n_docs"),
        sum($"n").as("n_tokens"),
        sum(when($"keep", 1L).otherwise(0L)).as("n_kept"),
        sum(when($"keep", $"n").otherwise(0L)).as("kept_tokens"))
      .orderBy($"source")
  }

  /** q135 — fill-in-the-middle transform (Bavarian et al. 2022, the
    * FIM objective of code models): a stable 50% of documents (md5
    * coin, the q54 convention) split their token stream at two
    * hash-derived points a ≤ b and re-serialize as PSM
    * (`<PRE> P <SUF> S <MID> M` — suffix moved before middle so the
    * model learns to infill) or SPM (`<SUF> S <PRE> P <MID> M`),
    * mode chosen by a third hash bit — all three draws deterministic
    * per document, rerun- and engine-identical (no rand()).
    * Untransformed docs serialize unchanged. Emits per-doc
    * accounting (mode, split points, segment sizes) and the md5
    * digest of the serialized stream — the content pin.
    *
    * Scale shape: pure scan-rider — per-row hashes, slices and one
    * digest; no shuffle anywhere (the final orderBy is the oracle
    * gate's determinism, not the deployment shape — a deployment
    * writes the transformed stream straight to its shards). */
  def fimTransform(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val d = Tables.documentsDistributed(spark, dir)
      .withColumn("toks", TextAnalysis.tokensOf($"text"))
      .withColumn("n", size($"toks").cast("long"))
      .withColumn("fim",
        Sampling.stableBucket($"doc_id", "fim", 2) === 0L)
      .withColumn("a",
        Sampling.stableBucket($"doc_id", "fimA", ($"n" + 1L).cast("int")))
      .withColumn("b", $"a" +
        Sampling.stableBucket($"doc_id", "fimB",
          ($"n" - $"a" + 1L).cast("int")))
      .withColumn("spm",
        Sampling.stableBucket($"doc_id", "fimM", 2) === 0L)
    val pre = slice($"toks", lit(1), $"a".cast("int"))
    val mid = slice($"toks", ($"a" + 1L).cast("int"), ($"b" - $"a").cast("int"))
    val suf = slice($"toks", ($"b" + 1L).cast("int"), ($"n" - $"b").cast("int"))
    val psmStream = concat(array(lit("<PRE>")), pre,
      array(lit("<SUF>")), suf, array(lit("<MID>")), mid)
    val spmStream = concat(array(lit("<SUF>")), suf,
      array(lit("<PRE>")), pre, array(lit("<MID>")), mid)
    d.select($"doc_id", $"n".as("n_tokens"),
      when($"fim", when($"spm", "spm").otherwise("psm"))
        .otherwise("none").as("mode"),
      when($"fim", $"a").as("a"),
      when($"fim", $"b").as("b"),
      md5(array_join(
        when($"fim", when($"spm", spmStream).otherwise(psmStream))
          .otherwise($"toks"), " ")).as("digest"))
      .orderBy($"doc_id")
  }

  /** q93 — weighted sampling without replacement (Efraimidis &
    * Spirakis 2006), the deterministic form: each document draws a
    * stable uniform u ∈ (0,1) from its md5 (the q54 bucket construction
    * widened to a 24-bit fraction) and competes with key u^(1/w) —
    * taking the top-k realizes EXACT weighted sampling without
    * replacement, the primitive behind "sample a 1M-doc eval slice
    * where wiki counts 3× web". Weights reuse q67's source-tier
    * convention (suffix mod 4 + 1). Deterministic end to end:
    * re-running — or re-deriving in the warehouse — selects the same
    * documents, and a grown corpus only displaces keys it beats (no
    * rand(), no seed plumbing).
    *
    * Scale shape: the draw and key are per-row map work riding the
    * scan; selection is a top-k (TakeOrderedAndProject — per-partition
    * heaps into one k-row merge, the q06 argument), never a global
    * sort. The only cross-engine float is pow(u, 1/w) — one
    * correctly-rounded-input IEEE op whose 6dp-rounded output would
    * need a ~5e-13 near-tie to diverge. */
  def weightedSample(spark: SparkSession, dir: String,
      k: Int = 100): DataFrame = {
    import spark.implicits._
    val d = Tables.documents(spark, dir)
      .select($"doc_id", $"source")
      .withColumn("w",
        (regexp_extract($"source", "(\\d+)$", 1).cast("long") % 4L) + 1L)
      .withColumn("u",
        (conv(substring(md5(concat(lit("ws|"), $"doc_id".cast("string"))),
          1, 6), 16, 10).cast("double") + 1.0) / 16777217.0)
      .withColumn("skey", pow($"u", lit(1.0) / $"w".cast("double")))
    d.orderBy($"skey".desc, $"doc_id").limit(k)
      .select($"doc_id", $"source", $"w", round($"skey", 6).as("skey_r"))
      .orderBy($"doc_id")
  }

  /** q97 — corpus snapshot diff (the refresh-accounting card): given
    * OLD and NEW corpus snapshots, classify every document id as
    * added / removed / changed / unchanged (content identity = md5 of
    * text, the q16 convention) and report per-status doc counts and
    * token totals on both sides — the report that tells an operator
    * what a refresh actually costs BEFORE the incremental passes
    * (J5/J6 merge, q68 incremental near-dup) run on the delta. The
    * snapshots here are derived deterministically from `documents`
    * (the q59 synthetic convention): OLD lacks doc_id ≡ 7 mod 10
    * (those are "added"), carries extra ids ≡ 3 mod 13 shifted past
    * max(doc_id) ("removed" — the shift is derived from the data, not
    * a constant, so synthetic ids can never collide with real ones at
    * any scale factor), and upper-cases text for doc_id ≡ 0 mod 6
    * ("changed" — the hash differs, the token count doesn't).
    *
    * Scale shape: ONE full-outer join co-partitioned on the id — at
    * deployment both sides are bucketed snapshots (io/Layout), so
    * even that shuffle disappears — then an aggregation to four
    * rows. Hashing and token counting are scan-riders. */
  def snapshotDiff(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = Tables.documentsDistributed(spark, dir)
      .select($"doc_id", $"text")
    val newSnap = docs
    val oldSnap = docs.filter($"doc_id" % 10 =!= 7)
      .withColumn("text",
        when($"doc_id" % 6 === 0, upper($"text")).otherwise($"text"))
      .unionByName(docs.filter($"doc_id" % 13 === 3)
        // 1-row max-id aggregate broadcast-crossed in — a few bytes of
        // driver-free plumbing that keeps the synthetic "removed" ids
        // disjoint from real ids at every scale factor.
        .crossJoin(broadcast(docs.agg(max($"doc_id").as("max_id"))))
        .select(($"doc_id" + $"max_id" + 1L).as("doc_id"), $"text"))
    def side(df: DataFrame, pfx: String): DataFrame =
      df.select($"doc_id",
        md5($"text").as(s"${pfx}_hash"),
        size(TextAnalysis.tokensOf($"text")).cast("long")
          .as(s"${pfx}_tokens"))
    side(oldSnap, "old")
      .join(side(newSnap, "new"), Seq("doc_id"), "full_outer")
      .withColumn("status",
        when($"new_hash".isNull, "removed")
          .when($"old_hash".isNull, "added")
          .when($"old_hash" =!= $"new_hash", "changed")
          .otherwise("unchanged"))
      .groupBy($"status")
      .agg(count(lit(1)).as("n_docs"),
        sum(coalesce($"old_tokens", lit(0L))).as("old_tokens"),
        sum(coalesce($"new_tokens", lit(0L))).as("new_tokens"))
      .withColumn("token_delta", $"new_tokens" - $"old_tokens")
      .orderBy($"status")
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
    "q111_chunk_documents" ->
      """WITH tk AS (SELECT doc_id,
        |    list_filter(string_split_regex(lower(text), '\s+'),
        |      t -> length(t) > 0) AS toks
        |  FROM documents),
        |s AS (SELECT doc_id, toks, CAST(len(toks) AS BIGINT) AS n,
        |    unnest(generate_series(0,
        |      greatest(CAST(len(toks) AS BIGINT) - 1, 0), 40))
        |      AS start_tok
        |  FROM tk)
        |SELECT doc_id, start_tok // 40 AS chunk_id, start_tok,
        |  least(50, n - start_tok) AS chunk_len,
        |  md5(array_to_string(list_slice(toks, start_tok + 1,
        |    start_tok + least(50, n - start_tok)), ' ')) AS chunk_md5
        |FROM s ORDER BY doc_id, chunk_id""".stripMargin,
    "q97_snapshot_diff" ->
      """WITH o AS (SELECT doc_id,
        |    CASE WHEN doc_id % 6 = 0 THEN upper(text) ELSE text END AS text
        |  FROM documents WHERE doc_id % 10 <> 7
        |  UNION ALL
        |  SELECT doc_id + 1 + (SELECT max(doc_id) FROM documents)
        |    AS doc_id, text FROM documents
        |  WHERE doc_id % 13 = 3),
        |os AS (SELECT doc_id, md5(text) AS old_hash,
        |    len(list_filter(string_split_regex(lower(text), '\s+'),
        |        t -> length(t) > 0)) AS old_tokens
        |  FROM o),
        |ns AS (SELECT doc_id, md5(text) AS new_hash,
        |    len(list_filter(string_split_regex(lower(text), '\s+'),
        |        t -> length(t) > 0)) AS new_tokens
        |  FROM documents),
        |j AS (SELECT old_hash, new_hash,
        |    COALESCE(old_tokens, 0) AS ot, COALESCE(new_tokens, 0) AS nt
        |  FROM os FULL OUTER JOIN ns ON os.doc_id = ns.doc_id),
        |c AS (SELECT CASE WHEN new_hash IS NULL THEN 'removed'
        |    WHEN old_hash IS NULL THEN 'added'
        |    WHEN old_hash <> new_hash THEN 'changed'
        |    ELSE 'unchanged' END AS status, ot, nt FROM j)
        |SELECT status, count(*) AS n_docs,
        |  CAST(SUM(ot) AS BIGINT) AS old_tokens,
        |  CAST(SUM(nt) AS BIGINT) AS new_tokens,
        |  CAST(SUM(nt) - SUM(ot) AS BIGINT) AS token_delta
        |FROM c GROUP BY status ORDER BY status""".stripMargin,
    // q133: plain global row_number in the oracle pins the
    // prefix-block rank decomposition exact
    "q133_shard_plan" ->
      """WITH d AS (SELECT doc_id,
        |  CAST(len(list_filter(string_split_regex(text, '\s+'),
        |    t -> length(t) > 0)) AS BIGINT) AS n,
        |  md5('shard|' || doc_id::VARCHAR) AS key
        | FROM documents),
        |r AS (SELECT *, row_number() OVER (ORDER BY key, doc_id) AS rk
        |  FROM d),
        |t AS (SELECT CAST(SUM(n) AS BIGINT) AS t FROM d)
        |SELECT (rk - 1) % 16 AS shard, COUNT(*) AS n_docs,
        |  CAST(SUM(n) AS BIGINT) AS n_tokens,
        |  round(SUM(n)::DOUBLE * 16 / t.t, 4) AS tok_balance
        |FROM r CROSS JOIN t GROUP BY 1, t.t ORDER BY shard""".stripMargin,
    // q134: plain global cumulative window in the oracle pins the
    // quality-value block decomposition exact
    "q134_budget_select" ->
      """WITH d0 AS (SELECT doc_id, source,
        |  list_filter(string_split_regex(text, '\s+'),
        |    t -> length(t) > 0) AS tokens
        | FROM documents),
        |d AS (SELECT doc_id, source,
        |  CAST(len(tokens) AS BIGINT) AS n,
        |  CAST(round(round(len(list_filter(tokens,
        |      t -> t IN ('the','a','of','and','is','not','to','in')))::DOUBLE
        |    / len(tokens), 4) * 10000) AS BIGINT) AS qfp
        | FROM d0 WHERE len(tokens) > 0),
        |t AS (SELECT CAST(SUM(n) AS BIGINT) AS t FROM d),
        |c AS (SELECT *, COALESCE(SUM(n) OVER (
        |    ORDER BY qfp DESC, doc_id ASC
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |  AS cum_before FROM d)
        |SELECT source, COUNT(*) AS n_docs,
        |  CAST(SUM(n) AS BIGINT) AS n_tokens,
        |  CAST(SUM(CASE WHEN cum_before <
        |      CAST(floor(t.t::DOUBLE * 0.25) AS BIGINT)
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
        |  CAST(SUM(CASE WHEN cum_before <
        |      CAST(floor(t.t::DOUBLE * 0.25) AS BIGINT)
        |    THEN n ELSE 0 END) AS BIGINT) AS kept_tokens
        |FROM c CROSS JOIN t GROUP BY source, t.t
        |ORDER BY source""".stripMargin,
    "q135_fim_transform" ->
      """WITH d0 AS (SELECT doc_id,
        |  list_filter(string_split_regex(text, '\s+'),
        |    t -> length(t) > 0) AS toks
        | FROM documents),
        |d AS (SELECT doc_id, toks, CAST(len(toks) AS BIGINT) AS n,
        |  (CAST(('0x' || substr(md5('fim|' || doc_id::VARCHAR), 1, 8))
        |    AS BIGINT) % 2) = 0 AS fim,
        |  CAST(('0x' || substr(md5('fimA|' || doc_id::VARCHAR), 1, 8))
        |    AS BIGINT) % (len(toks) + 1) AS a0,
        |  (CAST(('0x' || substr(md5('fimM|' || doc_id::VARCHAR), 1, 8))
        |    AS BIGINT) % 2) = 0 AS spm
        | FROM d0),
        |e AS (SELECT *, a0 +
        |    CAST(('0x' || substr(md5('fimB|' || doc_id::VARCHAR), 1, 8))
        |      AS BIGINT) % (n - a0 + 1) AS b0
        |  FROM d),
        |s AS (SELECT doc_id, n, fim, spm, a0 AS a, b0 AS b,
        |    toks[1:a0] AS pre, toks[a0+1:b0] AS mid,
        |    toks[b0+1:n] AS suf, toks
        |  FROM e)
        |SELECT doc_id, n AS n_tokens,
        |  CASE WHEN fim THEN (CASE WHEN spm THEN 'spm' ELSE 'psm' END)
        |    ELSE 'none' END AS mode,
        |  CASE WHEN fim THEN a END AS a,
        |  CASE WHEN fim THEN b END AS b,
        |  md5(array_to_string(CASE WHEN fim THEN
        |      (CASE WHEN spm THEN
        |        ['<SUF>'] || suf || ['<PRE>'] || pre || ['<MID>'] || mid
        |       ELSE
        |        ['<PRE>'] || pre || ['<SUF>'] || suf || ['<MID>'] || mid
        |       END)
        |    ELSE toks END, ' ')) AS digest
        |FROM s ORDER BY doc_id""".stripMargin,
    "q93_weighted_sample" ->
      """WITH d AS (SELECT doc_id, source,
        |  (CAST(regexp_extract(source, '(\d+)$', 1) AS BIGINT) % 4) + 1
        |    AS w,
        |  (CAST(('0x' || substr(md5('ws|' || CAST(doc_id AS VARCHAR)),
        |    1, 6)) AS BIGINT) + 1.0) / 16777217.0 AS u
        | FROM documents),
        |s AS (SELECT doc_id, source, w, power(u, 1.0 / w) AS skey
        |  FROM d ORDER BY skey DESC, doc_id LIMIT 100)
        |SELECT doc_id, source, w, round(skey, 6) AS skey_r
        |FROM s ORDER BY doc_id""".stripMargin,
    // q127: q121's plan CTEs quantized to basis points, md5
    // fractional-epoch copies, per-source realized accounting
    "q127_mixture_realize" ->
      """WITH tk AS (SELECT doc_id, source,
        |  CAST(len(list_filter(string_split_regex(lower(text), '\s+'),
        |    t -> length(t) > 0)) AS BIGINT) AS n
        | FROM documents),
        |s AS (SELECT source, CAST(SUM(n) AS BIGINT) AS n_tokens
        |  FROM tk GROUP BY source),
        |w AS (SELECT *, CAST(round(pow(n_tokens::DOUBLE, 0.7)
        |    * 16777216.0) AS BIGINT) AS w_fp FROM s),
        |t AS (SELECT CAST(SUM(w_fp) AS BIGINT) AS wsum,
        |    CAST(SUM(n_tokens) AS BIGINT) AS tok_total FROM w),
        |r AS (SELECT source, n_tokens,
        |    CAST(floor(CAST(floor(t.tok_total::DOUBLE * 0.5
        |        * w.w_fp::DOUBLE / t.wsum::DOUBLE) AS BIGINT)
        |      * 10000 / n_tokens) AS BIGINT) AS rate_bp
        |  FROM w CROSS JOIN t),
        |c AS (SELECT tk.source, tk.n,
        |    (r.rate_bp // 10000) + CASE WHEN
        |      CAST(('0x' || substr(md5('up|' || tk.doc_id::VARCHAR),
        |        1, 8)) AS BIGINT) % 10000 < r.rate_bp % 10000
        |      THEN 1 ELSE 0 END AS copies
        |  FROM tk JOIN r USING (source)),
        |re AS (SELECT source, CAST(SUM(copies) AS BIGINT)
        |    AS realized_docs,
        |    CAST(SUM(n * copies) AS BIGINT) AS realized_tokens
        |  FROM c WHERE copies > 0 GROUP BY source)
        |SELECT source, realized_docs, realized_tokens, r.rate_bp,
        |  round(realized_tokens::DOUBLE * 10000 /
        |    (r.n_tokens::DOUBLE * r.rate_bp::DOUBLE), 4)
        |    AS realized_over_plan
        |FROM re JOIN r USING (source)
        |ORDER BY source""".stripMargin,
    // q121: size profile -> fixed-point temperature weights -> plan
    // math in identical operation order
    "q121_mixture_plan" ->
      """WITH tk AS (SELECT source,
        |  CAST(len(list_filter(string_split_regex(lower(text), '\s+'),
        |    t -> length(t) > 0)) AS BIGINT) AS n
        | FROM documents),
        |s AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |    CAST(SUM(n) AS BIGINT) AS n_tokens
        |  FROM tk GROUP BY source),
        |w AS (SELECT *, CAST(round(pow(n_tokens::DOUBLE, 0.7)
        |    * 16777216.0) AS BIGINT) AS w_fp FROM s),
        |t AS (SELECT CAST(SUM(w_fp) AS BIGINT) AS wsum,
        |    CAST(SUM(n_tokens) AS BIGINT) AS tok_total FROM w),
        |p AS (SELECT w.*, t.wsum, t.tok_total,
        |    CAST(floor(t.tok_total::DOUBLE * 0.5 * w.w_fp::DOUBLE
        |      / t.wsum::DOUBLE) AS BIGINT) AS planned_tokens
        |  FROM w CROSS JOIN t)
        |SELECT source, n_docs, n_tokens,
        |  round(w_fp::DOUBLE / wsum::DOUBLE, 6) AS weight,
        |  planned_tokens,
        |  round(planned_tokens::DOUBLE / n_tokens::DOUBLE, 4) AS rate,
        |  CAST(ceil(planned_tokens::DOUBLE / n_tokens::DOUBLE) AS BIGINT)
        |    AS epochs
        |FROM p ORDER BY source""".stripMargin,
    // q122: width-64 integer buckets, in-bucket length-desc rank,
    // batches of 32 padded to their own max
    "q122_padding_plan" ->
      """WITH tk AS (SELECT doc_id,
        |  CAST(len(list_filter(string_split_regex(lower(text), '\s+'),
        |    t -> length(t) > 0)) AS BIGINT) AS n
        | FROM documents),
        |b AS (SELECT doc_id, n,
        |    CAST(floor(n / 64) * 64 AS BIGINT) AS bucket FROM tk),
        |r AS (SELECT *, row_number() OVER (PARTITION BY bucket
        |    ORDER BY n DESC, doc_id ASC) AS rn FROM b),
        |bt AS (SELECT bucket, CAST(floor((rn - 1) / 32) AS BIGINT)
        |    AS batch, MAX(n) AS mx, COUNT(*) AS bn, SUM(n) AS toks
        |  FROM r GROUP BY bucket, batch)
        |SELECT bucket, CAST(SUM(bn) AS BIGINT) AS n_docs,
        |  CAST(COUNT(*) AS BIGINT) AS n_batches,
        |  CAST(SUM(mx * bn - toks) AS BIGINT) AS pad_tokens,
        |  round(SUM(mx * bn - toks)::DOUBLE / SUM(mx * bn)::DOUBLE, 4)
        |    AS pad_frac
        |FROM bt GROUP BY bucket ORDER BY bucket""".stripMargin,
    "q67_mixture_sample" ->
      """WITH d AS (SELECT doc_id, source,
        |  CAST(len(list_filter(string_split_regex(lower(text), '\s+'),
        |    t -> length(t) > 0)) AS BIGINT) AS n_tokens,
        |  (CAST(regexp_extract(source, '(\d+)$', 1) AS BIGINT) % 4) + 1
        |    AS w
        | FROM documents),
        |c AS (SELECT source, ANY_VALUE(w) AS w, COUNT(*) AS cnt
        |      FROM d GROUP BY source),
        |ws AS (SELECT CAST(SUM(w) AS BIGINT) AS wsum FROM c),
        |t AS (SELECT MIN(CAST(floor(cnt * wsum / w) AS BIGINT)) AS t
        |      FROM c, ws),
        |r AS (SELECT source,
        |  CAST(floor(CAST(floor(w * t / wsum) AS BIGINT) * 10000.0 / cnt)
        |    AS BIGINT) AS rate_bp
        | FROM c, ws, t)
        |SELECT d.source, COUNT(*) AS n_docs,
        |  CAST(SUM(CASE WHEN
        |    CAST(('0x' || substr(md5('mix|' || d.doc_id::VARCHAR), 1, 8))
        |      AS BIGINT) % 10000 < r.rate_bp THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_kept,
        |  CAST(SUM(CASE WHEN
        |    CAST(('0x' || substr(md5('mix|' || d.doc_id::VARCHAR), 1, 8))
        |      AS BIGINT) % 10000 < r.rate_bp THEN d.n_tokens ELSE 0 END)
        |    AS BIGINT) AS kept_tokens,
        |  ANY_VALUE(r.rate_bp) AS rate_bp
        |FROM d JOIN r USING (source)
        |GROUP BY d.source ORDER BY d.source""".stripMargin,
    "q66_sequence_pack" ->
      s"""WITH ${DedupQueries.toksCte},
        |n AS (SELECT doc_id, CAST(len(tokens) AS BIGINT) AS n_tokens
        |      FROM toks),
        |c AS (SELECT doc_id, n_tokens,
        |  COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |    AS start_tok
        | FROM n)
        |SELECT doc_id, n_tokens, CAST(start_tok AS BIGINT) AS start_tok,
        |  CAST(floor(start_tok / 512.0) AS BIGINT) AS first_seq,
        |  CAST(CASE WHEN n_tokens = 0 THEN 0
        |    ELSE floor((start_tok + n_tokens - 1) / 512.0)
        |         - floor(start_tok / 512.0) + 1 END AS BIGINT) AS n_seqs
        |FROM c ORDER BY doc_id""".stripMargin,
    "q63_curation_sweep" ->
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
        |${CurationQueries.repCtes("base")},
        |f2 AS (
        |  SELECT m.*, q_ok,
        |    (q_ok AND NOT (rep_f.top_bigram_frac > 0.1
        |      OR rep_f.dup_trigram_frac > 0.1)) AS rep_ok
        |  FROM (SELECT m.*,
        |      (n_tokens BETWEEN 20 AND 1000 AND stop_ratio >= 0.05
        |        AND lang = 'en') AS q_ok FROM m) m
        |    JOIN rep_f USING (doc_id)),
        |s3 AS (
        |  SELECT doc_id,
        |    regexp_replace(regexp_replace(regexp_replace(text,
        |      '${graft.ops.Pii.emailPattern}', '<EMAIL>', 'g'),
        |      '${graft.ops.Pii.ipv4Pattern}', '<IP>', 'g'),
        |      '${graft.ops.Pii.phonePattern}', '<PHONE>', 'g') AS rtext
        |  FROM f2 WHERE rep_ok),
        |s3t AS (SELECT doc_id, rtext,
        |    list_filter(string_split_regex(lower(rtext), '\\s+'),
        |                t -> length(t) > 0) AS rtokens
        |  FROM s3),
        |s3n AS (SELECT *, CAST(len(rtokens) AS BIGINT) AS rn_tokens
        |  FROM s3t),
        |${CurationQueries.gramCte("kg4", "s3n", "rtokens")},
        |benchsrc AS (SELECT doc_id, tokens FROM base WHERE doc_id % 7 = 0),
        |${CurationQueries.gramCte("kgb", "benchsrc")},
        |benchg AS (SELECT DISTINCT unnest(grams) AS g FROM kgb),
        |cont AS (SELECT DISTINCT doc_id FROM
        |    (SELECT doc_id, unnest(grams) AS g FROM kg4
        |     WHERE doc_id % 7 <> 0) cg
        |  JOIN benchg USING (g)),
        |s4 AS (SELECT * FROM s3n WHERE doc_id % 7 <> 0
        |  AND doc_id NOT IN (SELECT doc_id FROM cont)),
        |s5 AS (SELECT doc_id, rtext, rtokens, rn_tokens FROM
        |    (SELECT *, row_number() OVER
        |      (PARTITION BY md5(rtext) ORDER BY doc_id) AS rn5 FROM s4)
        |  WHERE rn5 = 1),
        |s5a AS (SELECT doc_id, rtokens AS tokens FROM s5),
        |${DedupQueries.shCte("s5a")},
        |${DedupQueries.sigCte},
        |${DedupQueries.bandsCte},
        |${DedupQueries.candPairsCte},
        |nd AS (SELECT DISTINCT doc_b AS doc_id FROM cand WHERE j >= 0.7),
        |s6 AS (SELECT * FROM s5
        |  WHERE doc_id NOT IN (SELECT doc_id FROM nd)),
        |se AS (SELECT e.vec_id, e.embedding FROM embeddings e
        |  JOIN s6 ON e.vec_id = s6.doc_id),
        |${SimilarityQueries.semDedupCtes("se")},
        |s7 AS (SELECT * FROM s6
        |  WHERE doc_id NOT IN (SELECT vec_id FROM sem_drops)),
        |bg8 AS (SELECT doc_id, unnest(
        |    CASE WHEN len(rtokens) >= 2
        |      THEN list_transform(generate_series(1, len(rtokens) - 1),
        |             i -> array_to_string(rtokens[i:i+1], ' '))
        |      ELSE [] END) AS g
        |  FROM s7),
        |lm8c AS (SELECT g, count(*) AS c2 FROM bg8 GROUP BY g),
        |lm8 AS (SELECT g,
        |    CAST(round(ln(c2::DOUBLE /
        |      SUM(c2) OVER (PARTITION BY split_part(g, ' ', 1)))
        |      * 16777216.0) AS BIGINT) AS lnp_fp
        |  FROM lm8c),
        |bad8 AS (SELECT b.doc_id FROM bg8 b JOIN lm8 l USING (g)
        |  GROUP BY b.doc_id
        |  HAVING round(-(CAST(SUM(l.lnp_fp) AS DOUBLE) / 16777216.0)
        |    / count(*), 4) > 3.43),
        |s8 AS (SELECT * FROM s7
        |  WHERE doc_id NOT IN (SELECT doc_id FROM bad8)),
        |s9 AS (SELECT *, CASE WHEN b9 < 90 THEN 'train'
        |    WHEN b9 < 95 THEN 'val' ELSE 'test' END AS split
        |  FROM (SELECT *,
        |      CAST(('0x' || substr(md5('split|' || doc_id::VARCHAR), 1, 8))
        |        AS BIGINT) % 100 AS b9 FROM s8))
        |SELECT '0_raw' AS stage, COUNT(*) AS n_docs,
        |  CAST(COALESCE(SUM(n_tokens), 0) AS BIGINT) AS total_tokens FROM f2
        |UNION ALL SELECT '1_quality', COUNT(*),
        |  CAST(COALESCE(SUM(n_tokens), 0) AS BIGINT) FROM f2 WHERE q_ok
        |UNION ALL SELECT '2_repetition', COUNT(*),
        |  CAST(COALESCE(SUM(n_tokens), 0) AS BIGINT) FROM f2 WHERE rep_ok
        |UNION ALL SELECT '3_pii', COUNT(*),
        |  CAST(COALESCE(SUM(rn_tokens), 0) AS BIGINT) FROM s3n
        |UNION ALL SELECT '4_decontaminate', COUNT(*),
        |  CAST(COALESCE(SUM(rn_tokens), 0) AS BIGINT) FROM s4
        |UNION ALL SELECT '5_exact_dedup', COUNT(*),
        |  CAST(COALESCE(SUM(rn_tokens), 0) AS BIGINT) FROM s5
        |UNION ALL SELECT '6_near_dedup', COUNT(*),
        |  CAST(COALESCE(SUM(rn_tokens), 0) AS BIGINT) FROM s6
        |UNION ALL SELECT '7_semantic_dedup', COUNT(*),
        |  CAST(COALESCE(SUM(rn_tokens), 0) AS BIGINT) FROM s7
        |UNION ALL SELECT '8_lm_filter', COUNT(*),
        |  CAST(COALESCE(SUM(rn_tokens), 0) AS BIGINT) FROM s8
        |UNION ALL SELECT '9_split_' || split, COUNT(*),
        |  CAST(COALESCE(SUM(rn_tokens), 0) AS BIGINT) FROM s9 GROUP BY split
        |ORDER BY stage""".stripMargin,
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
