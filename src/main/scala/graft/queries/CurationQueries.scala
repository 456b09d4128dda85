package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.io.Tables
import graft.ops.{Classifier, Decontaminate, Dedup, LangModel, Pii, TextAnalysis}

/** Corpus-curation queries beyond dedup: benchmark decontamination
  * (q57), gram-repetition quality filtering (q58), and PII
  * detection/redaction (q59) — the remaining hygiene passes of a
  * training-data pipeline. All three are scan-shaped: per-row kernels
  * or broadcast probes, no corpus-side shuffle (see each op's
  * scaladoc for the 100 TB argument).
  */
object CurationQueries {

  /** q57 — benchmark decontamination: documents sharing a 13-token
    * gram with the benchmark slice (doc_id ≡ 0 mod 7 stands in for an
    * eval set; k=13 is the GPT-3/PaLM convention). Output is the
    * contamination report — ONLY the contaminated documents, which is
    * what keeps the operator corpus-shuffle-free: zero-hit documents
    * never leave their scan task. */
  def decontaminate(spark: SparkSession, dir: String, k: Int = 13): DataFrame = {
    import spark.implicits._
    val docs = Tables.documentsDistributed(spark, dir)
      .select($"doc_id",
        Decontaminate.gramHashes(Dedup.tokens($"text"), k).as("grams"))
    val bench = docs.filter($"doc_id" % 7 === 0)
    val corpus = docs.filter($"doc_id" % 7 =!= 0)
    Decontaminate.overlapReport(corpus, bench, "doc_id", "grams")
      .orderBy($"doc_id")
  }

  /** q120 — MULTI-benchmark contamination attribution: real
    * decontamination runs against a SUITE of eval sets (MMLU, GSM8K,
    * …) and ships the per-benchmark table the model-card appendices
    * report (contaminated docs, matched grams, contamination rate per
    * benchmark) — q57 generalized from one benchmark to B. Suites
    * synthesize deterministically (the q57 convention): suite b =
    * documents with doc_id ≡ b (mod 31), b < 3; corpus = the rest.
    *
    * Scale shape — the point of the operator: the corpus pays its
    * gram explode ONCE for ALL benchmarks, not once per benchmark (B
    * separate q57 runs = B corpus passes). Benchmark grams broadcast
    * TAGGED with their suite; a corpus gram matching two suites
    * attributes to both (row per suite from the broadcast join); the
    * per-suite rollup is a |contaminated|-sized aggregation and the
    * final matrix is B rows. The corpus never shuffles. */
  def multiBenchContamination(spark: SparkSession, dir: String,
      k: Int = 13, nBench: Int = 3): DataFrame = {
    import spark.implicits._
    val docs = Tables.documentsDistributed(spark, dir)
      .select($"doc_id",
        Decontaminate.gramHashes(Dedup.tokens($"text"), k).as("grams"))
    val bench = docs.filter($"doc_id" % 31 < nBench)
      .select(concat(lit("bench_"), ($"doc_id" % 31).cast("string"))
        .as("benchmark"), explode_outer($"grams").as("g"))
      .distinct()
    val corpus = docs.filter($"doc_id" % 31 >= nBench)
    val nCorpus = corpus.agg(count(lit(1)).as("n_corpus"))
    corpus.select($"doc_id", explode_outer($"grams").as("g"))
      .join(broadcast(bench), Seq("g"))
      .groupBy($"benchmark", $"doc_id")
      .agg(count(lit(1)).as("n_hit"))
      .groupBy($"benchmark")
      .agg(count(lit(1)).as("contaminated_docs"),
        sum($"n_hit").as("matched_grams"))
      .crossJoin(broadcast(nCorpus))
      .select($"benchmark", $"contaminated_docs", $"matched_grams",
        round($"contaminated_docs".cast("double") / $"n_corpus", 4)
          .as("contamination_rate"))
      .orderBy($"benchmark")
  }

  /** q69 — token-coverage contamination (the Llama-2-style refinement
    * of q57's binary overlap): per contaminated document, the
    * FRACTION of its tokens lying inside benchmark-matching k-grams —
    * the statistic behind "mark a sample dirty above X% token
    * overlap" thresholds, needing positional grams where q57 needs
    * only the distinct set. Coverage is the union length of the
    * matched grams' [pos, pos+k) intervals, computed per document as
    * Σ min(k, nextMatchedPos − pos) via a window lead (last match
    * contributes k), capped at n_tokens for the short-document
    * collapse.
    *
    * Scale shape: q57's exactly — benchmark grams BROADCAST, the
    * corpus-side positional explode is filtered by that broadcast
    * join in the scan stage, so only MATCHED positions reach the
    * window/aggregation (contaminated-docs-only output keeps the
    * exchange tiny). */
  def contaminationCoverage(spark: SparkSession, dir: String,
      k: Int = 13): DataFrame = {
    import spark.implicits._
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"doc_id").orderBy($"pos")
    val docs = Tables.documentsDistributed(spark, dir)
      .select($"doc_id", Dedup.tokens($"text").as("toks"))
      .withColumn("n_tokens", size($"toks").cast("long"))
      .withColumn("kg", graft.expressions.TextHashes.kgramMd5($"toks", k))
    val bench = docs.filter($"doc_id" % 7 === 0)
      .select(explode_outer(array_distinct($"kg")).as("g")).distinct()
    val hits = docs.filter($"doc_id" % 7 =!= 0)
      .select($"doc_id", $"n_tokens",
        posexplode_outer($"kg").as(Seq("pos", "g")))
      .join(broadcast(bench), Seq("g"))
    hits
      .withColumn("cov", least(lit(k.toLong),
        coalesce((lead($"pos", 1).over(w) - $"pos").cast("long"),
          lit(k.toLong))))
      .groupBy($"doc_id")
      .agg(first($"n_tokens").as("n_tokens"),
        count(lit(1)).as("n_hit_positions"),
        sum($"cov").as("s"))
      .select($"doc_id", $"n_tokens", $"n_hit_positions",
        least($"s", $"n_tokens").as("covered_tokens"),
        round(least($"s", $"n_tokens").cast("double") / $"n_tokens", 4)
          .as("coverage"))
      .orderBy($"doc_id")
  }

  /** q115 — SPAN-EXCISION decontamination (the surgical variant of
    * q57: instead of DROPPING a contaminated document, remove the
    * matching k-token spans and KEEP the rest — the approach used
    * when documents are long and contamination is a quoted snippet;
    * Llama-class decontamination excises rather than drops for
    * exactly this reason). Every position whose k-gram is in the
    * benchmark marks tokens [pos, pos+k) removable; the per-document
    * interval union of marked spans comes out, and the report emits
    * the excised text's digest plus removal accounting. Documents
    * shorter than k collapse to one whole-document gram (the
    * gramHashes convention), so a short contaminated document
    * excises entirely — the drop semantics as the limit case.
    *
    * Scale shape: the ONLY shuffle carries matched positions (the
    * q57/q69 broadcast-benchmark argument — the corpus never
    * shuffles); the span union, kept-token filter, and text rebuild
    * are per-row HOFs over each doc's own (small) matched-start
    * list, O(n·|starts|) per row. Clean documents left-join a null
    * start list and pass through untouched. */
  def exciseContaminated(spark: SparkSession, dir: String,
      k: Int = 13): DataFrame = {
    import spark.implicits._
    val docs = Tables.documentsDistributed(spark, dir)
      .select($"doc_id", Dedup.tokens($"text").as("toks"))
      .withColumn("n_tokens", size($"toks").cast("long"))
      .withColumn("kg", graft.expressions.TextHashes.kgramMd5($"toks", k))
    val bench = docs.filter($"doc_id" % 7 === 0)
      .select(explode_outer(array_distinct($"kg")).as("g")).distinct()
    val corpus = docs.filter($"doc_id" % 7 =!= 0)
    val matched = corpus
      .select($"doc_id", posexplode_outer($"kg").as(Seq("pos", "g")))
      .join(broadcast(bench), Seq("g"))
      .groupBy($"doc_id")
      // 1-based token index of each matched gram start
      .agg(sort_array(collect_list($"pos" + 1)).as("starts"))
    corpus.join(matched, Seq("doc_id"), "left")
      .withColumn("starts",
        coalesce($"starts", array().cast("array<int>")))
      .withColumn("kept",
        when($"n_tokens" === 0L, array().cast("array<int>"))
          .otherwise(filter(sequence(lit(1), $"n_tokens".cast("int")),
            j => !exists($"starts", s => j >= s && j < s + k))))
      .select($"doc_id", $"n_tokens",
        ($"n_tokens" - size($"kept")).cast("long").as("n_removed"),
        md5(array_join(transform($"kept", j => element_at($"toks", j)),
          " ")).as("excised_md5"))
      .orderBy($"doc_id")
  }

  /** q58 — repetition quality filter (the Gopher-rule family): per
    * document, the most frequent bigram's share of all bigram slots
    * and the share of trigram slots occupied by repeated trigrams;
    * `repetitive` flags documents where either (4dp-rounded, so both
    * engines compare the same value) share exceeds 0.1. ONE compiled
    * hash-map pass per row per gram size (no explode, no shuffle —
    * graft.expressions.HashKernels.gramRepetitionStats). */
  def repetitionFilter(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val stats = graft.expressions.TextHashes.gramRepetitionStats _
    Tables.documentsDistributed(spark, dir)
      .withColumn("toks", TextAnalysis.tokensOf($"text"))
      .withColumn("bi", stats($"toks", 2))
      .withColumn("tri", stats($"toks", 3))
      .select(
        $"doc_id",
        size($"toks").cast("long").as("n_tokens"),
        $"bi".getItem(1).as("max_bigram_freq"),
        when($"bi".getItem(0) === 0L, lit(0d))
          .otherwise(round($"bi".getItem(1).cast("double") / $"bi".getItem(0), 4))
          .as("top_bigram_frac"),
        when($"tri".getItem(0) === 0L, lit(0d))
          .otherwise(round($"tri".getItem(2).cast("double") / $"tri".getItem(0), 4))
          .as("dup_trigram_frac"))
      .withColumn("repetitive",
        ($"top_bigram_frac" > 0.1 || $"dup_trigram_frac" > 0.1)
          .cast("long"))
      .orderBy($"doc_id")
  }

  /** q59 — PII detection + redaction. The corpus is synthetic word
    * soup with no real PII, so the query first embeds DETERMINISTIC
    * synthetic PII derived from each row (an email always; a phone
    * for doc_id ≡ 0 mod 3; an IPv4 for doc_id ≡ 0 mod 4) — the same
    * construction the oracle performs — then runs the real operator:
    * per-pattern match counts and the md5 of the redacted text
    * ([[graft.ops.Pii]]; order email → IPv4 → phone is pinned). */
  def piiRedaction(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val dirty = concat(
      $"text", lit(" contact "), $"source", lit("."),
      $"doc_id".cast("string"), lit("@example.com"),
      when($"doc_id" % 3 === 0,
        concat(lit(" call 555-"),
          lpad(($"doc_id" % 10000).cast("string"), 4, "0")))
        .otherwise(lit("")),
      when($"doc_id" % 4 === 0,
        concat(lit(" from 10."), ($"doc_id" % 256).cast("string"),
          lit("."), (($"doc_id" * 3) % 256).cast("string"),
          lit("."), (($"doc_id" * 7) % 256).cast("string")))
        .otherwise(lit("")),
      when($"doc_id" % 5 === 0,
        concat(lit(" ssn "), lpad(($"doc_id" % 1000).cast("string"), 3, "0"),
          lit("-"), lpad(($"doc_id" % 100).cast("string"), 2, "0"),
          lit("-"), lpad(($"doc_id" % 10000).cast("string"), 4, "0")))
        .otherwise(lit("")),
      when($"doc_id" % 6 === 0,
        concat(lit(" card 4111-2222-3333-"),
          lpad(($"doc_id" % 10000).cast("string"), 4, "0")))
        .otherwise(lit("")),
      when($"doc_id" % 9 === 0,
        concat(lit(" iban DE"), lpad(($"doc_id" % 100).cast("string"), 2, "0"),
          lit("BANK"), lpad(($"doc_id" % 100000000).cast("string"), 8, "0")))
        .otherwise(lit("")))
    Tables.documentsDistributed(spark, dir)
      .withColumn("dirty", dirty)
      .select(
        $"doc_id",
        Pii.emailCount($"dirty").as("n_emails"),
        Pii.ipv4Count($"dirty").as("n_ips"),
        Pii.phoneCount($"dirty").as("n_phones"),
        Pii.ssnCount($"dirty").as("n_ssns"),
        Pii.creditCardCount($"dirty").as("n_cards"),
        Pii.ibanCount($"dirty").as("n_ibans"),
        md5(Pii.redact($"dirty")).as("redacted_md5"))
      .orderBy($"doc_id")
  }

  /** q70 — corpus-wide paragraph dedup (CCNet's first pass, Wenzek et
    * al. 2020: hash every PARAGRAPH, keep only the first occurrence
    * corpus-wide — the pass that strips boilerplate repeated across
    * pages before any document-level dedup runs). The word-soup
    * corpus has no paragraph structure or repetition, so the query
    * synthesizes both deterministically (the q59/q65 construction): a
    * shared boilerplate paragraph prefixed to doc_id ≡ 0 mod 3, and
    * paragraphs = fixed 10-token chunks. First occurrence = smallest
    * (doc_id, pos) per paragraph hash; output is per-document
    * paragraph accounting plus the digest of the SURVIVING text
    * (order-preserving), so the oracle checks the rebuild too.
    *
    * Scale shape: ONE shuffle keyed by the paragraph hash (the q16
    * exact-dedup window at paragraph granularity — row_number, no
    * self-join), then a per-document aggregation. Chunking and
    * rebuilding are per-row map work. */
  def paragraphDedup(spark: SparkSession, dir: String,
      paraTokens: Int = 10): DataFrame = {
    import spark.implicits._
    val boiler = "subscribe to our newsletter for all the latest updates today"
    val dirty = when($"doc_id" % 3 === 0,
      concat(lit(boiler + " "), $"text")).otherwise($"text")
    val paras = Tables.documentsDistributed(spark, dir)
      .withColumn("toks", Dedup.tokens(dirty))
      .select($"doc_id",
        posexplode_outer(transform(
          sequence(lit(0),
            ceil(size($"toks").cast("double") / paraTokens).cast("int")
              - 1),
          i => array_join(
            slice($"toks", i * paraTokens + 1, lit(paraTokens)), " ")))
          .as(Seq("pos", "para")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(md5($"para")).orderBy($"doc_id", $"pos")
    paras
      .withColumn("keep", row_number().over(w) === 1)
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_paras"),
        sum(when($"keep", 1L).otherwise(0L)).as("n_kept"),
        md5(array_join(transform(
          array_sort(collect_list(when($"keep",
            struct($"pos", $"para")))),
          x => x.getField("para")), " ")).as("kept_md5"))
      .orderBy($"doc_id")
  }

  /** q61 — bigram-LM scoring (the CCNet/KenLM-style perplexity
    * filter): train a maximum-likelihood bigram model ON the corpus,
    * then score each document by its average negative log-probability
    * — high scores mark documents whose word transitions are atypical
    * for the corpus. Scoring the training corpus itself at the
    * default minCount=1 means every bigram is in-vocabulary (MLE
    * needs no smoothing; [[lmScoreSplit]] is the held-out/smoothed
    * deployment shape). Build/score machinery and the 100 TB argument
    * — minCount pruning bounds the model (Heaps' law makes the
    * unpruned bigram table corpus-sized), hint-free scoring join
    * degrades broadcast→shuffle for large models — live in
    * [[graft.ops.LangModel]].
    *
    * The exploded bigram frame feeds both the model build and the
    * scoring probe, so it is localCheckpoint'd — the corpus is
    * scanned and tokenized ONCE (disk-backed blocks; callers free
    * them via Checkpoints.consume like the other checkpointed
    * results). Per-term log-probs use the 2^24 fixed-point
    * quantization so the per-document sum is order-independent (the
    * Lloyd/ADC convention — double sums across partitions are not). */
  def lmScore(spark: SparkSession, dir: String,
      minCount: Long = 1L): DataFrame = {
    import spark.implicits._
    val bg = LangModel.bigrams(
      Tables.documentsDistributed(spark, dir), "doc_id", "text")
      .localCheckpoint()
    LangModel.score(bg, LangModel.train(bg, minCount))
      .orderBy($"doc_id")
  }

  /** q62 — held-out LM scoring with add-one smoothing (the CCNet
    * deployment shape the q61 scaladoc promises): train the bigram
    * model on the doc_id % 5 ≠ 0 slice, score the held-out % 5 = 0
    * slice, where unseen bigrams are the norm and are scored by the
    * Laplace rule ln((c2+1)/(c1+V)) with V = training unigram
    * vocabulary (+1 OOV mass). Emits per-document n_oov beside the
    * smoothed avg_nll — the rows a perplexity-threshold filter
    * consumes. Same fixed-point/ordering discipline as q61; the
    * train/test frames come from one tokenized pass over the corpus
    * (a partition filter on the shared checkpointed bigram frame). */
  def lmScoreSplit(spark: SparkSession, dir: String,
      minCount: Long = 1L): DataFrame = {
    import spark.implicits._
    // ONE scan+tokenize of the corpus: the checkpointed token frame
    // feeds all three consumers (train bigrams, test bigrams, and the
    // vocabulary count — the latter needs unigrams, which the bigram
    // frame alone can't reconstruct: a document's final token appears
    // only as a suffix).
    val toks = Tables.documentsDistributed(spark, dir)
      .select($"doc_id", Dedup.tokens($"text").as("toks"))
      .localCheckpoint()
    val bg = toks.select($"doc_id", explode_outer(
      graft.expressions.TextHashes.tokenGrams($"toks", 2)).as("g"))
    val bgTrain = bg.filter($"doc_id" % 5 =!= 0)
    val bgTest = bg.filter($"doc_id" % 5 === 0)
    // Training vocabulary: distinct unigrams of the train slice, +1
    // for the OOV type — one broadcast row (FullText's corpus-stats
    // pattern).
    val vocab = toks.filter($"doc_id" % 5 =!= 0)
      .select(explode_outer($"toks").as("t"))
      .agg((count_distinct($"t") + 1L).as("v"))
    LangModel.scoreSmoothed(bgTest,
      LangModel.trainCounts(bgTrain, minCount), vocab)
      .orderBy($"doc_id")
  }

  /** q95 — Bloom-filter decontamination (the bounded-broadcast form
    * of q57): build an m-bit Bloom filter over the benchmark's
    * 13-gram hashes ([[graft.ops.BloomFilter]] — see its scaladoc for
    * why the FIXED-size artifact is the 100 TB shape), probe every
    * corpus document with ONE compiled per-row kernel
    * (HashKernels.bloomHitCount — no explode, no join, rides the
    * scan), and report flagged documents with their exact-hit count
    * beside the Bloom count — the FP-calibration view: n_false_pos
    * is what the m-bits choice costs, and a false NEGATIVE is
    * impossible (Bloom filters never miss an inserted gram), so q57's
    * contaminated set is always a subset of q95's flagged set
    * (BloomSpec pins both). The deploy shape is probe-then-verify:
    * the exact gram join runs only for the flagged slice (here the
    * full report, for the oracle's benefit).
    *
    * The gram frame is computed ONCE (localCheckpoint — three
    * consumers: the driver-side benchmark gram list, the Bloom probe
    * scan, and the exact verify); callers free it via
    * Checkpoints.consume like the other checkpointed results. */
  def bloomDecontaminate(spark: SparkSession, dir: String, k: Int = 13,
      mBits: Int = graft.ops.BloomFilter.defaultBits,
      kProbes: Int = graft.ops.BloomFilter.defaultProbes): DataFrame = {
    import spark.implicits._
    val docs = Tables.documentsDistributed(spark, dir)
      .select($"doc_id",
        Decontaminate.gramHashes(Dedup.tokens($"text"), k).as("grams"))
      .localCheckpoint()
    val bench = docs.filter($"doc_id" % 7 === 0)
    val corpus = docs.filter($"doc_id" % 7 =!= 0)
    val bits = graft.ops.BloomFilter.build(
      Decontaminate.benchGramList(bench, "grams"), mBits, kProbes)
    val bloomed = corpus.select($"doc_id",
        size($"grams").cast("long").as("n_grams"),
        graft.expressions.TextHashes
          .bloomHitCount($"grams", bits, kProbes).as("n_bloom_hits"))
      .filter($"n_bloom_hits" > 0)
    val exact = Decontaminate.overlapReport(corpus, bench, "doc_id", "grams")
      .select($"doc_id", $"n_hit".as("n_exact_hits"))
    bloomed.join(exact, Seq("doc_id"), "left")
      .select($"doc_id", $"n_grams", $"n_bloom_hits",
        coalesce($"n_exact_hits", lit(0L)).as("n_exact_hits"))
      .withColumn("n_false_pos", $"n_bloom_hits" - $"n_exact_hits")
      .orderBy($"doc_id")
  }

  /** q91 — perplexity buckets (the CCNet head/middle/tail split,
    * Wenzek et al. 2020): score every document with the corpus bigram
    * LM (q61's machinery), then split EACH SOURCE into three
    * perplexity terciles — the partition CCNet feeds downstream
    * (train on head, mine middle, drop tail). Output is the
    * per-(source, bucket) dataset-card row: doc count, fixed-point
    * mean NLL, min/max NLL.
    *
    * Tercile boundaries come from a 2dp-NLL HISTOGRAM, not a
    * per-document rank: the corpus pays the scoring join plus one
    * (source, bin) aggregation; the cumulative sweep and threshold
    * pick run on the histogram frame (|sources|×|bins| rows —
    * aggregate-scale), and the assignment is a broadcast join back.
    * A per-source ntile/row_number would globally sort each source in
    * a single task — the q66 anti-pattern — while the histogram
    * tercile is exact at bin granularity by construction: every doc
    * in the boundary bin lands in the same bucket, deterministically
    * in both engines (integer ceil-division thresholds; no
    * interpolated-percentile float edge). Mean NLL aggregates the 2^24
    * fixed-point value (the Lloyd/ADC convention) so the partition
    * sum is order-independent. */
  def perplexityBuckets(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val bg = LangModel.bigrams(
      Tables.documentsDistributed(spark, dir), "doc_id", "text")
      .localCheckpoint()
    val scored = LangModel.score(bg, LangModel.train(bg, 1L))
    val s = scored
      .join(Tables.documents(spark, dir).select($"doc_id", $"source"),
        Seq("doc_id"))
      .withColumn("bin", round($"avg_nll" * 100).cast("long"))
      .withColumn("nll_fp", round($"avg_nll" * 16777216.0).cast("long"))
    val hist = s.groupBy($"source", $"bin").agg(count(lit(1)).as("c"))
    val wCum = org.apache.spark.sql.expressions.Window
      .partitionBy($"source").orderBy($"bin")
    val wAll = org.apache.spark.sql.expressions.Window
      .partitionBy($"source")
    val th = hist
      .withColumn("cum", sum($"c").over(wCum))
      .withColumn("n", sum($"c").over(wAll))
      .groupBy($"source")
      .agg(
        min(when(expr("cum >= (n + 2) DIV 3"), $"bin")).as("t1"),
        min(when(expr("cum >= (2 * n + 2) DIV 3"), $"bin")).as("t2"))
    s.join(broadcast(th), Seq("source"))
      .withColumn("bucket",
        when($"bin" <= $"t1", "head")
          .when($"bin" <= $"t2", "middle")
          .otherwise("tail"))
      .groupBy($"source", $"bucket")
      .agg(count(lit(1)).as("n_docs"),
        round((sum($"nll_fp").cast("double") / 16777216.0) /
          count(lit(1)), 4).as("mean_nll"),
        min($"avg_nll").as("min_nll"),
        max($"avg_nll").as("max_nll"))
      .orderBy($"source", $"bucket")
  }

  /** q65 — C4-style line-level boilerplate filter
    * ([[graft.ops.LineFilter]]): the corpus being single-line word
    * soup, the query first builds a DETERMINISTIC line-structured
    * document per row (the q59 synthetic-PII construction): the
    * original text terminated as a prose line, plus a navigation bar
    * (doc_id ≡ 0 mod 2 — no terminal punctuation), a javascript
    * shell (mod 5 — marker word), and a too-short line (mod 4) —
    * then runs the real operator and reports per-document line
    * accounting plus the cleaned-text digest. Pure per-row map, no
    * shuffle. */
  def lineFilter(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val dirty = concat(
      $"text", lit("."),
      when($"doc_id" % 2 === 0, lit("\nhome | about | contact"))
        .otherwise(lit("")),
      when($"doc_id" % 5 === 0,
        lit("\nplease enable javascript to view this page."))
        .otherwise(lit("")),
      when($"doc_id" % 4 === 0, lit("\nok.")).otherwise(lit("")))
    Tables.documentsDistributed(spark, dir)
      .withColumn("t", dirty)
      .select(
        $"doc_id",
        size(graft.ops.LineFilter.lines($"t")).cast("long").as("n_lines"),
        size(graft.ops.LineFilter.keptLines($"t")).cast("long")
          .as("n_kept"),
        md5(graft.ops.LineFilter.clean($"t")).as("clean_md5"))
      .orderBy($"doc_id")
  }

  /** q83 — markup/format-density filter ([[graft.ops.Markup]]): the
    * "HTML leftovers" pass of a web pipeline (RefinedWeb/FineWeb) —
    * tag count, code-fence count, Markdown-link count, tag density
    * per token, and a keep flag (density ≤ 0.02 and no code fences).
    * The corpus being clean word soup, the query first injects
    * DETERMINISTIC markup per row (the q59/q65 construction): an
    * HTML wrapper + anchor for doc_id ≡ 0 mod 3, a Markdown link for
    * mod 5, a fenced code block for mod 7 — then runs the real
    * counters. Pure per-row scan work; the keep boundary compares the
    * 4dp-ROUNDED density in both engines. */
  def markupFilter(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val dirty = concat(
      when($"doc_id" % 3 === 0, lit("<div class=\"content\">"))
        .otherwise(lit("")),
      $"text",
      when($"doc_id" % 3 === 0,
        lit(" <a href=\"http://x.example\">link</a></div>"))
        .otherwise(lit("")),
      when($"doc_id" % 5 === 0, lit(" [see](http://e.example)"))
        .otherwise(lit("")),
      when($"doc_id" % 7 === 0, lit("\n```\nvar x = 1;\n```"))
        .otherwise(lit("")))
    Tables.documentsDistributed(spark, dir)
      .withColumn("t", dirty)
      .withColumn("n_tokens", size(Dedup.tokens($"t")).cast("long"))
      .select($"doc_id", $"n_tokens",
        graft.ops.Markup.tagCount($"t").as("n_tags"),
        graft.ops.Markup.fenceCount($"t").as("n_fences"),
        graft.ops.Markup.mdLinkCount($"t").as("n_mdlinks"),
        round(graft.ops.Markup.tagCount($"t").cast("double") / $"n_tokens", 4)
          .as("tag_density"))
      .withColumn("keep",
        ($"tag_density" <= 0.02 && $"n_fences" === 0L).cast("long"))
      .orderBy($"doc_id")
  }

  /** q88 — URL/domain accounting ([[graft.ops.Urls]]): per-domain URL
    * and document counts plus the blocklist flag — the link-hygiene
    * card a web pipeline builds before applying URL blocklists and
    * per-domain volume caps (the filters that run BEFORE any text
    * rule in C4/RefinedWeb). The corpus being clean word soup, the
    * query injects DETERMINISTIC URLs per row (the q59/q65
    * construction): a site{doc_id mod 5}.example content link for
    * even doc_ids, an ads.example tracker link for doc_id ≡ 0 mod 11
    * — then runs the real extractor. Extraction rides the scan; the
    * rollup is one domains-sized aggregation (Heaps-sublinear in
    * corpus size). */
  def urlDomainReport(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val withUrls = concat(
      $"text",
      when($"doc_id" % 2 === 0,
        concat(lit(" http://site"), ($"doc_id" % 5).cast("string"),
          lit(".example/p/"), $"doc_id".cast("string")))
        .otherwise(lit("")),
      when($"doc_id" % 11 === 0,
        concat(lit(" https://ads.example/track?id="),
          $"doc_id".cast("string")))
        .otherwise(lit("")))
    Tables.documentsDistributed(spark, dir)
      .withColumn("t", withUrls)
      .select($"doc_id", explode(graft.ops.Urls.extractUrls($"t")).as("url"))
      .withColumn("domain", graft.ops.Urls.domainOf($"url"))
      .groupBy($"domain")
      .agg(count(lit(1)).as("n_urls"),
        count_distinct($"doc_id").as("n_docs"))
      .withColumn("blocked", graft.ops.Urls.blocked($"domain"))
      .orderBy($"domain")
  }

  /** The q72/q73 "reference slice" convention: sources src0–src4 play
    * Wikipedia (the high-quality/target class of CCNet and DSIR), the
    * other fifteen sources play the raw crawl. Deterministic in both
    * engines — the class is a pure function of the source suffix. */
  private def targetCls = (regexp_extract(col("source"), "(\\d+)$", 1)
    .cast("int") < 5).cast("int")

  /** q72 — Naive-Bayes quality classifier (the counting analog of
    * CCNet's fastText Wikipedia-vs-crawl filter; machinery and the
    * 100 TB argument in [[graft.ops.Classifier]]): train class-
    * conditional token models on the src0–src4-vs-rest labels, then
    * score every document's class log-likelihoods and arg-max. The
    * exploded token frame feeds build and probe, so it is
    * localCheckpoint'd — ONE corpus scan+tokenize (the q61
    * convention); the prior pass re-reads only the `source` column
    * (column-pruned scan, no tokenization). */
  def nbQuality(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val tk = Classifier.tokenFrame(
      Tables.documentsDistributed(spark, dir), "doc_id", "text", targetCls)
      .localCheckpoint()
    val priors = Tables.documents(spark, dir)
      .agg(sum(when(targetCls === 1, 1L).otherwise(0L)).as("n1"),
        sum(when(targetCls === 0, 1L).otherwise(0L)).as("n0"))
    Classifier.scoreNaiveBayes(tk, Classifier.trainNaiveBayes(tk), priors)
      .orderBy($"doc_id")
  }

  /** q137 — classifier calibration card (the threshold sweep every
    * deployed quality filter ships with): q72's Naive-Bayes
    * log-odds margin (ll_target − ll_other, prior included) swept
    * over a fixed threshold grid, reporting tp/fp/fn and
    * precision/recall/F1 against the true src0–src4 label at each
    * cut — the card that picks the filter's operating point (CCNet
    * keeps the "head" by exactly such a margin threshold). Margins
    * stay in the q72 fixed-point domain (×2²⁴ BIGINT sums), so the
    * threshold compare is integer-exact in both engines.
    *
    * Scale shape: q72's exactly (one checkpointed token frame feeds
    * model build and probe; the model is vocabulary-sized) — plus a
    * 9-row threshold broadcast whose per-doc expansion collapses in
    * the map-side partial aggregation (9 counter rows per
    * partition, not 9× the corpus in the exchange). */
  def classifierCalibration(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val fpc = 16777216d
    val tk = Classifier.tokenFrame(
      Tables.documentsDistributed(spark, dir), "doc_id", "text", targetCls)
      .localCheckpoint()
    val model = Classifier.trainNaiveBayes(tk)
    val priors = Tables.documents(spark, dir)
      .agg(sum(when(targetCls === 1, 1L).otherwise(0L)).as("n1"),
        sum(when(targetCls === 0, 1L).otherwise(0L)).as("n0"))
    val pr = priors.select(
      round(log($"n1".cast("double") / ($"n1" + $"n0")) * fpc)
        .cast("long").as("p1_fp"),
      round(log($"n0".cast("double") / ($"n1" + $"n0")) * fpc)
        .cast("long").as("p0_fp"))
    val scored = tk.join(model, Seq("t"))
      .groupBy($"doc_id", $"cls")
      .agg(sum($"lnp1_fp").as("s1"), sum($"lnp0_fp").as("s0"))
      .crossJoin(broadcast(pr))
      .select($"cls",
        ($"s1" + $"p1_fp" - $"s0" - $"p0_fp").as("margin_fp"))
    val ths = Seq(-20L, -10L, -5L, -2L, 0L, 2L, 5L, 10L, 20L)
      .toDF("thr")
    scored.crossJoin(broadcast(ths))
      .withColumn("pred",
        ($"margin_fp" > $"thr" * 16777216L).cast("int"))
      .groupBy($"thr")
      .agg(
        sum(when($"pred" === 1 && $"cls" === 1, 1L).otherwise(0L)).as("tp"),
        sum(when($"pred" === 1 && $"cls" === 0, 1L).otherwise(0L)).as("fp"),
        sum(when($"pred" === 0 && $"cls" === 1, 1L).otherwise(0L)).as("fn"))
      .select($"thr", $"tp", $"fp", $"fn",
        when($"tp" + $"fp" === 0, lit(null).cast("double"))
          .otherwise(round($"tp".cast("double") / ($"tp" + $"fp"), 4))
          .as("precision"),
        when($"tp" + $"fn" === 0, lit(null).cast("double"))
          .otherwise(round($"tp".cast("double") / ($"tp" + $"fn"), 4))
          .as("recall"),
        when(lit(2L) * $"tp" + $"fp" + $"fn" === 0,
          lit(null).cast("double"))
          .otherwise(round(lit(2.0) * $"tp" /
            (lit(2L) * $"tp" + $"fp" + $"fn"), 4)).as("f1"))
      .orderBy($"thr")
  }

  /** q73 — DSIR importance weights (Xie et al. 2023): hashed-bigram
    * bucket models of the target (src0–src4) and raw slices, then
    * each RAW document's log importance weight Σ ln(p_t(b)/p_r(b))
    * and the deterministic keep rule logw > 0. The bucketed feature
    * frame is localCheckpoint'd — it feeds the model build and the
    * raw-side probe from one corpus scan; the model is ≤ `buckets`
    * rows BY CONSTRUCTION (the fixed-B hashing is DSIR's point — the
    * model side never grows with the corpus, unlike q61's pruned LM
    * which merely saturates). */
  def dsirWeights(spark: SparkSession, dir: String,
      buckets: Int = 1024): DataFrame = {
    import spark.implicits._
    val feats = Tables.documentsDistributed(spark, dir)
      .select($"doc_id", targetCls.as("cls"), explode_outer(
        graft.expressions.TextHashes.tokenGrams(Dedup.tokens($"text"), 2))
        .as("g"))
      .filter($"g".isNotNull)
      .select($"doc_id", $"cls",
        Classifier.featureBucket($"g", buckets).as("b"))
      .localCheckpoint()
    Classifier.dsirWeights(
      feats.filter($"cls" === 0).select($"doc_id", $"b"),
      Classifier.dsirLogRatios(feats, buckets))
      .orderBy($"doc_id")
  }

  /** Shared 13-token-gram oracle fragment (the GPT-3/PaLM
    * decontamination convention, mirroring Decontaminate.gramHashes):
    * distinct md5 grams of `src(doc_id, $tokCol)`, short documents
    * collapsing to one whole-document gram. Composed by q57 and the
    * q63 sweep. */
  private[queries] def gramCte(name: String, src: String,
      tokCol: String = "tokens"): String =
    s"""$name AS (SELECT doc_id, CASE WHEN len($tokCol) >= 13
       |  THEN list_distinct(list_transform(
       |         generate_series(1, len($tokCol) - 12),
       |         i -> md5(array_to_string($tokCol[i:i+12], ' '))))
       |  ELSE [md5(array_to_string($tokCol[1:13], ' '))] END AS grams
       | FROM $src)""".stripMargin

  /** Shared Gopher-repetition oracle fragment over any source CTE
    * `src(doc_id, tokens)` — defines `rep_f(doc_id, n_tokens, max_bi,
    * top_bigram_frac, dup_trigram_frac)`, mirroring
    * `TextHashes.gramRepetitionStats` + the q58 fraction math. q58 and
    * the q63 sweep compose this one fragment (the DedupQueries CTE
    * discipline: a rule change reaches every oracle from one place). */
  private[queries] def repCtes(src: String): String =
    s"""rep_g AS (SELECT doc_id, len(tokens) AS n_tokens,
       |  CASE WHEN len(tokens) >= 2
       |    THEN list_transform(generate_series(1, len(tokens) - 1),
       |           i -> array_to_string(tokens[i:i+1], ' '))
       |    ELSE [] END AS bi,
       |  CASE WHEN len(tokens) >= 3
       |    THEN list_transform(generate_series(1, len(tokens) - 2),
       |           i -> array_to_string(tokens[i:i+2], ' '))
       |    ELSE [] END AS tri
       | FROM $src),
       |rep_m AS (SELECT doc_id, n_tokens,
       |  COALESCE(list_max(list_transform(list_distinct(bi),
       |    d -> len(list_filter(bi, x -> x = d)))), 0) AS max_bi,
       |  len(bi) AS n_bi,
       |  COALESCE(len(list_filter(tri,
       |    t -> len(list_filter(tri, x -> x = t)) > 1)), 0) AS dup_tri,
       |  len(tri) AS n_tri
       | FROM rep_g),
       |rep_f AS (SELECT doc_id, n_tokens, max_bi,
       |  CASE WHEN n_bi = 0 THEN 0
       |       ELSE round(max_bi::DOUBLE / n_bi, 4) END AS top_bigram_frac,
       |  CASE WHEN n_tri = 0 THEN 0
       |       ELSE round(dup_tri::DOUBLE / n_tri, 4) END AS dup_trigram_frac
       | FROM rep_m)""".stripMargin

  /** Shared (doc_id, cls, tokens) oracle CTE — toksCte plus the
    * q72/q73 src0–src4 target label. */
  private[queries] val clsToksCte =
    """ctoks AS (SELECT doc_id,
      |  CASE WHEN CAST(regexp_extract(source, '(\d+)$', 1) AS INT) < 5
      |       THEN 1 ELSE 0 END AS cls,
      |  list_filter(string_split_regex(lower(text), '\s+'),
      |              t -> length(t) > 0) AS tokens
      | FROM documents)""".stripMargin

  val oracles: Map[String, String] = Map(
    // q95's oracle re-derives Bloom semantics without a bitset: a bit
    // is set iff SOME benchmark gram set it, so "all kProbes positions
    // set" ≡ "all kProbes positions ∈ the benchmark position set" —
    // pure md5/int math both engines share. m and kProbes interpolate
    // from BloomFilter's constants (the Pii convention).
    "q95_bloom_decontaminate" ->
      s"""WITH ${DedupQueries.toksCte},
         |${gramCte("kg", "toks")},
         |bench AS (SELECT DISTINCT unnest(grams) AS g FROM kg
         |          WHERE doc_id % 7 = 0),
         |bpos AS (SELECT DISTINCT
         |    CAST(('0x' || substr(md5(g || '#' || i), 1, 8)) AS BIGINT)
         |      % ${graft.ops.BloomFilter.defaultBits} AS p
         |  FROM bench CROSS JOIN
         |    unnest(generate_series(0,
         |      ${graft.ops.BloomFilter.defaultProbes - 1})) t(i)),
         |cg AS (SELECT doc_id, len(grams) AS n_grams, unnest(grams) AS g
         |       FROM kg WHERE doc_id % 7 <> 0),
         |probe AS (SELECT doc_id, n_grams, g, i,
         |    CAST(('0x' || substr(md5(g || '#' || i), 1, 8)) AS BIGINT)
         |      % ${graft.ops.BloomFilter.defaultBits} AS p
         |  FROM cg CROSS JOIN
         |    unnest(generate_series(0,
         |      ${graft.ops.BloomFilter.defaultProbes - 1})) t(i)),
         |gh AS (SELECT doc_id, any_value(n_grams) AS n_grams, g
         |  FROM probe JOIN bpos USING (p)
         |  GROUP BY doc_id, g
         |  HAVING count(*) = ${graft.ops.BloomFilter.defaultProbes}),
         |bl AS (SELECT doc_id, any_value(n_grams) AS n_grams,
         |         count(*) AS n_bloom_hits
         |       FROM gh GROUP BY doc_id),
         |ex AS (SELECT doc_id, count(*) AS n_exact_hits
         |       FROM cg JOIN bench USING (g) GROUP BY doc_id)
         |SELECT bl.doc_id, CAST(bl.n_grams AS BIGINT) AS n_grams,
         |  bl.n_bloom_hits,
         |  COALESCE(ex.n_exact_hits, 0) AS n_exact_hits,
         |  bl.n_bloom_hits - COALESCE(ex.n_exact_hits, 0) AS n_false_pos
         |FROM bl LEFT JOIN ex USING (doc_id)
         |ORDER BY doc_id""".stripMargin,
    // q91 rebuilds q61's LM-scoring CTEs, then derives per-source
    // tercile thresholds from the 2dp histogram exactly as the Spark
    // side does (integer ceil-division over the cumulative bin sweep).
    "q91_perplexity_buckets" ->
      s"""WITH ${DedupQueries.toksCte},
         |bg AS (SELECT doc_id, unnest(
         |    CASE WHEN len(tokens) >= 2
         |      THEN list_transform(generate_series(1, len(tokens) - 1),
         |             i -> array_to_string(tokens[i:i+1], ' '))
         |      ELSE [] END) AS g
         |  FROM toks),
         |lm0 AS (SELECT g, count(*) AS c2 FROM bg GROUP BY g),
         |lm AS (SELECT g,
         |    CAST(round(ln(c2::DOUBLE /
         |      SUM(c2) OVER (PARTITION BY split_part(g, ' ', 1)))
         |      * 16777216.0) AS BIGINT) AS lnp_fp
         |  FROM lm0),
         |sc AS (SELECT b.doc_id,
         |    round(-(CAST(SUM(l.lnp_fp) AS BIGINT)::DOUBLE / 16777216.0)
         |      / count(*), 4) AS avg_nll
         |  FROM bg b JOIN lm l USING (g) GROUP BY b.doc_id),
         |s AS (SELECT sc.doc_id, d.source, avg_nll,
         |    CAST(round(avg_nll * 100) AS BIGINT) AS bin,
         |    CAST(round(avg_nll * 16777216.0) AS BIGINT) AS nll_fp
         |  FROM sc JOIN documents d ON sc.doc_id = d.doc_id),
         |hist AS (SELECT source, bin, count(*) AS c FROM s
         |         GROUP BY source, bin),
         |cum AS (SELECT source, bin,
         |    SUM(c) OVER (PARTITION BY source ORDER BY bin) AS cum,
         |    SUM(c) OVER (PARTITION BY source) AS n
         |  FROM hist),
         |th AS (SELECT source,
         |    min(CASE WHEN cum >= (n + 2) // 3 THEN bin END) AS t1,
         |    min(CASE WHEN cum >= (2 * n + 2) // 3 THEN bin END) AS t2
         |  FROM cum GROUP BY source),
         |a AS (SELECT s.source, avg_nll, nll_fp,
         |    CASE WHEN bin <= t1 THEN 'head'
         |         WHEN bin <= t2 THEN 'middle'
         |         ELSE 'tail' END AS bucket
         |  FROM s JOIN th USING (source))
         |SELECT source, bucket, count(*) AS n_docs,
         |  round((CAST(SUM(nll_fp) AS BIGINT)::DOUBLE / 16777216.0)
         |    / count(*), 4) AS mean_nll,
         |  min(avg_nll) AS min_nll, max(avg_nll) AS max_nll
         |FROM a GROUP BY source, bucket
         |ORDER BY source, bucket""".stripMargin,
    // URL regexes and the blocklist interpolate from Urls' constants
    // (the Pii convention) — engines cannot drift.
    "q88_url_domains" ->
      s"""WITH d AS (SELECT doc_id,
         |  text ||
         |  CASE WHEN doc_id % 2 = 0
         |    THEN ' http://site' || CAST(doc_id % 5 AS VARCHAR) ||
         |         '.example/p/' || CAST(doc_id AS VARCHAR)
         |    ELSE '' END ||
         |  CASE WHEN doc_id % 11 = 0
         |    THEN ' https://ads.example/track?id=' ||
         |         CAST(doc_id AS VARCHAR)
         |    ELSE '' END AS t
         | FROM documents),
         |u AS (SELECT doc_id,
         |    unnest(regexp_extract_all(t, '${graft.ops.Urls.urlPattern}'))
         |      AS url
         |  FROM d),
         |x AS (SELECT doc_id,
         |    regexp_extract(url, '${graft.ops.Urls.domainPattern}', 1)
         |      AS domain
         |  FROM u)
         |SELECT domain, COUNT(*) AS n_urls,
         |  COUNT(DISTINCT doc_id) AS n_docs,
         |  CAST(CASE WHEN domain IN (${graft.ops.Urls.blocklist
              .map(d => s"'$d'").mkString(", ")})
         |       THEN 1 ELSE 0 END AS BIGINT) AS blocked
         |FROM x GROUP BY domain ORDER BY domain""".stripMargin,
    // Markup regexes interpolate from Markup's constants (the Pii
    // convention) — engines cannot drift.
    "q83_markup_filter" ->
      s"""WITH d AS (SELECT doc_id,
         |  CASE WHEN doc_id % 3 = 0 THEN '<div class="content">'
         |       ELSE '' END ||
         |  text ||
         |  CASE WHEN doc_id % 3 = 0
         |    THEN ' <a href="http://x.example">link</a></div>'
         |    ELSE '' END ||
         |  CASE WHEN doc_id % 5 = 0 THEN ' [see](http://e.example)'
         |       ELSE '' END ||
         |  CASE WHEN doc_id % 7 = 0
         |    THEN chr(10) || '${"```"}' || chr(10) || 'var x = 1;' ||
         |         chr(10) || '${"```"}'
         |    ELSE '' END AS t
         | FROM documents),
         |m AS (SELECT doc_id,
         |  CAST(len(list_filter(string_split_regex(lower(t), '\\s+'),
         |    x -> length(x) > 0)) AS BIGINT) AS n_tokens,
         |  CAST(len(regexp_extract_all(t, '${graft.ops.Markup.tagPattern}'))
         |    AS BIGINT) AS n_tags,
         |  CAST(len(regexp_extract_all(t, '${graft.ops.Markup.fencePattern}'))
         |    AS BIGINT) AS n_fences,
         |  CAST(len(regexp_extract_all(t,
         |    '${graft.ops.Markup.mdLinkPattern}')) AS BIGINT) AS n_mdlinks
         | FROM d),
         |r AS (SELECT doc_id, n_tokens, n_tags, n_fences, n_mdlinks,
         |  round(n_tags::DOUBLE / n_tokens, 4) AS tag_density FROM m)
         |SELECT doc_id, n_tokens, n_tags, n_fences, n_mdlinks, tag_density,
         |  CAST(CASE WHEN tag_density <= 0.02 AND n_fences = 0
         |       THEN 1 ELSE 0 END AS BIGINT) AS keep
         |FROM r ORDER BY doc_id""".stripMargin,
    "q72_nb_quality" ->
      s"""WITH $clsToksCte,
         |tk AS (SELECT doc_id, cls, unnest(tokens) AS t FROM ctoks),
         |m AS (SELECT t,
         |    SUM(CASE WHEN cls = 1 THEN 1 ELSE 0 END) AS c1,
         |    SUM(CASE WHEN cls = 0 THEN 1 ELSE 0 END) AS c0
         |  FROM tk GROUP BY t),
         |g AS (SELECT SUM(c1) AS tot1, SUM(c0) AS tot0, COUNT(*) AS v
         |      FROM m),
         |lm AS (SELECT t,
         |    CAST(round(ln((c1 + 1.0) / (tot1 + v)) * 16777216.0)
         |      AS BIGINT) AS lnp1,
         |    CAST(round(ln((c0 + 1.0) / (tot0 + v)) * 16777216.0)
         |      AS BIGINT) AS lnp0
         |  FROM m, g),
         |pr0 AS (SELECT SUM(CASE WHEN cls = 1 THEN 1 ELSE 0 END) AS n1,
         |        SUM(CASE WHEN cls = 0 THEN 1 ELSE 0 END) AS n0
         |        FROM ctoks),
         |pr AS (SELECT
         |    CAST(round(ln(n1::DOUBLE / (n1 + n0)) * 16777216.0)
         |      AS BIGINT) AS p1,
         |    CAST(round(ln(n0::DOUBLE / (n1 + n0)) * 16777216.0)
         |      AS BIGINT) AS p0
         |  FROM pr0),
         |sc AS (SELECT doc_id, COUNT(*) AS n_tokens,
         |    SUM(lnp1) AS s1, SUM(lnp0) AS s0
         |  FROM tk JOIN lm USING (t) GROUP BY doc_id)
         |SELECT doc_id, n_tokens,
         |  round((s1 + p1)::DOUBLE / 16777216.0, 4) AS ll_target,
         |  round((s0 + p0)::DOUBLE / 16777216.0, 4) AS ll_other,
         |  CAST(CASE WHEN s1 + p1 > s0 + p0 THEN 1 ELSE 0 END AS BIGINT)
         |    AS pred
         |FROM sc, pr ORDER BY doc_id""".stripMargin,
    "q137_classifier_calibration" ->
      s"""WITH $clsToksCte,
         |tk AS (SELECT doc_id, cls, unnest(tokens) AS t FROM ctoks),
         |m AS (SELECT t,
         |    SUM(CASE WHEN cls = 1 THEN 1 ELSE 0 END) AS c1,
         |    SUM(CASE WHEN cls = 0 THEN 1 ELSE 0 END) AS c0
         |  FROM tk GROUP BY t),
         |g AS (SELECT SUM(c1) AS tot1, SUM(c0) AS tot0, COUNT(*) AS v
         |      FROM m),
         |lm AS (SELECT t,
         |    CAST(round(ln((c1 + 1.0) / (tot1 + v)) * 16777216.0)
         |      AS BIGINT) AS lnp1,
         |    CAST(round(ln((c0 + 1.0) / (tot0 + v)) * 16777216.0)
         |      AS BIGINT) AS lnp0
         |  FROM m, g),
         |pr0 AS (SELECT SUM(CASE WHEN cls = 1 THEN 1 ELSE 0 END) AS n1,
         |        SUM(CASE WHEN cls = 0 THEN 1 ELSE 0 END) AS n0
         |        FROM ctoks),
         |pr AS (SELECT
         |    CAST(round(ln(n1::DOUBLE / (n1 + n0)) * 16777216.0)
         |      AS BIGINT) AS p1,
         |    CAST(round(ln(n0::DOUBLE / (n1 + n0)) * 16777216.0)
         |      AS BIGINT) AS p0
         |  FROM pr0),
         |sc AS (SELECT doc_id, ANY_VALUE(cls) AS cls,
         |    SUM(lnp1) AS s1, SUM(lnp0) AS s0
         |  FROM tk JOIN lm USING (t) GROUP BY doc_id),
         |mg AS (SELECT cls, s1 + p1 - s0 - p0 AS margin_fp
         |  FROM sc, pr),
         |th AS (SELECT unnest([-20, -10, -5, -2, 0, 2, 5, 10, 20])
         |    AS thr),
         |ct AS (SELECT thr,
         |    CAST(SUM(CASE WHEN margin_fp > thr * 16777216 AND cls = 1
         |      THEN 1 ELSE 0 END) AS BIGINT) AS tp,
         |    CAST(SUM(CASE WHEN margin_fp > thr * 16777216 AND cls = 0
         |      THEN 1 ELSE 0 END) AS BIGINT) AS fp,
         |    CAST(SUM(CASE WHEN margin_fp <= thr * 16777216 AND cls = 1
         |      THEN 1 ELSE 0 END) AS BIGINT) AS fn
         |  FROM mg CROSS JOIN th GROUP BY thr)
         |SELECT CAST(thr AS BIGINT) AS thr, tp, fp, fn,
         |  CASE WHEN tp + fp = 0 THEN NULL
         |    ELSE round(tp::DOUBLE / (tp + fp), 4) END AS precision,
         |  CASE WHEN tp + fn = 0 THEN NULL
         |    ELSE round(tp::DOUBLE / (tp + fn), 4) END AS recall,
         |  CASE WHEN 2 * tp + fp + fn = 0 THEN NULL
         |    ELSE round(2.0 * tp / (2 * tp + fp + fn), 4) END AS f1
         |FROM ct ORDER BY thr""".stripMargin,
    "q73_dsir_weights" ->
      s"""WITH $clsToksCte,
         |bg AS (SELECT doc_id, cls, unnest(
         |    CASE WHEN len(tokens) >= 2
         |      THEN list_transform(generate_series(1, len(tokens) - 1),
         |             i -> array_to_string(tokens[i:i+1], ' '))
         |      ELSE [] END) AS g
         |  FROM ctoks),
         |f AS (SELECT doc_id, cls,
         |    CAST(('0x' || substr(md5(g), 1, 8)) AS BIGINT) % 1024 AS b
         |  FROM bg),
         |c AS (SELECT b,
         |    SUM(CASE WHEN cls = 1 THEN 1 ELSE 0 END) AS ct,
         |    SUM(CASE WHEN cls = 0 THEN 1 ELSE 0 END) AS cr
         |  FROM f GROUP BY b),
         |g2 AS (SELECT SUM(ct) AS tott, SUM(cr) AS totr FROM c),
         |r AS (SELECT b,
         |    CAST(round(ln((ct + 1.0) / (tott + 1024)) * 16777216.0)
         |      AS BIGINT)
         |    - CAST(round(ln((cr + 1.0) / (totr + 1024)) * 16777216.0)
         |        AS BIGINT) AS lr
         |  FROM c, g2),
         |s AS (SELECT doc_id, COUNT(*) AS n_feats, SUM(lr) AS sw
         |  FROM f JOIN r USING (b) WHERE cls = 0 GROUP BY doc_id)
         |SELECT doc_id, n_feats,
         |  round(sw::DOUBLE / 16777216.0, 4) AS logw,
         |  CAST(CASE WHEN sw > 0 THEN 1 ELSE 0 END AS BIGINT) AS keep
         |FROM s ORDER BY doc_id""".stripMargin,
    "q115_excise_contaminated" ->
      s"""WITH ${DedupQueries.toksCte},
         |pg AS (SELECT doc_id, CASE WHEN len(tokens) >= 13
         |  THEN list_transform(generate_series(1, len(tokens) - 12),
         |         i -> md5(array_to_string(tokens[i:i+12], ' ')))
         |  ELSE [md5(array_to_string(tokens[1:13], ' '))] END AS grams
         | FROM toks),
         |bench AS (SELECT DISTINCT unnest(list_distinct(grams)) AS g
         |  FROM pg WHERE doc_id % 7 = 0),
         |pos AS (SELECT pg.doc_id, t.i AS start, pg.grams[t.i] AS g
         |  FROM pg, unnest(generate_series(1, len(pg.grams))) t(i)
         |  WHERE pg.doc_id % 7 <> 0),
         |m AS (SELECT doc_id, list(start ORDER BY start) AS starts
         |  FROM pos JOIN bench USING (g) GROUP BY doc_id),
         |x AS (SELECT tk.doc_id, tk.tokens,
         |    CAST(len(tk.tokens) AS BIGINT) AS n,
         |    COALESCE(m.starts, []::BIGINT[]) AS starts
         |  FROM toks tk LEFT JOIN m USING (doc_id)
         |  WHERE tk.doc_id % 7 <> 0),
         |kc AS (SELECT doc_id, tokens, n,
         |    list_filter(generate_series(1, n),
         |      j -> len(list_filter(starts,
         |             s -> j >= s AND j < s + 13)) = 0) AS kept
         |  FROM x)
         |SELECT doc_id, n AS n_tokens,
         |  CAST(n - len(kept) AS BIGINT) AS n_removed,
         |  md5(COALESCE(array_to_string(
         |    list_transform(kept, j -> tokens[j]), ' '), ''))
         |    AS excised_md5
         |FROM kc ORDER BY doc_id""".stripMargin,
    "q57_decontaminate" ->
      s"""WITH ${DedupQueries.toksCte},
         |${gramCte("kg", "toks")},
         |bench AS (SELECT DISTINCT unnest(grams) AS g FROM kg
         |          WHERE doc_id % 7 = 0),
         |corpus AS (SELECT doc_id, len(grams) AS n_grams,
         |             unnest(grams) AS g
         |           FROM kg WHERE doc_id % 7 <> 0)
         |SELECT doc_id, CAST(any_value(n_grams) AS BIGINT) AS n_grams,
         |  count(*) AS n_hit,
         |  round(count(*)::DOUBLE / any_value(n_grams), 4) AS contamination
         |FROM corpus JOIN bench USING (g)
         |GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    // q120: q57's gram CTEs, benches tagged by suite, one corpus
    // join attributing every match to its suite(s)
    "q120_multi_bench_contamination" ->
      s"""WITH ${DedupQueries.toksCte},
         |${gramCte("kg", "toks")},
         |bench AS (SELECT DISTINCT 'bench_' || (doc_id % 31) AS benchmark,
         |    unnest(grams) AS g
         |  FROM kg WHERE doc_id % 31 < 3),
         |corpus AS (SELECT doc_id, unnest(grams) AS g
         |  FROM kg WHERE doc_id % 31 >= 3),
         |n AS (SELECT COUNT(*) AS n_corpus FROM kg WHERE doc_id % 31 >= 3),
         |perdoc AS (SELECT b.benchmark, c.doc_id, COUNT(*) AS n_hit
         |  FROM corpus c JOIN bench b USING (g)
         |  GROUP BY b.benchmark, c.doc_id)
         |SELECT benchmark,
         |  CAST(COUNT(*) AS BIGINT) AS contaminated_docs,
         |  CAST(SUM(n_hit) AS BIGINT) AS matched_grams,
         |  round(COUNT(*)::DOUBLE / any_value(n.n_corpus), 4)
         |    AS contamination_rate
         |FROM perdoc CROSS JOIN n
         |GROUP BY benchmark ORDER BY benchmark""".stripMargin,
    "q58_repetition_filter" ->
      s"""WITH ${DedupQueries.toksCte},
         |${repCtes("toks")}
         |SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
         |  CAST(max_bi AS BIGINT) AS max_bigram_freq,
         |  top_bigram_frac, dup_trigram_frac,
         |  CAST(CASE WHEN top_bigram_frac > 0.1 OR dup_trigram_frac > 0.1
         |       THEN 1 ELSE 0 END AS BIGINT) AS repetitive
         |FROM rep_f ORDER BY doc_id""".stripMargin,
    "q61_lm_score" ->
      s"""WITH ${DedupQueries.toksCte},
         |bg AS (SELECT doc_id, unnest(
         |    CASE WHEN len(tokens) >= 2
         |      THEN list_transform(generate_series(1, len(tokens) - 1),
         |             i -> array_to_string(tokens[i:i+1], ' '))
         |      ELSE [] END) AS g
         |  FROM toks),
         |lm0 AS (SELECT g, count(*) AS c2 FROM bg GROUP BY g),
         |lm AS (SELECT g,
         |    CAST(round(ln(c2::DOUBLE /
         |      SUM(c2) OVER (PARTITION BY split_part(g, ' ', 1)))
         |      * 16777216.0) AS BIGINT) AS lnp_fp
         |  FROM lm0)
         |SELECT b.doc_id, count(*) AS n_bigrams,
         |  round(-(CAST(SUM(l.lnp_fp) AS DOUBLE) / 16777216.0)
         |    / count(*), 4) AS avg_nll
         |FROM bg b JOIN lm l USING (g)
         |GROUP BY b.doc_id ORDER BY b.doc_id""".stripMargin,
    // Regex literals interpolate from LineFilter's constants (the
    // q59 convention) — engines cannot drift.
    "q70_paragraph_dedup" ->
      """WITH d AS (SELECT doc_id,
        |  CASE WHEN doc_id % 3 = 0
        |    THEN 'subscribe to our newsletter for all the latest updates today ' || text
        |    ELSE text END AS t
        | FROM documents),
        |tk AS (SELECT doc_id,
        |  list_filter(string_split_regex(lower(t), '\s+'),
        |              x -> length(x) > 0) AS tokens
        | FROM d),
        |p AS (SELECT doc_id, i AS pos,
        |    array_to_string(tokens[i*10+1:i*10+10], ' ') AS para
        |  FROM tk, unnest(generate_series(0,
        |    CAST(ceil(len(tokens) / 10.0) AS BIGINT) - 1)) t(i)),
        |k AS (SELECT doc_id, pos, para,
        |    row_number() OVER (PARTITION BY md5(para)
        |      ORDER BY doc_id, pos) = 1 AS keep
        |  FROM p)
        |SELECT doc_id, COUNT(*) AS n_paras,
        |  CAST(SUM(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_kept,
        |  md5(COALESCE(array_to_string(
        |    list(para ORDER BY pos) FILTER (WHERE keep), ' '), ''))
        |    AS kept_md5
        |FROM k GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "q69_contamination_coverage" ->
      s"""WITH ${DedupQueries.toksCte},
         |kgp AS (SELECT doc_id, CAST(len(tokens) AS BIGINT) AS n_tokens,
         |  CASE WHEN len(tokens) >= 13
         |    THEN list_transform(generate_series(1, len(tokens) - 12),
         |           i -> md5(array_to_string(tokens[i:i+12], ' ')))
         |    ELSE [md5(array_to_string(tokens[1:13], ' '))] END AS kg
         | FROM toks),
         |bench AS (SELECT DISTINCT unnest(kg) AS g FROM kgp
         |          WHERE doc_id % 7 = 0),
         |hits AS (SELECT doc_id, n_tokens, i AS pos, g
         |  FROM (SELECT doc_id, n_tokens, t.i, kg[t.i] AS g
         |        FROM kgp, unnest(generate_series(1, len(kg))) t(i)
         |        WHERE doc_id % 7 <> 0)
         |  JOIN bench USING (g)),
         |c AS (SELECT doc_id, n_tokens, pos,
         |  LEAST(13, COALESCE(LEAD(pos) OVER
         |    (PARTITION BY doc_id ORDER BY pos) - pos, 13)) AS cov
         | FROM hits)
         |SELECT doc_id, ANY_VALUE(n_tokens) AS n_tokens,
         |  COUNT(*) AS n_hit_positions,
         |  CAST(LEAST(SUM(cov), ANY_VALUE(n_tokens)) AS BIGINT)
         |    AS covered_tokens,
         |  round(LEAST(SUM(cov), ANY_VALUE(n_tokens))::DOUBLE
         |    / ANY_VALUE(n_tokens), 4) AS coverage
         |FROM c GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "q65_line_filter" ->
      s"""WITH d AS (SELECT doc_id, text || '.' ||
        |  CASE WHEN doc_id % 2 = 0
        |    THEN chr(10) || 'home | about | contact' ELSE '' END ||
        |  CASE WHEN doc_id % 5 = 0
        |    THEN chr(10) || 'please enable javascript to view this page.'
        |    ELSE '' END ||
        |  CASE WHEN doc_id % 4 = 0
        |    THEN chr(10) || 'ok.' ELSE '' END AS t
        | FROM documents),
        |l AS (SELECT doc_id, string_split(t, chr(10)) AS ls FROM d),
        |k AS (SELECT doc_id, len(ls) AS n_lines,
        |  list_filter(ls, x ->
        |    regexp_matches(x, '${graft.ops.LineFilter.terminalPattern}')
        |    AND len(list_filter(string_split_regex(trim(x), '\\s+'),
        |          w -> length(w) > 0)) >= 3
        |    AND NOT regexp_matches(lower(x),
        |          '${graft.ops.LineFilter.boilerplatePattern}')) AS kept
        | FROM l)
        |SELECT doc_id, CAST(n_lines AS BIGINT) AS n_lines,
        |  CAST(len(kept) AS BIGINT) AS n_kept,
        |  md5(array_to_string(kept, chr(10))) AS clean_md5
        |FROM k ORDER BY doc_id""".stripMargin,
    "q62_lm_score_split" ->
      s"""WITH ${DedupQueries.toksCte},
         |bg AS (SELECT doc_id, unnest(
         |    CASE WHEN len(tokens) >= 2
         |      THEN list_transform(generate_series(1, len(tokens) - 1),
         |             i -> array_to_string(tokens[i:i+1], ' '))
         |      ELSE [] END) AS g
         |  FROM toks),
         |cnt AS (SELECT g, count(*) AS c2 FROM bg
         |        WHERE doc_id % 5 <> 0 GROUP BY g),
         |model AS (SELECT g, c2,
         |    SUM(c2) OVER (PARTITION BY split_part(g, ' ', 1)) AS c1
         |  FROM cnt),
         |marg AS (SELECT DISTINCT split_part(g, ' ', 1) AS w1, c1
         |         FROM model),
         |voc AS (SELECT count(DISTINCT t) + 1 AS v
         |        FROM (SELECT unnest(tokens) AS t FROM toks
         |              WHERE doc_id % 5 <> 0)),
         |sc AS (SELECT te.doc_id, model.c2,
         |    CAST(round(ln((COALESCE(model.c2, 0) + 1.0) /
         |      CAST(COALESCE(marg.c1, 0) + v AS DOUBLE))
         |      * 16777216.0) AS BIGINT) AS lnp_fp
         |  FROM (SELECT * FROM bg WHERE doc_id % 5 = 0) te
         |  LEFT JOIN model ON te.g = model.g
         |  LEFT JOIN marg ON split_part(te.g, ' ', 1) = marg.w1
         |  CROSS JOIN voc)
         |SELECT doc_id, count(*) AS n_bigrams,
         |  CAST(SUM(CASE WHEN c2 IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_oov,
         |  round(-(CAST(SUM(lnp_fp) AS DOUBLE) / 16777216.0)
         |    / count(*), 4) AS avg_nll
         |FROM sc GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    // The regex literals interpolate from Pii's constants — the Spark
    // expression and the oracle can never drift (they are the same
    // Java∩RE2 class-form strings by construction).
    "q59_pii_redaction" ->
      s"""WITH dirty AS (SELECT doc_id,
        |  text || ' contact ' || source || '.' || doc_id || '@example.com' ||
        |  CASE WHEN doc_id % 3 = 0
        |    THEN ' call 555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
        |    ELSE '' END ||
        |  CASE WHEN doc_id % 4 = 0
        |    THEN ' from 10.' || (doc_id % 256) || '.' ||
        |         ((doc_id * 3) % 256) || '.' || ((doc_id * 7) % 256)
        |    ELSE '' END ||
        |  CASE WHEN doc_id % 5 = 0
        |    THEN ' ssn ' || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0') ||
        |         '-' || lpad(CAST(doc_id % 100 AS VARCHAR), 2, '0') ||
        |         '-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
        |    ELSE '' END ||
        |  CASE WHEN doc_id % 6 = 0
        |    THEN ' card 4111-2222-3333-' ||
        |         lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
        |    ELSE '' END ||
        |  CASE WHEN doc_id % 9 = 0
        |    THEN ' iban DE' || lpad(CAST(doc_id % 100 AS VARCHAR), 2, '0') ||
        |         'BANK' || lpad(CAST(doc_id % 100000000 AS VARCHAR), 8, '0')
        |    ELSE '' END AS t
        | FROM documents)
        |SELECT doc_id,
        |  CAST(len(regexp_extract_all(t,
        |    '${Pii.emailPattern}')) AS BIGINT)
        |    AS n_emails,
        |  CAST(len(regexp_extract_all(t,
        |    '${Pii.ipv4Pattern}')) AS BIGINT) AS n_ips,
        |  CAST(len(regexp_extract_all(t, '${Pii.phonePattern}')) AS BIGINT)
        |    AS n_phones,
        |  CAST(len(regexp_extract_all(t, '${Pii.ssnPattern}')) AS BIGINT)
        |    AS n_ssns,
        |  CAST(len(regexp_extract_all(t,
        |    '${Pii.creditCardPattern}')) AS BIGINT) AS n_cards,
        |  CAST(len(regexp_extract_all(t, '${Pii.ibanPattern}')) AS BIGINT)
        |    AS n_ibans,
        |  md5(regexp_replace(regexp_replace(regexp_replace(
        |      regexp_replace(regexp_replace(regexp_replace(t,
        |    '${Pii.emailPattern}', '<EMAIL>', 'g'),
        |    '${Pii.ipv4Pattern}', '<IP>', 'g'),
        |    '${Pii.ibanPattern}', '<IBAN>', 'g'),
        |    '${Pii.ssnPattern}', '<SSN>', 'g'),
        |    '${Pii.creditCardPattern}', '<CARD>', 'g'),
        |    '${Pii.phonePattern}', '<PHONE>', 'g')) AS redacted_md5
        |FROM dirty ORDER BY doc_id""".stripMargin,
  )
}
