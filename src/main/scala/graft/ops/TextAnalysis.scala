package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Corpus text-analysis primitives for training-data curation:
  * stopword-profile language ID, winnowing fingerprints, BPE-style
  * regex token counting, and quality scoring. All per-document map
  * work — codegen'd builtins, no UDFs, no shuffle — so a 100 TB scan
  * is embarrassingly parallel and these columns come "for free" on
  * top of the read.
  */
object TextAnalysis {

  /** Whitespace tokens of lowercased text (shared with Dedup). */
  def tokensOf(text: Column): Column = Dedup.tokens(text)

  /** Small function-word profiles per language; the detector scores a
    * document by stopword hits and takes the arg-max. Sets are
    * intentionally compact — the point is the operator shape (profile
    * score → arg-max with deterministic tiebreak), swap in fuller
    * profiles for production. */
  val stopwords: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "mit"),
    "en" -> Seq("the", "a", "of", "and", "is", "not", "to", "in"),
    "es" -> Seq("el", "la", "y", "los", "es", "no", "un", "con"),
    "fr" -> Seq("le", "la", "et", "les", "est", "pas", "un", "dans"),
    "zh" -> Seq("的", "是", "不", "了", "在", "我", "有", "和"))

  /** Count of tokens contained in `words` (with repeats). Compiled
    * set-lookup kernel; `stopwordHitsHof` is the builtin twin. */
  def stopwordHits(toks: Column, words: Seq[String]): Column =
    graft.expressions.TextHashes.stopwordHits(toks, words)

  /** Interpreted-HOF twin of `stopwordHits`. */
  def stopwordHitsHof(toks: Column, words: Seq[String]): Column =
    size(filter(toks, t => t.isInCollection(words)))

  /** Σ character length over tokens (compiled; the quality score's
    * mean-token-length numerator). */
  def tokenLengthSum(toks: Column): Column =
    graft.expressions.TextHashes.tokenLengthSum(toks)

  /** Interpreted-HOF twin of `tokenLengthSum`. */
  def tokenLengthSumHof(toks: Column): Column =
    aggregate(toks, lit(0L), (acc, t) => acc + length(t))

  /** Predicted language: max stopword hits, ties broken by language
    * code order (the CASE chain order — identical in the oracle SQL).
    *
    * SINGLE-EXPRESSION form — each language's hit count appears once
    * in `greatest` and the `greatest` is replicated into every CASE
    * branch, so one evaluation costs ~6× the necessary kernel work
    * (expression trees get no common-subexpression elimination across
    * references; round-6 plan audit measured ×30 stopword_hits sites
    * for 5 languages). Kept for Column-API composability on small
    * frames; scan-scale callers use [[withLangId]], which stages the
    * five counts as named columns so each kernel runs once per row. */
  def langId(toks: Column): Column = {
    val scores = stopwords.map { case (lang, words) =>
      lang -> stopwordHits(toks, words)
    }
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    scores.foldRight(lit("und"): Column) { case ((lang, s), rest) =>
      when(s === best, lit(lang)).otherwise(rest)
    }
  }

  /** Scan-scale language ID: stages each language's hit count as a
    * named column — CollapseProject keeps multi-referenced non-cheap
    * aliases in their own Project (the q20 sig/bands mechanism), so
    * the arg-max CASE reads five computed INTs instead of
    * re-evaluating five token-scan kernels per reference. Identical
    * output to `langId` (ArgMaxSpec-style parity pinned in
    * TextAnalysisSpec). */
  def withLangId(df: org.apache.spark.sql.DataFrame, toks: Column,
      out: String): org.apache.spark.sql.DataFrame = {
    val hitCols = stopwords.map { case (lang, _) => s"__hits_$lang" }
    val staged = stopwords.foldLeft(df) { case (d, (lang, words)) =>
      d.withColumn(s"__hits_$lang", stopwordHits(toks, words))
    }
    val best = hitCols.map(col).reduce((a, b) => greatest(a, b))
    val pred = stopwords.foldRight(lit("und"): Column) {
      case ((lang, _), rest) =>
        when(col(s"__hits_$lang") === best, lit(lang)).otherwise(rest)
    }
    staged.withColumn(out, pred).drop(hitCols: _*)
  }

  /** Positional k-token-gram md5 hashes (repeats kept — winnowing needs
    * positions). Short docs collapse to one gram of all tokens.
    * Codegen'd kernel; `kgramHashesHof` is the builtin twin. */
  def kgramHashes(toks: Column, k: Int = 4): Column =
    graft.expressions.TextHashes.kgramMd5(toks, k)

  /** Interpreted-HOF twin of `kgramHashes` (parity pinned by
    * HashExpressionsSpec). */
  def kgramHashesHof(toks: Column, k: Int = 4): Column =
    when(size(toks) >= k,
      transform(sequence(lit(0), size(toks) - k),
        i => md5(concat_ws(" ", slice(toks, i + lit(1), lit(k))))))
      .otherwise(array(md5(concat_ws(" ", slice(toks, 1, k)))))

  /** Winnowing (MOSS-style): the distinct set of per-window minima over
    * the k-gram hash sequence — a position-robust document fingerprint.
    * Window w=1 degenerates to all hashes. Codegen'd kernel. */
  def winnowFingerprints(hashes: Column, w: Int = 5): Column =
    graft.expressions.TextHashes.winnowMin(hashes, w)

  /** Interpreted-HOF twin of `winnowFingerprints`. */
  def winnowFingerprintsHof(hashes: Column, w: Int = 5): Column =
    array_distinct(
      when(size(hashes) >= w,
        transform(sequence(lit(0), size(hashes) - w),
          j => array_min(slice(hashes, j + lit(1), lit(w)))))
        .otherwise(array(array_min(hashes))))

  /** GPT-2-style pretokenizer pattern, restricted to constructs both
    * Java regex and RE2 (the oracle engine) interpret identically. */
  val bpePattern: String =
    "'(?:[sdmt]|ll|ve|re)| ?\\p{L}+| ?\\p{N}+| ?[^\\s\\p{L}\\p{N}]+|\\s+"

  /** All BPE pretokens of text (whitespace runs included). */
  def bpeTokens(text: Column): Column =
    regexp_extract_all(text, lit(bpePattern), lit(0))

  /** Characters that are neither word characters nor whitespace. */
  def punctCount(text: Column): Column =
    length(regexp_replace(text, "[\\p{L}\\p{N}\\s]+", ""))
}
