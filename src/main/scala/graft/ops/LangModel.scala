package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Bigram language-model build + scoring — the CCNet/KenLM-style
  * perplexity filter of a training-data pipeline (q61/q62). Train a
  * bigram model (counts c(w1 w2) and prefix marginals c(w1·)), then
  * score documents by average negative log-probability; high scores
  * mark documents whose word transitions are atypical for the model's
  * training corpus.
  *
  * Scale shape:
  *  - The model build is ONE count shuffle keyed by bigram; the prefix
  *    marginal is a window over the already-aggregated count frame (it
  *    repartitions model rows, never corpus rows).
  *  - The model is BOUNDED by [[train]]'s `minCount` pruning, not by
  *    vocabulary folklore: distinct bigrams grow with corpus size
  *    (Heaps' law), so an unpruned "vocabulary²" bound is vacuous at
  *    100 TB. Dropping hapax/low-count bigrams before the model
  *    materializes — standard KenLM `--prune` practice — makes the
  *    model size track the HEAD of the bigram distribution, which
  *    saturates; LangModelSpec pins that model rows stop tracking
  *    corpus growth once pruning engages.
  *  - The scoring join carries NO broadcast hint: Spark's cost model /
  *    AQE broadcasts the model when its runtime size is under the
  *    threshold and falls back to a shuffle join when it is not, so a
  *    large pruned-but-still-big model degrades gracefully instead of
  *    OOMing the driver (the q57 benchmark-gram broadcast is the
  *    contrasting case: an eval set is broadcast-small by NATURE, a
  *    corpus-trained LM is not).
  *  - Per-term log-probs go through the 2^24 fixed-point quantization
  *    ([[ProductQuant.fixedPointScale]]) so per-document sums are
  *    order-independent across partitionings and engines.
  *
  * On a production cluster the model is an index-time artifact (train
  * once on the reference corpus, persist (g, lnp_fp), score many);
  * the self-contained build here keeps the operators oracle-checkable.
  */
object LangModel {

  private val fp = ProductQuant.fixedPointScale

  /** Exploded (doc_id, g) bigram frame of `docs(idCol, textCol)` —
    * the shared input of build and probe sides. Callers that feed it
    * to BOTH (q61 scores the corpus it trains on) should
    * `localCheckpoint()` it so the corpus is scanned and tokenized
    * once (MEMORY_AND_DISK blocks; the caller's Checkpoints.consume
    * frees them with the result). */
  def bigrams(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).as("doc_id"),
      graft.expressions.TextHashes
        .tokenGrams(Dedup.tokens(col(textCol)), 2).as("grams"))
      .select(col("doc_id"), explode_outer(col("grams")).as("g"))

  /** Raw model counts (g, c2, c1): bigram count and its prefix
    * marginal c1 = Σ_w2 c(w1 w2). The marginal is computed over the
    * UNPRUNED counts, so pruning (in [[train]] / callers) drops rows
    * without renormalizing the survivors' probabilities — the
    * standard pruned-MLE convention. */
  def counts(bg: DataFrame): DataFrame =
    bg.groupBy(col("g")).agg(count(lit(1)).as("c2"))
      .withColumn("c1", sum(col("c2")).over(
        Window.partitionBy(split(col("g"), " ").getItem(0))))

  /** MLE bigram model (g, lnp_fp), pruned: bigrams with c2 < minCount
    * are dropped BEFORE the model materializes (they score as misses
    * downstream — inner-join scoring skips them, smoothed scoring
    * treats them as unseen). minCount=1 keeps every bigram (exact
    * MLE); raising it is what bounds the model at corpus scale. */
  def train(bg: DataFrame, minCount: Long = 1L): DataFrame = {
    require(minCount >= 1L, s"minCount must be >= 1, got $minCount")
    counts(bg)
      .filter(col("c2") >= minCount)
      .select(col("g"),
        round(log(col("c2").cast("double") / col("c1")) * fp)
          .cast("long").as("lnp_fp"))
  }

  /** In-vocabulary scoring (q61's shape): inner-join the probe frame
    * with the model — documents' pruned/unseen bigrams simply don't
    * contribute (scoring the training corpus at minCount=1 makes every
    * bigram in-vocabulary, so no smoothing is needed). No broadcast
    * hint — see the object scaladoc. */
  def score(bg: DataFrame, lm: DataFrame): DataFrame =
    bg.join(lm, Seq("g"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"), sum(col("lnp_fp")).as("s"))
      .select(col("doc_id"), col("n_bigrams"),
        round(-(col("s").cast("double") / fp) / col("n_bigrams"), 4)
          .as("avg_nll"))

  /** Laplace-smoothed scoring of held-out text against a trained
    * model's raw counts — the real CCNet deployment shape (train on a
    * reference slice, score NEW documents, where unseen bigrams are
    * the norm): lnp(w2|w1) = ln((c2 + 1) / (c1 + V)), with c2 = 0 for
    * bigrams outside the (possibly pruned) model, c1 = 0 for unseen
    * prefixes, and V the training vocabulary size (add-one mass over
    * the full unigram alphabet, passed as a one-row broadcast frame
    * like FullText's corpus stats). Emits per-document n_oov — the
    * count of out-of-model bigrams — beside the smoothed avg_nll.
    *
    * Both model-lookup joins are hint-free left joins (same
    * broadcast-vs-shuffle degradation as [[score]]); the marginal
    * frame is distinct-(w1, c1) of the model — at most one row per
    * surviving prefix. */
  def scoreSmoothed(bg: DataFrame, model: DataFrame,
      vocab: DataFrame): DataFrame = {
    val lm = model.select(col("g"), col("c2"))
    val marg = model
      .select(split(col("g"), " ").getItem(0).as("w1"), col("c1"))
      .distinct()
    // explode_outer emits a null-gram row for documents with fewer
    // than two tokens; the inner-join path drops those implicitly,
    // the left-join path must drop them explicitly or they'd score
    // as one phantom OOV bigram (the SQL oracle's unnest-of-empty
    // emits no row at all).
    bg.filter(col("g").isNotNull)
      .withColumn("w1", split(col("g"), " ").getItem(0))
      .join(lm, Seq("g"), "left")
      .join(marg, Seq("w1"), "left")
      .crossJoin(broadcast(vocab))
      .withColumn("lnp_fp",
        round(log(
          (coalesce(col("c2"), lit(0L)).cast("double") + 1.0) /
            (coalesce(col("c1"), lit(0L)).cast("double") +
              col("v").cast("double"))) * fp).cast("long"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"),
        sum(when(col("c2").isNull, 1L).otherwise(0L)).as("n_oov"),
        sum(col("lnp_fp")).as("s"))
      .select(col("doc_id"), col("n_bigrams"), col("n_oov"),
        round(-(col("s").cast("double") / fp) / col("n_bigrams"), 4)
          .as("avg_nll"))
  }

  /** (g, c2, c1) model rows surviving `minCount` pruning — the raw-
    * count face of [[train]] for smoothed scoring, which needs counts,
    * not collapsed log-probs. */
  def trainCounts(bg: DataFrame, minCount: Long = 1L): DataFrame = {
    require(minCount >= 1L, s"minCount must be >= 1, got $minCount")
    counts(bg).filter(col("c2") >= minCount)
  }

  /** A trained model as a driver-side map (g → lnp_fp) — the
    * deploy-time artifact the STREAMING scorer consumes
    * ([[graft.streaming.Streams.lmScoreStream]]). Only sane for a
    * PRUNED model: minCount is what makes this bounded (the
    * benchGramList convention — a literal-sized artifact by
    * construction, not by luck); an unpruned corpus-trained model
    * must stay a DataFrame and score via [[score]]'s join. */
  def modelMap(lm: DataFrame): Map[String, Long] =
    lm.select(col("g"), col("lnp_fp")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
}
