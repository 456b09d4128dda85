package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Counting-based quality classification and importance weighting —
  * the two data-selection stages of a pretraining pipeline that sit
  * between heuristic filters (q29/q58/q65) and the LM-perplexity
  * filter (q61/q62):
  *
  *  - [[trainNaiveBayes]]/[[scoreNaiveBayes]]: a multinomial
  *    Naive-Bayes document classifier with Laplace smoothing — the
  *    counting analog of CCNet's fastText quality classifier (Wenzek
  *    et al. 2020 train on Wikipedia as the high-quality class; the
  *    linear fastText model over unigram features reduces to exactly
  *    these class-conditional token log-odds when trained by counting).
  *  - [[dsirLogRatios]]/[[dsirWeights]]: hashed n-gram importance
  *    weights (DSIR, Xie et al. 2023): features are hashed into B
  *    buckets, and a raw document's log importance weight is the sum
  *    over its features of ln(p_target(b)/p_raw(b)) under smoothed
  *    bucket unigram models. Selection then keeps the top-weighted
  *    documents (deterministic threshold here; production DSIR adds
  *    Gumbel noise for sampling-without-replacement, which is
  *    deliberately NOT reproduced — oracle determinism is the
  *    contract of this surface).
  *
  * Scale shape (both operators):
  *  - Model build is ONE count shuffle keyed by token/bucket. The
  *    unigram vocabulary grows sublinearly (Heaps' law) and the DSIR
  *    bucket table is FIXED at B rows, so the model side of the
  *    scoring join is dwarfed by the corpus side.
  *  - Scoring joins carry NO broadcast hint (the LangModel
  *    convention): AQE broadcasts a small model and degrades to a
  *    shuffle join for a huge one instead of OOMing the driver.
  *  - Scalars (class totals, vocabulary size, priors) travel as
  *    one-row broadcast frames (FullText's corpus-stats pattern),
  *    never driver-side collects.
  *  - Per-term log-probs are quantized to 2^24 fixed point
  *    ([[ProductQuant.fixedPointScale]]) so per-document sums are
  *    order-independent across partitionings and engines; class
  *    comparison (`pred`) happens on the fixed-point longs, exact.
  */
object Classifier {

  private val fp = ProductQuant.fixedPointScale

  /** Exploded (doc_id, cls, t) token frame — the shared input of the
    * NB build and probe sides. `cls` must be 0/1. Null tokens from
    * explode_outer (empty documents) are dropped on BOTH sides, the
    * q62 discipline. */
  def tokenFrame(docs: DataFrame, idCol: String, textCol: String,
      cls: Column): DataFrame =
    docs.select(col(idCol).as("doc_id"), cls.cast("int").as("cls"),
      explode_outer(Dedup.tokens(col(textCol))).as("t"))
      .filter(col("t").isNotNull)

  /** Class-conditional token model (t, lnp1_fp, lnp0_fp): Laplace-
    * smoothed log P(t|cls) over the corpus vocabulary V (denominator
    * tot_c + V; no extra OOV type — scoring the corpus that built the
    * vocabulary means every probe token is a model row). One count
    * shuffle keyed by token; totals and V are a one-row aggregate of
    * the already-counted model frame, not of the corpus. */
  def trainNaiveBayes(tk: DataFrame): DataFrame = {
    val cnt = tk.groupBy(col("t")).agg(
      sum(when(col("cls") === 1, 1L).otherwise(0L)).as("c1"),
      sum(when(col("cls") === 0, 1L).otherwise(0L)).as("c0"))
    val tot = cnt.agg(sum(col("c1")).as("tot1"), sum(col("c0")).as("tot0"),
      count(lit(1)).as("v"))
    cnt.crossJoin(broadcast(tot))
      .select(col("t"),
        round(log((col("c1") + 1d) / (col("tot1") + col("v"))) * fp)
          .cast("long").as("lnp1_fp"),
        round(log((col("c0") + 1d) / (col("tot0") + col("v"))) * fp)
          .cast("long").as("lnp0_fp"))
  }

  /** Per-document class log-likelihoods and arg-max under a
    * [[trainNaiveBayes]] model plus document-count priors (a one-row
    * frame (n1, n0)). Output: doc_id, n_tokens, ll_target, ll_other
    * (4dp totals), pred — pred compares the fixed-point sums, so the
    * boundary is exact in both engines. */
  def scoreNaiveBayes(tk: DataFrame, model: DataFrame,
      priors: DataFrame): DataFrame = {
    val pr = priors.select(
      round(log(col("n1").cast("double") / (col("n1") + col("n0"))) * fp)
        .cast("long").as("p1_fp"),
      round(log(col("n0").cast("double") / (col("n1") + col("n0"))) * fp)
        .cast("long").as("p0_fp"))
    tk.join(model, Seq("t"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"),
        sum(col("lnp1_fp")).as("s1"), sum(col("lnp0_fp")).as("s0"))
      .crossJoin(broadcast(pr))
      .select(col("doc_id"), col("n_tokens"),
        round((col("s1") + col("p1_fp")).cast("double") / fp, 4)
          .as("ll_target"),
        round((col("s0") + col("p0_fp")).cast("double") / fp, 4)
          .as("ll_other"),
        (col("s1") + col("p1_fp") > col("s0") + col("p0_fp"))
          .cast("long").as("pred"))
  }

  /** A trained NB model as driver-side maps (t → lnp1_fp, t →
    * lnp0_fp) — the deploy-time artifact the STREAMING scorer
    * consumes ([[graft.streaming.Streams.nbScoreStream]]). Only sane
    * for a bounded vocabulary (Heaps-sublinear, and pruneable before
    * the collect); the batch path scores via the join in
    * [[scoreNaiveBayes]]. */
  def modelMaps(model: DataFrame): (Map[String, Long], Map[String, Long]) = {
    val rows = model.select(col("t"), col("lnp1_fp"), col("lnp0_fp"))
      .collect()
    (rows.map(r => r.getString(0) -> r.getLong(1)).toMap,
      rows.map(r => r.getString(0) -> r.getLong(2)).toMap)
  }

  /** Hashed feature bucket of a token/gram string: uint32 of the
    * first 8 md5 hex chars, mod `buckets` — the Sampling.stableBucket
    * construction applied to feature VALUES (DSIR's hashed n-gram
    * trick: a fixed-B table regardless of vocabulary growth). */
  def featureBucket(feature: Column, buckets: Int): Column = {
    require(buckets > 0, "buckets must be positive")
    conv(substring(md5(feature), 1, 8), 16, 10).cast("long") % buckets
  }

  /** Per-bucket log importance ratios (b, lr_fp): smoothed bucket
    * unigram models of the target and raw feature streams,
    * lr = ln((ct+1)/(tott+B)) − ln((cr+1)/(totr+B)). Input is the
    * exploded (doc_id, cls, b) feature frame (cls 1 = target); the
    * model is AT MOST B rows by construction. */
  def dsirLogRatios(feats: DataFrame, buckets: Int): DataFrame = {
    val cnt = feats.groupBy(col("b")).agg(
      sum(when(col("cls") === 1, 1L).otherwise(0L)).as("ct"),
      sum(when(col("cls") === 0, 1L).otherwise(0L)).as("cr"))
    val tot = cnt.agg(sum(col("ct")).as("tott"), sum(col("cr")).as("totr"))
    cnt.crossJoin(broadcast(tot))
      .select(col("b"),
        (round(log((col("ct") + 1d) / (col("tott") + lit(buckets))) * fp)
          .cast("long") -
          round(log((col("cr") + 1d) / (col("totr") + lit(buckets))) * fp)
            .cast("long")).as("lr_fp"))
  }

  /** Raw-document log importance weights under a [[dsirLogRatios]]
    * model: doc_id, n_feats, logw (4dp), keep = logw > 0 (the
    * deterministic selection rule; see object scaladoc). The model is
    * ≤ B rows — effectively always the broadcast side, but left
    * hint-free for uniformity. */
  def dsirWeights(rawFeats: DataFrame, ratios: DataFrame): DataFrame =
    rawFeats.join(ratios, Seq("b"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_feats"), sum(col("lr_fp")).as("s"))
      .select(col("doc_id"), col("n_feats"),
        round(col("s").cast("double") / fp, 4).as("logw"),
        (col("s") > 0L).cast("long").as("keep"))
}
