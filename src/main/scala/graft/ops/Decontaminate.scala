package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Benchmark decontamination: find training documents that share long
  * token n-grams with an evaluation/benchmark set — the standard
  * pre-training hygiene pass (13-gram overlap, the GPT-3/PaLM
  * convention) that keeps eval questions out of the training corpus.
  *
  * Scale shape (the reason this is an operator and not a join recipe):
  * eval sets are tiny next to a 100 TB corpus, so the benchmark's gram
  * set is BROADCAST — the corpus side explodes its grams map-side,
  * hash-probes the broadcast set with no corpus shuffle, and only the
  * matched slice (rare by construction) reaches the per-document
  * aggregation. The report is the contaminated-docs list; removal is
  * then a broadcast anti-join of that id list against the corpus —
  * at no point does the corpus itself shuffle.
  *
  * Gram semantics are kgramMd5's (graft.expressions.HashKernels):
  * positional k-token space-joined grams, md5-hashed (grams never
  * carry raw text across the wire), de-duplicated per document —
  * `n_hit` counts DISTINCT contaminated grams, so a gram repeated in
  * the document counts once.
  */
object Decontaminate {

  /** Distinct md5 hashes of the k-token grams of `toks`. Documents
    * shorter than k collapse to one gram of all tokens (kgramMd5's
    * contract) — a short eval prompt still blocks its exact copy. */
  def gramHashes(toks: Column, k: Int = 13): Column =
    array_distinct(graft.expressions.TextHashes.kgramMd5(toks, k))

  /** Contamination report: for each corpus document sharing at least
    * one gram with the benchmark, (id, n_grams, n_hit, contamination).
    *
    * `corpus` and `bench` expose (`idCol`, `gramsCol`: array<string>);
    * grams are assumed distinct per row ([[gramHashes]] output).
    * The benchmark side must be broadcast-small (an eval set). */
  def overlapReport(corpus: DataFrame, bench: DataFrame,
      idCol: String, gramsCol: String): DataFrame = {
    // explode_outer on purpose: the gram arrays are non-empty by
    // construction, and the plain generator would let
    // InferFiltersFromGenerate re-embed the whole gram expression as
    // a scan-level filter (one redundant kernel pass per row — the
    // round-6 plan-audit mechanism). Null keys never match the join.
    val benchGrams = bench
      .select(explode_outer(col(gramsCol)).as("__g")).distinct()
    corpus
      .select(col(idCol), size(col(gramsCol)).cast("long").as("n_grams"),
        explode_outer(col(gramsCol)).as("__g"))
      .join(broadcast(benchGrams), Seq("__g"))
      .groupBy(col(idCol))
      .agg(max(col("n_grams")).as("n_grams"),
        count(lit(1)).as("n_hit"))
      .withColumn("contamination",
        round(col("n_hit").cast("double") / col("n_grams"), 4))
  }

  /** The benchmark's distinct gram set as a driver-side list (sorted
    * for determinism) — the deploy-time artifact the STREAMING
    * decontamination flag consumes (Streams.decontaminateStream).
    * Bounded by eval-set size, the same broadcast-small argument as
    * [[overlapReport]]'s build side. */
  def benchGramList(bench: DataFrame, gramsCol: String): Seq[String] =
    bench.select(explode_outer(col(gramsCol)).as("__g")).distinct()
      .collect().map(_.getString(0)).toSeq.sorted

  /** The removal step: corpus rows whose id is NOT in the report —
    * a broadcast anti-join (the report is small by construction). */
  def removeContaminated(corpus: DataFrame, report: DataFrame,
      idCol: String): DataFrame =
    corpus.join(broadcast(report.select(col(idCol))), Seq(idCol),
      "left_anti")
}
