package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Product quantization for embedding columns — the memory-bound scale
  * path for similarity search. Each d-dim vector is split into `m`
  * contiguous subvectors; each subspace gets its own small k-means
  * codebook (`c` centroids); a vector is stored as `m` small codes
  * (here 8 bytes) instead of `d` floats (256 bytes) — a 32× scan-size
  * reduction. Query-time ADC (asymmetric distance computation): the
  * query is scored against every codebook centroid ONCE (an m·c
  * distance table, 128 entries here), and each corpus vector's
  * approximate dot product is the sum of `m` table lookups — no float
  * vector is ever read at query time. With the exact per-vector norm
  * stored beside the codes (one float), approx cosine =
  * ADC-dot / (‖x‖·‖q‖) — the FAISS IndexPQ + inner-product-metric
  * construction.
  *
  * Scale shape: training is THE grouped distributed Lloyd — all `m`
  * subspace trainings run in ONE job per round (sub_id is just another
  * grouping key), means go through the 2^24 fixed-point quantization
  * so the SQL oracle derives bit-identical codebooks regardless of
  * partitioning. `SimilarityQueries.kmeansCentroids` (q39) is the
  * single-subspace wrapper over [[trainCodebooks]] — one shared
  * implementation of the mean/checkpoint machinery. Encoding is one
  * broadcast join (codebook is m·c rows) + one aggregation. On a real
  * deployment codes+norms are index-time artifacts written once;
  * queries then scan ONLY the (vec_id, codes, norm) table with a
  * broadcast 128-entry ADC table — the whole corpus-side plan is a
  * codegen'd scan + TakeOrdered, no shuffle.
  */
object ProductQuant {

  private def dot(a: Column, b: Column): Column =
    graft.expressions.FloatVectorDot.dot(a, b)

  /** Subspace cosine with a zero-norm guard: sparse embeddings
    * legitimately produce all-zero subvectors, and under ANSI mode the
    * bare division would fail the whole job — score those pairs 0
    * instead (CaseWhen evaluates the division branch only when taken).
    * The driver-facing corpus has no zero subvectors, so the q52
    * oracle is unaffected. */
  private def cos(a: Column, b: Column): Column = {
    val na = sqrt(dot(a, a))
    val nb = sqrt(dot(b, b))
    when(na === 0d || nb === 0d, lit(0d))
      .otherwise(dot(a, b) / (na * nb))
  }

  /** 2^24 — the fixed-point quantum shared by the Lloyd means and the
    * ADC sum: round(x·2²⁴) is exact in doubles, and the resulting
    * integer sums are order-independent, so both codebooks and ADC
    * scores are bit-identical across partitionings and engines. */
  val fixedPointScale = 16777216.0

  /** Explode `e(vec_id, embedding)` into (vec_id, sub_id, subvec):
    * `m` contiguous `subdim`-wide slices per vector. Outer generator —
    * the slice array is non-empty by construction, and plain posexplode
    * would let InferFiltersFromGenerate re-embed the whole slice
    * expression as a scan filter (PLANS.md audit note 1). */
  def subVectors(e: DataFrame, m: Int, subdim: Int): DataFrame =
    e.select(col("vec_id"),
      posexplode_outer(transform(sequence(lit(0), lit(m - 1)),
        i => slice(col("embedding"), i * subdim + 1, lit(subdim))))
        .as(Seq("sub_id", "subvec")))

  /** Train all `m` subspace codebooks in one grouped Lloyd run:
    * init = the `c` SMALLEST vec_ids' slices ranked 0..c-1 (NOT
    * `vec_id < c` — an id space that doesn't cover 0..c-1, e.g.
    * snowflake ids or a filtered corpus, would silently seed fewer or
    * zero clusters), then `iters` rounds of max-cosine assignment +
    * fixed-point elementwise means (order- and partitioning-
    * independent, oracle-derivable; for 0-based dense ids the rank IS
    * the id, so the oracles' `vec_id < c` seeding derives identical
    * codebooks). Returns (sub_id, cent_id, cvec). Empty clusters drop
    * out, as in kmeansCentroids. Each round's codebook is
    * localCheckpoint'd and the superseded round freed ([[Checkpoints]]
    * hygiene contract — callers consume the final frame). The seed
    * selection is a TakeOrdered over distinct ids (no global sort) +
    * a rank window over `c` rows. */
  def trainCodebooks(subs: DataFrame, c: Int, iters: Int): DataFrame = {
    // subspace 0 holds exactly one row per vector, so the seed-id
    // scan is a shuffle-free filter + TakeOrdered instead of a
    // distinct() exchange (measured ~0.2-0.4 s of fixed overhead per
    // Lloyd call at bench scale)
    val seedIds = subs.filter(col("sub_id") === 0).select(col("vec_id"))
      .orderBy(col("vec_id")).limit(c)
      .withColumn("cent_id",
        (row_number().over(org.apache.spark.sql.expressions.Window
          .orderBy(col("vec_id"))) - 1).cast("long"))
    // the seed codebook is consumed exactly ONCE (round 1's broadcast
    // side), so it stays LAZY when rounds follow — checkpointing it
    // was one extra eager action per training call (and the q103 card
    // trains four codebook families per run); with zero rounds it
    // checkpoints so the returned frame keeps the documented
    // materialized-result contract
    val seed = subs.join(broadcast(seedIds), Seq("vec_id"))
      .select(col("sub_id"), col("cent_id"),
        col("subvec").as("cvec"))
    var cb = if (iters <= 0) seed.localCheckpoint() else seed
    // round 1's cb is the LAZY seed whose plan leaves include the
    // caller's `subs` — unpersisting it would walk through to any
    // checkpointed frame `subs` is built on (the residual writer's
    // shared coarse assignment) and free blocks still being read;
    // only superseded rounds that are THEMSELVES single-leaf
    // checkpoints may be freed here
    var cbStored = iters <= 0
    for (_ <- 1 to iters) {
      // one pass per round: max_by carries the row's own subvec
      // through the argmax (functionally determined by the group key,
      // so tie behavior is unchanged) instead of re-joining the
      // corpus-scale `subs` back in afterwards — that join shuffled
      // the full subvector payload once per Lloyd round just to
      // recover a column the aggregation already had (guide §2.4)
      val assigned = subs.join(broadcast(cb), Seq("sub_id"))
        .groupBy(col("vec_id"), col("sub_id"))
        .agg(max_by(col("cent_id"), cos(col("subvec"), col("cvec")))
          .as("cent_id"),
          first(col("subvec")).as("subvec"))
      val next = assigned
        .select(col("sub_id"), col("cent_id"),
          posexplode(col("subvec")).as(Seq("pos", "v")))
        .groupBy(col("sub_id"), col("cent_id"), col("pos"))
        .agg((sum(round(col("v").cast("double") * fixedPointScale).cast("long"))
          .cast("double") / fixedPointScale / count(lit(1))).cast("float").as("m"))
        .groupBy(col("sub_id"), col("cent_id"))
        .agg(transform(
          array_sort(collect_list(struct(col("pos"), col("m")))),
          x => x.getField("m")).as("cvec"))
        .localCheckpoint()
      if (cbStored) Checkpoints.unpersist(cb)
      cb = next
      cbStored = true
    }
    cb
  }

  /** PQ codes: per (vector, subspace), the max-cosine codebook entry.
    * One broadcast join + one aggregation; the output
    * (vec_id, sub_id, cent_id) is the index-time artifact a deployment
    * would persist (m bytes per vector). */
  def encode(subs: DataFrame, cb: DataFrame): DataFrame =
    subs.join(broadcast(cb), Seq("sub_id"))
      .groupBy(col("vec_id"), col("sub_id"))
      .agg(max_by(col("cent_id"), cos(col("subvec"), col("cvec")))
        .as("cent_id"))

  /** Deterministic-tie-break twin of [[encode]] for RESIDUAL coding
    * (q64): a vector that coincides with its coarse centroid has an
    * exactly-zero residual, every subspace cosine guards to 0, and
    * `max_by`'s arbitrary tie pick would make its code
    * partitioning-dependent (and diverge from any SQL `arg_max`).
    * Here the max score is taken per (vector, subspace) with a window
    * and ties break to the SMALLEST cent_id — order-independent and
    * mirrored exactly by the q64 oracle. Same cost class as encode
    * (the window repartitions the scored frame the groupBy shuffles
    * anyway). */
  def encodeDet(subs: DataFrame, cb: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("vec_id"), col("sub_id"))
    subs.join(broadcast(cb), Seq("sub_id"))
      .withColumn("__cos", cos(col("subvec"), col("cvec")))
      .withColumn("__mx", max(col("__cos")).over(w))
      .filter(col("__cos") === col("__mx"))
      .groupBy(col("vec_id"), col("sub_id"))
      .agg(min(col("cent_id")).as("cent_id"))
  }

  /** Query-side ADC table: partial dot of the query's `sub_id` slice
    * with every centroid of that subspace — m·c rows, broadcastable.
    * `qsubs` is (sub_id, qsub) from [[subVectors]] on the single query
    * row. */
  def adcTable(cb: DataFrame, qsubs: DataFrame): DataFrame =
    cb.join(broadcast(qsubs), Seq("sub_id"))
      .select(col("sub_id"), col("cent_id"),
        dot(col("cvec"), col("qsub")).as("pdot"))

  /** Pack per-(vector, subspace) codes into one row per vector —
    * (vec_id, codes[m]) — the layout a deployment actually persists.
    * The join-form score in q52 shuffles the exploded codes per query;
    * the packed form turns ADC into a PER-ROW expression over this
    * table ([[adcScoreLit]]) — no join, no shuffle, scan + TakeOrdered
    * only, which is what makes PQ pay off at corpus scale (measured in
    * tools/ProbePq: the join form LOSES to brute force locally because
    * its per-query shuffle dominates; the packed form wins). */
  def packCodes(codes: DataFrame): DataFrame =
    codes.groupBy(col("vec_id"))
      .agg(transform(
        array_sort(collect_list(struct(col("sub_id"), col("cent_id")))),
        x => x.getField("cent_id")).as("codes"))

  /** ADC score as a constant-lookup expression over a packed codes
    * column: Σ_s table[s·c + codes[s]]. `table` is the m·c ADC table
    * flattened in (sub_id, cent_id) order — a per-QUERY constant
    * (bounded by config, not data; the planes-as-literals precedent
    * from Ann), compiled into the generated plan
    * (expressions.AdcLookupSum) so the corpus-side scan carries zero
    * join AND zero interpreted HOF work. Missing centroids (dropped
    * empty clusters) must be pre-filled with 0.0 by the caller. */
  def adcScoreLit(codes: Column, table: Seq[Double], c: Int): Column =
    graft.expressions.FloatVectorDot.adcLookup(codes, table, c)

  /** Interpreted-HOF twin of [[adcScoreLit]] (parity pinned by
    * ProductQuantSpec; CodegenFallback — measured ~40% slower than
    * even the full-float brute scan, hence the kernel). The
    * out-of-range guard mirrors the kernel's null contract — without
    * it element_at would index FROM THE END for negative codes and
    * raise under ANSI for too-large ones, silently breaking twin
    * parity on exactly the corrupt inputs the contract covers. */
  private[graft] def adcScoreLitHof(codes: Column, table: Seq[Double],
      m: Int, c: Int): Column = {
    val t = array(table.map(lit): _*)
    aggregate(
      zip_with(codes, sequence(lit(0), lit(m - 1)),
        (code, s) => when(code < 0 || code >= c, lit(null).cast("double"))
          .otherwise(element_at(t, (s * c + code + 1).cast("int")))),
      lit(0.0), (acc, x) => acc + x)
  }
}
