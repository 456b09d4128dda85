package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic, engine-portable sampling and dataset splitting.
  *
  * Training pipelines need splits that are STABLE: re-running the
  * pipeline on a grown corpus must keep every existing document in the
  * same split (no leakage of yesterday's val docs into today's train
  * set), and any engine — Spark here, the warehouse SQL that audits it
  * elsewhere — must agree on the assignment. Random sampling
  * (`sample`, `rand`) gives neither. The house primitive instead:
  * bucket = uint32(md5(salt|id)[0:8]) mod buckets — the same
  * md5-prefix construction as the MinHash/hyperplane kernels, exactly
  * reproducible in any engine with md5 (the q54 oracle does it in
  * DuckDB).
  *
  * Per-row map work only: the split column is free on top of a scan at
  * any corpus size, and a filter on it pushes into the scan like any
  * other predicate.
  */
object Sampling {

  /** Stable bucket in [0, buckets): uint32 of the first 8 md5 hex
    * chars of `salt|id`, mod buckets. Changing `salt` produces an
    * independent assignment (e.g. one salt for splits, another for a
    * 1% debugging subsample). */
  def stableBucket(id: Column, salt: String, buckets: Int): Column = {
    require(buckets > 0, "buckets must be positive")
    conv(substring(md5(concat(lit(salt + "|"), id.cast("string"))), 1, 8),
      16, 10).cast("long") % buckets
  }

  /** Dynamic-modulus twin of [[stableBucket]] for per-row bucket
    * counts (e.g. the SemDeDup cluster-size cap, where the number of
    * sub-buckets is ⌈|cluster|/cap⌉ and differs per cluster). The
    * md5-prefix value is a uint32 (non-negative), so plain `%` is a
    * true modulus. Callers must guarantee `buckets` ≥ 1. */
  def stableBucket(id: Column, salt: String, buckets: Column): Column =
    conv(substring(md5(concat(lit(salt + "|"), id.cast("string"))), 1, 8),
      16, 10).cast("long") % buckets

  /** Split assignment from cumulative percentage cuts over a 100-way
    * stable bucket: e.g. `Seq("train" -> 90, "val" -> 95)` with
    * `other = "test"` sends bucket 0–89 to train, 90–94 to val, the
    * rest to test. Deterministic, disjoint, complete. */
  def assignSplit(id: Column, salt: String,
      cuts: Seq[(String, Int)], other: String): Column = {
    val pcts = cuts.map(_._2)
    require(cuts.nonEmpty &&
      pcts.zip(pcts.tail).forall { case (a, b) => a < b } &&
      pcts.head > 0 && pcts.last <= 100,
      s"cuts must be strictly increasing percentages in (0, 100], got $pcts" +
        " — equal cuts would silently empty a split, >100 would make" +
        " the remainder unreachable")
    val b = stableBucket(id, salt, 100)
    cuts.foldRight(lit(other)) { case ((name, cut), rest) =>
      when(b < cut, lit(name)).otherwise(rest)
    }
  }
}
