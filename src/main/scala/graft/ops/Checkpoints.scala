package graft.ops

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.execution.LogicalRDD
import org.apache.spark.storage.StorageLevel

/** Storage hygiene for `localCheckpoint()`-driven iterative loops
  * (connected components, Lloyd refinement).
  *
  * `Dataset.localCheckpoint()` persists the materialized rows in
  * executor storage and TRUNCATES lineage — so those blocks are not
  * recomputable and are never dropped by query completion; without an
  * explicit unpersist they sit in executor memory for the rest of the
  * session. On a long-lived 100 TB cluster session that retention is
  * what OOMs executors (and locally it is what made unrelated
  * queries' cost depend on which dedup query ran before them). The
  * iterative operators therefore free every superseded round's blocks
  * as soon as the next round has materialized, and callers that fully
  * consumed a returned checkpointed frame can free the final copy
  * with [[Checkpoints.unpersist]].
  *
  * IMPORTANT: because lineage is truncated, unpersisting a
  * local-checkpointed frame that will still be READ is unsafe (the
  * blocks cannot be rebuilt) — only frames that no live plan will
  * scan again may be freed.
  */
object Checkpoints {

  /** Drop the executor-storage blocks behind every STORED RDD-scan
    * leaf of `df`'s plan (localCheckpoint / persisted createDataFrame
    * leaves). Leaves with no storage (StorageLevel.NONE) are left
    * untouched, so a plan mixing a checkpointed frame with an
    * unpersisted caller RDD only frees the former. No-op for plans
    * with no stored scan. Safe only once nothing will read `df` (or
    * another frame sharing its leaves) again. */
  def unpersist(df: Dataset[_], blocking: Boolean = false): Unit =
    df.queryExecution.analyzed.foreach {
      case l: LogicalRDD if l.rdd.getStorageLevel != StorageLevel.NONE =>
        l.rdd.unpersist(blocking)
      case _ => ()
    }

  /** Consume-and-free: apply `f` — the caller's one materialization
    * (collect, write, count) — to a checkpointed result frame, then
    * drop the frame's storage, also when `f` throws. The
    * library-caller face of the hygiene contract:
    * `consume(dedupClusters(pairs))(_.collect())` cannot leak a
    * result frame per call the way a forgotten [[unpersist]] does
    * (CheckpointHygieneSpec pins flat storage across repeated calls).
    * After it returns the frame must not be scanned again — lineage
    * is truncated, the rows are gone. */
  def consume[R, T](df: Dataset[R], blocking: Boolean = false)(
      f: Dataset[R] => T): T =
    try f(df) finally unpersist(df, blocking)

  /** IDs of RDDs currently registered in executor storage — the
    * bench-hygiene observable: iterative operators must leave at most
    * their RESULT frame here, never per-round intermediates. */
  def retainedRddIds(spark: SparkSession): Set[Int] =
    spark.sparkContext.getPersistentRDDs.keySet.toSet
}
