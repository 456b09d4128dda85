package graft.io

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.util.LongAccumulator

/** Document-store bulk sink (reference K2/K3, client.py:54-102 +
  * indexer.py:115-178): NDJSON `_bulk`-protocol batches with per-doc
  * deterministic `_id`s and ok/fail accounting.
  *
  * Transport is injectable (`BulkTransport`) so the sink is testable
  * without a live store and portable across stores speaking the
  * action/doc NDJSON protocol. Batching happens per partition on the
  * executors — the driver never sees documents, so throughput scales
  * with the cluster, and batch size is the payload-size knob (the
  * reference drops it to 50 for the huge blame docs; same knob here).
  */
object BulkSink {

  /** One flush of `batch` NDJSON action/doc line pairs → number of
    * docs that failed. Implementations must be Serializable (executed
    * on executors). */
  trait BulkTransport extends Serializable {
    def flush(index: String, ndjsonLines: Seq[String]): Int
  }

  /** Result accumulators: visible on the driver after the job.
    * Accumulator semantics are at-least-once under task retries — a
    * re-run partition re-flushes (the deterministic `_id`s make that
    * an upsert at the store, not duplication) and re-counts, so after
    * retries the counts can exceed the distinct-doc total. Exact
    * accounting at scale comes from the store's own response stats;
    * these counters are the reference's ok/fail progress numbers
    * (indexer.py:165-177), not a ledger. */
  final case class BulkResult(ok: Long, failed: Long)

  /** Write df to `index`: each row becomes an action line carrying the
    * deterministic id plus a doc line (the row as JSON). Returns
    * ok/fail counts aggregated across all partitions. */
  def write(df: DataFrame, index: String, idExpr: Column,
      transport: BulkTransport, batchSize: Int = 500): BulkResult = {
    val spark = df.sparkSession
    val okAcc: LongAccumulator = spark.sparkContext.longAccumulator(s"$index-ok")
    val failAcc: LongAccumulator = spark.sparkContext.longAccumulator(s"$index-fail")

    // The action line is built with to_json, not string interpolation:
    // ids derive from arbitrary record fields (logins, repo names) and
    // a quote/backslash/control char in one would otherwise emit
    // invalid NDJSON and fail the whole batch at a real store.
    // null ids render as the literal "null" id rather than vanishing:
    // to_json drops null fields, and an action line without _id makes
    // the store auto-generate one — re-indexing would then duplicate
    // instead of upsert.
    val payload = df.select(
      to_json(struct(struct(
        lit(index).as("_index"),
        coalesce(idExpr.cast("string"), lit("null")).as("_id"))
        .as("index"))).as("_action"),
      to_json(struct(df.columns.toIndexedSeq.map(col): _*)).as("_doc"))

    payload.foreachPartition {
      (rows: Iterator[org.apache.spark.sql.Row]) =>
        rows.grouped(batchSize).foreach { batch =>
          val lines = batch.flatMap { r =>
            Seq(r.getString(0), r.getString(1))
          }
          val failed = transport.flush(index, lines)
          okAcc.add(batch.size - failed)
          failAcc.add(failed)
        }
    }
    BulkResult(okAcc.value, failAcc.value)
  }

  /** File-backed transport: appends each flush as one NDJSON file per
    * (partition, batch) under `dir` — the replay/test stand-in for an
    * HTTP `_bulk` endpoint. */
  final class FileTransport(dir: String) extends BulkTransport {
    override def flush(index: String, lines: Seq[String]): Int = {
      val d = new java.io.File(dir, index)
      d.mkdirs()
      val f = java.io.File.createTempFile("bulk-", ".ndjson", d)
      val w = new java.io.PrintWriter(f, "UTF-8")
      try lines.foreach(w.println) finally w.close()
      0
    }
  }
}
