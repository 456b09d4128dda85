package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

import graft.ops.FullText

/** Cross-JVM mutation-storm harness: run ONE text-index mutation
  * (append / delete / compact) from a separate process, polling the
  * mutation-lease acquisition (`--waitMs`) until the competing
  * holders release — the worker CrossJvmLeaseSpec races in twos and
  * threes against a kill -9'd holder to prove that REAL processes
  * (not just threads in one JVM, which serialize on the per-index
  * lock and never see the filesystem lease) interleave to the same
  * final index a serial rebuild produces. In-JVM storms (LeaseSpec)
  * cover the randomized schedules; this harness covers what they
  * cannot: cross-process lease contention, stale takeover of a real
  * crashed JVM, and the token-unique staging discipline under
  * genuine multi-writer pressure.
  *
  * Usage:
  *   StormWorker <indexDir> append <segmentId> <docIdBase> <n>
  *               [--waitMs <ms>] [--staleMs <ms>]
  *   StormWorker <indexDir> delete <id1,id2,...> [...]
  *   StormWorker <indexDir> compact [...]
  *   StormWorker <indexDir> vappend <sfDir> <segmentId> <mod> <rem> <offset> [...]
  *   StormWorker <indexDir> vdelete <id1,id2,...> [...]
  *   StormWorker <indexDir> vcompact [...]
  *
  * Appended content is DETERMINISTIC — text docs carry `storm doc
  * <id>` text; vector appends take the embeddings whose
  * `vec_id % mod == rem` from `sfDir`, ids shifted by `offset` — so
  * the parent spec can reconstruct the serial-rebuild corpus without
  * a side channel. Exits 0 on a landed mutation; any failure surfaces
  * as a non-zero exit the spec asserts on. */
object StormWorker {
  /** The deterministic text of storm doc `id` — ONE definition shared
    * by the worker's append and the spec's serial rebuild. */
  def stormDocText(id: Long): String = s"fast vector storm doc $id"

  def main(args: Array[String]): Unit = {
    require(args.length >= 2,
      "usage: StormWorker <indexDir> append <segId> <base> <n> | " +
        "delete <ids> | compact [--waitMs <ms>] [--staleMs <ms>]")
    val indexDir = args(0)
    val op = args(1)
    def opt(flag: String): Option[String] =
      args.indexOf(flag) match {
        case i if i >= 0 && i + 1 < args.length => Some(args(i + 1))
        case _ => None
      }
    val spark = SparkSession.builder()
      .master("local[2]")
      .appName(s"graft-storm-$op")
      .config("spark.sql.shuffle.partitions", 2)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    spark.conf.set("graft.index.leaseWaitMs",
      opt("--waitMs").getOrElse("120000"))
    opt("--staleMs").foreach(
      spark.conf.set("graft.index.leaseStaleMs", _))
    op match {
      case "append" =>
        val sid = args(2)
        val base = args(3).toLong
        val n = args(4).toInt
        val docs = (0 until n)
          .map(i => (base + i, stormDocText(base + i)))
          .toDF("doc_id", "text")
        FullText.appendToTextIndex(spark, docs, "doc_id", "text",
          indexDir, segmentId = Some(sid))
      case "delete" =>
        val ids = args(2).split(',').map(_.trim.toLong).toSeq
        FullText.deleteFromTextIndex(spark, indexDir, ids)
      case "compact" =>
        FullText.compactTextIndex(spark, indexDir)
      case "vappend" =>
        val sfDir = args(2)
        val sid = args(3)
        val mod = args(4).toLong
        val rem = args(5).toLong
        val offset = args(6).toLong
        val fresh = graft.io.Tables.embeddings(spark, sfDir)
          .filter(col("vec_id") % mod === rem)
          .select((col("vec_id") + offset).as("vec_id"), col("embedding"))
        graft.queries.SimilarityQueries.appendToIvfPqIndex(spark,
          indexDir, fresh, segmentId = Some(sid))
      case "vdelete" =>
        val ids = args(2).split(',').map(_.trim.toLong).toSeq
        graft.queries.SimilarityQueries.deleteFromIvfPqIndex(spark,
          indexDir, ids)
      case "vcompact" =>
        graft.queries.SimilarityQueries.compactIvfPqIndex(spark, indexDir)
      case other =>
        throw new IllegalArgumentException(
          s"unknown storm op '$other' " +
            "(append | delete | compact | vappend | vdelete | vcompact)")
    }
    spark.stop()
  }
}
