package graft.tools

import org.apache.spark.sql.SparkSession

import graft.ops.FullText
import graft.queries.SimilarityQueries

/** Compaction CLI — the maintenance-window face of the stored
  * layouts (the knob every segment-cost measurement points at:
  * ~75-80 ms of manifest-union overhead per committed streaming
  * segment until a fold reclaims it): detect the index family at
  * the given path and run its compactor under the mutation lease —
  * base + segments fold minus tombstones into fresh one-file-per-
  * partition dirs, one marker cuts the generation over, tombstones
  * and superseded dirs reclaim.
  *
  * Family detection mirrors the layouts' own self-description: a
  * `meta` artifact marks the VECTOR layout; a stats artifact with a
  * `field` column marks the MULTI-FIELD text layout; otherwise
  * single-field text. `--family text|multifield|vector` overrides.
  *
  * Usage: RunCompact <indexDir> [--family <f>] [--wait <sec>]
  *          [--buckets <n>]
  *
  * `--wait <sec>` polls the mutation-lease acquisition with backoff
  * (`graft.index.leaseWaitMs`) instead of the library's fail-fast —
  * the right mode for a maintenance job queued behind a short-lived
  * refresh batch.
  *
  * `--buckets <n>` RESIZES a text layout's term-bucket partitioning
  * during the fold (the operational face of
  * [[graft.ops.FullText.compactTextIndex]]'s `rebucket` — a bucket
  * count sized for a small corpus concentrates a grown index's
  * postings into a few huge partitions). Text families only; the
  * vector layout's physical re-resolution is automatic.
  *
  * Prints one JSON line: data files before/after and surviving
  * rows. Safe to re-run (idempotent fold; a crash leaves the old
  * generation live and the next run's GC clears orphans). */
object RunCompact {

  /** Detect which compactor owns the path. */
  def detectFamily(spark: SparkSession, indexDir: String): String =
    if (graft.io.Layout.pathExists(spark, s"$indexDir/meta")) "vector"
    else {
      val art = FullText.liveArtifactDir(spark, indexDir)
      if (spark.read.parquet(s"$art/stats")
          .schema.fieldNames.contains("field")) "multifield"
      else "text"
    }

  /** Separated from main for RunCompactSpec: returns
    * (family, filesBefore, filesAfter, rows). */
  def run(spark: SparkSession, indexDir: String,
      family: Option[String] = None,
      waitSec: Option[Long] = None,
      rebucket: Option[Int] = None): (String, Long, Long, Long) =
    graft.io.Layout.withLeaseWait(spark, waitSec) {
      runInner(spark, indexDir, family, rebucket)
    }

  private def runInner(spark: SparkSession, indexDir: String,
      family: Option[String],
      rebucket: Option[Int]): (String, Long, Long, Long) = {
    val fam = family.getOrElse(detectFamily(spark, indexDir))
    if (fam == "vector" && rebucket.isDefined)
      throw new IllegalArgumentException(
        "--buckets applies to text layouts only; the vector layout " +
          "re-resolves its physical grouping automatically at the fold")
    val (b, a, r) = fam match {
      case "vector" => SimilarityQueries.compactIvfPqIndex(spark, indexDir)
      case "multifield" =>
        FullText.compactMultiFieldTextIndex(spark, indexDir,
          rebucket = rebucket)
      case "text" => FullText.compactTextIndex(spark, indexDir,
        rebucket = rebucket)
      case other => throw new IllegalArgumentException(
        s"unknown family '$other' (text | multifield | vector)")
    }
    (fam, b, a, r)
  }

  def main(args: Array[String]): Unit = {
    require(args.nonEmpty,
      "usage: RunCompact <indexDir> [--family text|multifield|vector] " +
        "[--wait <sec>] [--buckets <n>]")
    def opt(flag: String): Option[String] =
      args.indexOf(flag) match {
        case i if i >= 0 && i + 1 < args.length => Some(args(i + 1))
        case i if i >= 0 => throw new IllegalArgumentException(
          s"$flag requires a value — a silently dropped flag would " +
            "skip a durable layout change without a trace")
        case _ => None
      }
    val fam = opt("--family")
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[32]"))
      .appName("graft-compact")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val rebucket = opt("--buckets").map(_.toInt)
    val (f, b, a, r) = run(spark, args(0), fam,
      opt("--wait").map(_.toLong), rebucket)
    val bk = rebucket.map(n => s""","buckets":$n""").getOrElse("")
    println(s"""{"tool":"compact","family":"$f","files_before":$b,""" +
      s""""files_after":$a,"rows":$r$bk}""")
    spark.stop()
  }
}
