package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every SparkEntry query against
  * SPARK_GRAFT_SF_DIR and prints one JSON line. Queries are fully
  * evaluated through the `noop` sink — a bare .count() would let
  * Catalyst prune every per-row computed column and understate the
  * compute-heavy queries — and run in sorted name order after a small
  * warmup job so JIT/codegen startup isn't charged to the first query.
  */
object Bench {

  /** The host's 1-minute load average, read from /proc/loadavg —
    * recorded at bench start AND end in both JSON lines, because the
    * per-query `"passes"` spread only catches contention SPIKES: a
    * co-tenant that drags the whole run uniformly (the r14 driver run:
    * 27.7k bulk docs/s vs 207k solo, untouched queries at 4×) inflates
    * every pass equally and needed a judge shell to diagnose. With the
    * load bracket in-artifact, a drag run self-explains. -1.0 when the
    * file is unreadable (non-Linux host). */
  private def loadAvg(): Double =
    try {
      val src = scala.io.Source.fromFile("/proc/loadavg", "UTF-8")
      try src.mkString.split(' ').head.toDouble finally src.close()
    } catch { case _: Exception => -1.0 }

  def main(args: Array[String]): Unit = {
    val loadStart = loadAvg()
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // The test tables are single small parquet files; the default
      // 4 MB per-file open-cost floor caps e.g. the 10.8 MB lineitem
      // at ~3 input splits, idling 29 of 32 cores through every scan
      // stage. 512 KB lets the split math follow bytes-per-core. On a
      // real warehouse (many ≥128 MB files) maxPartitionBytes
      // dominates and this floor is irrelevant.
      .config("spark.sql.files.openCostInBytes", 524288L)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warmup so one-time JVM/codegen/file-index costs aren't charged to
    // the alphabetically-first query: a shuffle-agg over range, plus a
    // parquet scan + broadcast join + hash aggregate over the two tiny
    // dimension tables of the BENCH's OWN sf dir (present by
    // definition) to compile the reader and join/agg codegen paths.
    spark.range(1000000).selectExpr("sum(id)").collect()
    try {
      import org.apache.spark.sql.functions._
      graft.io.Tables.nation(spark, sfDir)
        .join(broadcast(graft.io.Tables.region(spark, sfDir)),
          col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name")).agg(count(lit(1)))
        .write.format("noop").mode("overwrite").save()
      // ...and the DECIMAL sum-aggregate codegen path over the tiny
      // nation table: q01 runs first alphabetically, and without this
      // its measurement absorbed ~1 s of one-time decimal-agg JIT the
      // warmups above don't reach.
      graft.io.Tables.nation(spark, sfDir)
        .groupBy(col("n_regionkey"))
        .agg(sum(col("n_nationkey").cast("decimal(18,2)")).cast("double"))
        .write.format("noop").mode("overwrite").save()
      // ...and the Window + BroadcastNestedLoopJoin (crossJoin of a
      // broadcast 1-row aggregate) class-load/codegen paths that q51's
      // BM25 plan pays: measured ~3 s of one-time cost in shared-JVM
      // driver runs (PLANS.md), which made q51's driver-bench number a
      // phantom 8-15x regression for several rounds. Same tiny nation
      // frame — milliseconds of real work.
      graft.io.Tables.nation(spark, sfDir)
        .withColumn("c", count(lit(1)).over(
          org.apache.spark.sql.expressions.Window
            .partitionBy(col("n_regionkey"))))
        .crossJoin(broadcast(
          graft.io.Tables.region(spark, sfDir).agg(count(lit(1)).as("n"))))
        .withColumn("s", round(log(col("c") + col("n")), 4))
        .write.format("noop").mode("overwrite").save()
    } catch { case e: Throwable =>
      System.err.println(s"[bench] warmup failed (timings for the " +
        s"first query may include one-time costs): ${e.getMessage}")
    }
    // Each query is timed SPARK_GRAFT_PASSES times (default 2) and
    // the MIN is reported. The driver runs this bench co-tenant with
    // other processes on the host, and a single timed pass has shown
    // up-to-20x inflation on pure per-row maps purely from CPU
    // contention (BENCH_r08 vs the same queries solo). min-of-N is
    // the standard benchmarking defense: contention spikes are
    // uncorrelated across passes, so the min tracks the true cost far
    // more tightly. ALL passes are emitted ("passes") plus a "noisy"
    // list of queries whose pass spread exceeds 3x — the artifact
    // carries its own co-tenancy evidence, so a spike on an untouched
    // query self-diagnoses as contention instead of demanding a solo
    // re-run to refute a phantom regression (the r11-r13 pattern).
    // SPARK_GRAFT_QUERIES (comma-separated names) restricts the run —
    // the solo per-query measurement knob; default is every query.
    val passes = sys.env.getOrElse("SPARK_GRAFT_PASSES", "2").toInt.max(1)
    val subset = sys.env.get("SPARK_GRAFT_QUERIES")
      .map(_.split(',').map(_.trim).filter(_.nonEmpty).toSet)
    val selected = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => subset.forall(_.contains(n)) }
    val results = selected.map {
      case (name, fn) =>
        def onePass(): Double = {
          val t0 = System.nanoTime()
          try {
            // Iterative queries (q35/q39) return a checkpointed result
            // frame; consume releases its blocks once evaluated — even
            // when the write THROWS, or the orphaned blocks would skew
            // every later query (the bench-hygiene invariant).
            graft.ops.Checkpoints.consume(fn(spark, sfDir))(
              _.write.format("noop").mode("overwrite").save())
            (System.nanoTime() - t0) / 1e9
          } catch { case e: Throwable =>
            System.err.println(s"[bench] $name failed: ${e.getMessage}")
            // A failed pass still reports its elapsed time (never 0 —
            // that would read as impossibly fast) and skips the retry.
            -((System.nanoTime() - t0) / 1e9)
          }
        }
        // a failed pass (negative) stops the retries; its elapsed time
        // reports as the single recorded pass
        val ts = scala.collection.mutable.ArrayBuffer[Double]()
        var failed = false
        while (ts.length < passes && !failed) {
          val t = onePass()
          if (t < 0) { failed = true; if (ts.isEmpty) ts += -t }
          else ts += t
        }
        (name, ts.min, ts.toSeq)
    }
    // noisy = spread (max/min over passes) beyond 3x on a query whose
    // best pass is non-trivial (>= 0.1 s — ratio on a 20 ms query is
    // scheduler jitter, not co-tenancy evidence)
    val noisy = results.collect {
      case (name, best, ts)
        if ts.length > 1 && best >= 0.1 && ts.max / ts.min > 3.0 => name
    }
    val noisyJson = noisy.map("\"" + _ + "\"").mkString("[", ",", "]")
    val qs = results.map { case (k, v, _) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val passJson = results.map { case (k, _, ts) =>
      "\"" + k + "\":" + ts.map(t => f"$t%.3f").mkString("[", ",", "]")
    }.mkString("{", ",", "}")
    val total = results.map(_._2).sum

    // Bulk-sink throughput, the reference's headline indexing metric
    // (BASELINE.md: ~5-7k docs/s ES bulk): orders rows → NDJSON
    // action/doc batches with deterministic ids via the file transport.
    val bulkDir = java.nio.file.Files.createTempDirectory("graft-bulk")
    val docsPerSec = try {
      import org.apache.spark.sql.functions._
      val orders = graft.io.Tables.orders(spark, sfDir)
      val t0 = System.nanoTime()
      val res = graft.io.BulkSink.write(orders, "orders",
        concat_ws("#", lit("tpch"), lit("order"), col("o_orderkey")),
        new graft.io.BulkSink.FileTransport(bulkDir.toString), 500)
      res.ok / ((System.nanoTime() - t0) / 1e9)
    } catch { case _: Throwable => -1.0 } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(bulkDir).iterator().asScala.toSeq.reverse
        .foreach(p => java.nio.file.Files.deleteIfExists(p))
    }

    // the load BRACKET (start + end of the whole run): sustained
    // co-tenant drag — which inflates all passes equally and so
    // evades the spread-based "noisy" flag — shows up here as a high
    // load average on a run whose numbers sit above their solo bands
    val loadEnd = loadAvg()
    val loads = s""""load_start":$loadStart,"load_end":$loadEnd"""
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"passes":$passJson,"noisy":$noisyJson,"bulk_sink_docs_per_sec":${docsPerSec.round},$loads,"sf":"$sfDir"}""")
    // The driver records only the trailing ~2 KB of stdout, and the
    // full per-query line above outgrows that window (~150 queries ×
    // ~30 chars), losing its HEAD — totals included. This compact
    // summary is the FINAL line precisely so the headline numbers
    // always survive the tail capture. "noisy" repeats here for the
    // same reason: the self-diagnosis must survive truncation.
    val slowest = results.sortBy(-_._2).take(5)
      .map { case (k, v, _) => "\"" + k + "\":" + f"$v%.2f" }
      .mkString("{", ",", "}")
    println(s"""{"metric":"summary","total_s":${f"$total%.1f"},"n_queries":${results.size},"bulk_sink_docs_per_sec":${docsPerSec.round},"noisy":$noisyJson,$loads,"slowest5":$slowest,"sf":"$sfDir"}""")
    spark.stop()
  }
}
