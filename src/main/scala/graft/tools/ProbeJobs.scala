package graft.tools

import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ops.FullText
import graft.queries.SimilarityQueries

/** Job/task-count attribution for the stored-index lifecycle phases
  * (r18 optimization round): each phase's wall time is broken into
  * how many Spark JOBS it launches and the summed task time, so the
  * per-mutation fixed cost (driver scheduling + commit protocol) is
  * separated from real compute. Usage:
  * `runMain graft.tools.ProbeJobs [sfDir] [text|vector]`. */
object ProbeJobs {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val fam = if (args.length > 1) args(1) else "both"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.files.openCostInBytes", 524288L)
      .config("spark.sql.adaptive.enabled",
        (!sys.env.contains("GRAFT_PROBE_NOAQE")).toString)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val jobs = new AtomicInteger(0)
    val tasks = new AtomicInteger(0)
    val taskMs = new AtomicLong(0L)
    val verbose = sys.env.contains("GRAFT_PROBE_VERBOSE")
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        jobs.incrementAndGet()
        if (verbose) {
          val cs = Option(j.properties)
            .map(_.getProperty("callSite.short", "?")).getOrElse("?")
          println(s"  job ${j.jobId}: $cs (${j.stageInfos.map(_.numTasks).sum} tasks)")
        }
      }
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        tasks.incrementAndGet()
        if (t.taskInfo != null)
          taskMs.addAndGet(t.taskInfo.duration)
      }
    })
    if (verbose)
      spark.listenerManager.register(
        new org.apache.spark.sql.util.QueryExecutionListener {
          override def onSuccess(funcName: String,
              qe: org.apache.spark.sql.execution.QueryExecution,
              durationNs: Long): Unit = {
            val top = qe.logical.getClass.getSimpleName
            println(f"  sql $funcName%-12s ${durationNs / 1e9}%6.3f s  $top")
          }
          override def onFailure(funcName: String,
              qe: org.apache.spark.sql.execution.QueryExecution,
              ex: Exception): Unit = ()
        })
    spark.range(1000000).selectExpr("sum(id)").collect()
    def phase(name: String)(f: => Unit): Unit = {
      Thread.sleep(50) // drain listener queue
      val j0 = jobs.get(); val k0 = tasks.get(); val m0 = taskMs.get()
      val t0 = System.nanoTime(); f
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(200)
      println(f"PHASE $name%-14s wall=$wall%6.2f jobs=${jobs.get - j0}%3d " +
        f"tasks=${tasks.get - k0}%5d taskSec=${(taskMs.get - m0) / 1e3}%7.2f")
    }
    if (fam == "text" || fam == "both") {
      val docs = graft.io.Tables.documents(spark, sfDir)
      val wm = docs.agg(max($"doc_id")).head().getLong(0) * 4 / 5
      for (pass <- 1 to 2) {
        println(s"== text pass $pass ==")
        val idx = java.nio.file.Files
          .createTempDirectory("jobs-text").toFile.getAbsolutePath
        phase("write")(FullText.writeTextIndex(
          docs.filter($"doc_id" <= wm), "doc_id", "text", idx,
          storePositions = false, storeTermVectors = true))
        phase("append")(FullText.appendToTextIndex(spark,
          docs.filter($"doc_id" > wm), "doc_id", "text", idx))
        val dead = docs.filter($"doc_id" % 97 === 5)
          .select($"doc_id").collect().map(_.getLong(0)).toSeq
        phase("delete")(FullText.deleteFromTextIndex(spark, idx, dead))
        phase("search")(FullText.bm25SearchStored(spark, idx,
          Seq("fast", "vector", "query"), k = 20)
          .write.format("noop").mode("overwrite").save())
      }
    }
    if (fam == "imi" || fam == "opq") {
      // q153/q151 gate shapes: coarse=imi(cGrid 8)+residual / opq,
      // gate-exact search (all cells probed, corpus shortlist)
      val e = graft.io.Tables.embeddings(spark, sfDir)
        .select($"vec_id", $"embedding")
      val wm = e.agg(max($"vec_id")).head().getLong(0) * 4 / 5
      val train = e.filter($"vec_id" <= wm)
      val n = e.count().toInt
      val (codec, coarse, cGrid) =
        if (fam == "imi") ("residual", "imi", 8) else ("opq", "flat", 16)
      val allCells = if (coarse == "imi") 64 else 16
      for (pass <- 1 to 2) {
        println(s"== vector $fam pass $pass ==")
        val idx = java.nio.file.Files
          .createTempDirectory(s"jobs-$fam").toFile.getAbsolutePath
        phase("write")(SimilarityQueries.writeIvfPqIndexFrames(
          train, train, idx,
          numCells = 16, codec = codec, coarse = coarse, cGrid = cGrid))
        phase("append")(SimilarityQueries.appendToIvfPqIndex(spark, idx,
          e.filter($"vec_id" > wm)))
        phase("delete")(SimilarityQueries.deleteFromIvfPqIndex(spark, idx,
          e.filter($"vec_id" % 3 === 1).select($"vec_id")))
        phase("search")(SimilarityQueries
          .ivfPqSearchStored(spark, idx, sfDir, queryId = 0L, k = 10,
            probes = allCells, shortlist = n)
          .write.format("noop").mode("overwrite").save())
      }
    }
    if (fam == "vector" || fam == "both") {
      val e = graft.io.Tables.embeddings(spark, sfDir)
        .select($"vec_id", $"embedding")
      val wm = e.agg(max($"vec_id")).head().getLong(0) * 4 / 5
      val train = e.filter($"vec_id" <= wm)
      for (pass <- 1 to 2) {
        println(s"== vector pq pass $pass ==")
        val idx = java.nio.file.Files
          .createTempDirectory("jobs-vec").toFile.getAbsolutePath
        phase("write")(SimilarityQueries.writeIvfPqIndexFrames(
          train, train, idx))
        phase("append")(SimilarityQueries.appendToIvfPqIndex(spark, idx,
          e.filter($"vec_id" > wm)))
        phase("delete")(SimilarityQueries.deleteFromIvfPqIndex(spark, idx,
          e.filter($"vec_id" % 3 === 1).select($"vec_id")))
        phase("search")(SimilarityQueries
          .ivfPqSearchStored(spark, idx, sfDir)
          .write.format("noop").mode("overwrite").save())
      }
    }
    spark.stop()
  }
}
