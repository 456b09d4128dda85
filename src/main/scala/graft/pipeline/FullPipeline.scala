package graft.pipeline

import org.apache.spark.sql.SparkSession

import graft.ingest.GithubClient
import graft.io.{BulkSink, Indexer}

/** End-to-end corpus pipeline (reference src/pipeline/runner.py:11-14):
  * retrieval completes before indexing — fetch every repo's nine
  * artifacts live (with per-repo crash isolation and incremental
  * refresh when `outDir` holds a prior run), then stream the whole
  * lake into the document store. The two halves stay independently
  * usable; this is the one-call composition the reference ships as
  * its top-level entry point.
  */
object FullPipeline {

  final case class Result(
      fetched: Map[String, scala.util.Try[Pipeline.RepoOutputs]],
      indexed: Map[String, BulkSink.BulkResult])

  def run(
      spark: SparkSession,
      transport: GithubClient.Transport,
      cfg: GithubClient.Config,
      repoNames: Seq[String],
      outDir: String,
      bulkTransport: BulkSink.BulkTransport,
      endpoints: LivePipeline.Endpoints = LivePipeline.Endpoints(),
      indexPrefix: String = "",
      generatedAt: String = "",
      blameFileLimit: Int = 25,
      batchSize: Int = 1000,
      ensureIndex: (String, Option[String]) => Unit = (_, _) => (),
      limits: Pipeline.Limits = Pipeline.Limits(),
      parallelism: Int = 1): Result = {
    val fetched = LivePipeline.processReposLive(spark, transport, cfg,
      repoNames, outDir, endpoints, generatedAt, blameFileLimit, limits,
      parallelism)
    val indexed = Indexer.scanAndIndex(spark, outDir, bulkTransport,
      indexPrefix, batchSize, ensureIndex = ensureIndex)
    Result(fetched, indexed)
  }
}
