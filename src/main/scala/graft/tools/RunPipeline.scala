package graft.tools

import java.time.format.DateTimeFormatter
import java.time.{Instant, ZoneOffset}

import graft.ingest.{GithubClient, HttpTransport}
import graft.pipeline.{LivePipeline, Pipeline}

/** CLI for the full retrieval → indexing pipeline (reference
  * run_pipeline.py → src/pipeline/runner.py: "ensures retrieval
  * completes before indexing"): fetch every repo's nine artifacts
  * live into the output lake, then bulk-index the lake.
  *
  * Arg surface mirrors the reference's (runner.py:17-19): every
  * argument containing `/` is an `owner/repo` name; with none given
  * the built-in corpus list runs (retrieval config.py:31-47 REPOS).
  * Indexing flags after `--` pass through to [[RunIndexing]] (the
  * reference forwards `indexing_args`). GitHub tokens come from
  * `github_tokens` in `local_secrets.json` (config.py:10-11).
  *
  * Retrieval knobs stay environment variables, exactly the
  * reference's names and defaults (config.py:20-30): MAX_PAGES_COMMITS
  * / MAX_PAGES_PRS / MAX_PRS_WITH_LINKED_ISSUES / BLAME_FILE_LIMIT
  * (0 = uncapped) plus GRAFT_PARALLELISM for the multi-repo overlap
  * (engine extension; the reference is serial).
  */
object RunPipeline {

  /** Default corpus (reference retrieval config.py:31-47). */
  val defaultRepos: Seq[String] = Seq(
    "micromatch/micromatch", "laravel-mix/laravel-mix",
    "standard/standard", "istanbuljs/nyc", "axios/axios",
    "reduxjs/redux", "rollup/rollup", "apache/spark",
    "grafana/grafana", "pandas-dev/pandas", "django/django",
    "prettier/prettier", "numpy/numpy", "flutter/flutter",
    "torvalds/linux")

  private def envInt(name: String, default: Int): Int =
    sys.env.get(name).flatMap(_.toIntOption).getOrElse(default)

  /** Repo names from CLI args (anything containing `/`), else the
    * built-in corpus — runner.py:17-19's filter. */
  def reposFrom(args: Seq[String]): Seq[String] =
    args.filter(_.contains("/")) match {
      case Seq() => defaultRepos
      case named => named
    }

  /** Retrieval half (retrieval runner.py main): fetch every repo's
    * nine artifacts live into `outDir`, incremental when a prior run
    * is present. Returns per-repo outcomes. */
  def retrieve(spark: org.apache.spark.sql.SparkSession,
      repos: Seq[String], outDir: String)
      : Map[String, scala.util.Try[Pipeline.RepoOutputs]] = {
    val secrets = LocalSecrets.load()
    val cfg = GithubClient.Config(
      tokens = LocalSecrets.strings(secrets, "github_tokens"),
      maxRetries = 6) // config.py:17 MAX_RETRIES floor
    val limits = Pipeline.Limits(
      maxPrsWithLinkedIssues = envInt("MAX_PRS_WITH_LINKED_ISSUES", 0),
      maxPagesPrs = envInt("MAX_PAGES_PRS", 0),
      maxPagesCommits = envInt("MAX_PAGES_COMMITS", 0))
    val generatedAt = DateTimeFormatter.ISO_INSTANT
      .format(Instant.now().atOffset(ZoneOffset.UTC).toInstant)
    val fetched = LivePipeline.processReposLive(spark,
      new HttpTransport(), cfg, repos, outDir,
      generatedAt = generatedAt,
      blameFileLimit = envInt("BLAME_FILE_LIMIT", 0),
      limits = limits,
      parallelism = envInt("GRAFT_PARALLELISM", 1))
    fetched.toSeq.sortBy(_._1).foreach {
      case (repo, scala.util.Success(_)) =>
        println(s"[pipeline] $repo: fetched")
      case (repo, scala.util.Failure(e)) =>
        println(s"[pipeline] $repo: FAILED ${e.getMessage}")
    }
    fetched
  }

  def main(args: Array[String]): Unit = {
    val (pipelineArgs, indexingArgs) = args.indexOf("--") match {
      case -1 => (args.toSeq, Seq.empty[String])
      case i => (args.take(i).toSeq, args.drop(i + 1).toSeq)
    }
    val indexing = RunIndexing.parseArgs(indexingArgs,
      RunIndexing.defaults(LocalSecrets.load()))
    val spark = RunIndexing.localSession("graft-pipeline")
    try {
      retrieve(spark, reposFrom(pipelineArgs), indexing.dataDir)
      RunIndexing.run(spark, indexing)
    } finally spark.stop()
  }
}

/** Retrieval-only CLI (reference run_retrieval.py): same repo-name
  * arg filter, artifacts land in `--out-dir` (default ./output), no
  * indexing step. */
object RunRetrieval {
  def main(args: Array[String]): Unit = {
    val outDir = args.sliding(2).collectFirst {
      case Array("--out-dir", d) => d
    }.getOrElse("./output")
    // strip the flag AND its value before the '/'-filter — a path
    // value would otherwise be mistaken for an owner/repo name
    val repoArgs = args.toSeq.foldLeft((Seq.empty[String], false)) {
      case ((acc, true), _) => (acc, false) // skip the flag's value
      case ((acc, false), "--out-dir") => (acc, true)
      case ((acc, false), a) => (acc :+ a, false)
    }._1
    val spark = RunIndexing.localSession("graft-retrieval")
    try RunPipeline.retrieve(spark, RunPipeline.reposFrom(repoArgs), outDir)
    finally spark.stop()
  }
}
