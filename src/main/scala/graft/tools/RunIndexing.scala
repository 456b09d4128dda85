package graft.tools

import org.apache.spark.sql.SparkSession

import graft.io.{BulkSink, HttpBulkTransport, Indexer}

/** CLI for the indexing half of the pipeline (reference
  * run_indexing.py → src/indexing/runner.py + config.py:41-97): scan
  * a lake directory and bulk-index the nine entities into a live
  * document store with their typed mappings.
  *
  * Flag surface mirrors config.py:45-57 (`--data-dir --es-url
  * --username --password --api-key --verify-tls --prefix
  * --batch-size --dry-run`); defaults resolve from the
  * `elasticsearch` section of `local_secrets.json`
  * (config.py:15-23), then hardcoded fallbacks. The reference ships
  * with HARDLOCK=True (config.py:16,85-87 — parsed CLI args are
  * DISCARDED in favor of the secrets-derived settings); that lockdown
  * is reproduced behind `--hardlock` rather than as the default,
  * because a CLI that ignores its own flags is a footgun.
  *
  * Auth precedence = client.py:27-29: non-empty api_key wins, else
  * username+password basic auth, else anonymous.
  */
object RunIndexing {

  final case class Settings(
      dataDir: String,
      esUrl: String,
      username: Option[String],
      password: Option[String],
      apiKey: Option[String],
      verifyTls: Boolean,
      prefix: String,
      batchSize: Int,
      dryRun: Boolean)

  /** Secrets-derived defaults (config.py:15-23). */
  def defaults(secrets: com.fasterxml.jackson.databind.JsonNode): Settings = {
    val es = LocalSecrets.section(secrets, "elasticsearch")
    Settings(
      dataDir = "./output",
      esUrl = LocalSecrets.str(es, "url").getOrElse("http://localhost:9200"),
      username = LocalSecrets.str(es, "username"),
      password = LocalSecrets.str(es, "password"),
      apiKey = LocalSecrets.str(es, "api_key").filter(_.nonEmpty),
      verifyTls = LocalSecrets.bool(es, "verify_tls", default = false),
      prefix = LocalSecrets.str(es, "index_prefix").getOrElse(""),
      batchSize = LocalSecrets.int(es, "batch_size", 500),
      dryRun = false)
  }

  /** `--flag value` / boolean-flag parser over the config.py surface.
    * Unknown flags fail fast with the usage line (argparse behavior);
    * `--hardlock` discards every other flag (config.py:85-87). */
  def parseArgs(args: Seq[String], base: Settings): Settings = {
    var s = base
    var hardlock = false
    var i = 0
    def value(flag: String): String = {
      i += 1
      require(i < args.length, s"$flag needs a value")
      args(i)
    }
    while (i < args.length) {
      args(i) match {
        case "--data-dir" => s = s.copy(dataDir = value("--data-dir"))
        case "--es-url" => s = s.copy(esUrl = value("--es-url"))
        case "--username" => s = s.copy(username = Some(value("--username")))
        case "--password" => s = s.copy(password = Some(value("--password")))
        case "--api-key" =>
          s = s.copy(apiKey = Some(value("--api-key")).filter(_.nonEmpty))
        case "--verify-tls" => s = s.copy(verifyTls = true)
        case "--prefix" => s = s.copy(prefix = value("--prefix"))
        case "--batch-size" =>
          s = s.copy(batchSize = value("--batch-size").toInt)
        case "--dry-run" => s = s.copy(dryRun = true)
        case "--hardlock" => hardlock = true
        case other => throw new IllegalArgumentException(
          s"unknown flag '$other'; flags: --data-dir --es-url --username " +
            "--password --api-key --verify-tls --prefix --batch-size " +
            "--dry-run --hardlock")
      }
      i += 1
    }
    if (hardlock) base else s
  }

  def transportFor(s: Settings): HttpBulkTransport = {
    val auth = s.apiKey match {
      case Some(k) => HttpBulkTransport.apiKey(k)
      case None => (s.username, s.password) match {
        case (Some(u), Some(p)) => HttpBulkTransport.basic(u, p)
        case _ => None
      }
    }
    new HttpBulkTransport(s.esUrl, auth, verifyTls = s.verifyTls)
  }

  def localSession(appName: String): SparkSession = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    SparkSession.builder()
      .appName(appName)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
  }

  /** Resolved-settings runner, reusable by [[RunPipeline]]
    * (runner.py:22-35 main). */
  def run(spark: SparkSession, s: Settings): Map[String, BulkSink.BulkResult] = {
    val transport = transportFor(s)
    val results = Indexer.scanAndIndex(spark, s.dataDir, transport,
      indexPrefix = s.prefix, batchSize = s.batchSize,
      ensureIndex = transport.ensureIndex, dryRun = s.dryRun)
    results.toSeq.sortBy(_._1).foreach { case (entity, r) =>
      val tag = if (s.dryRun) "parsed" else "indexed"
      println(s"[indexing] $entity: $tag ok=${r.ok} failed=${r.failed}")
    }
    results
  }

  def main(args: Array[String]): Unit = {
    val settings = parseArgs(args.toSeq, defaults(LocalSecrets.load()))
    val spark = localSession("graft-indexing")
    try run(spark, settings) finally spark.stop()
  }
}
