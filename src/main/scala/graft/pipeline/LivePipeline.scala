package graft.pipeline

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

import graft.ingest.{BlameFetch, GithubClient}
import graft.io.JsonEntities
import graft.model.Entities

/** Live-mode process_repo (reference runner.py:27-77 against the real
  * GitHub API): the same derivation DAG as `Pipeline.deriveAll`, with
  * every input fetched through the injectable transport — REST
  * pagination for the five raw entities, point lookups for PR commits
  * / merge-commit details / external issue details (the reference's
  * memo-dict caches, here dedup→fetch→join), and GraphQL blame with
  * the ref→object fallback.
  *
  * Driver-side loops iterate only DEDUPLICATED key sets (PR numbers,
  * merge SHAs, distinct external refs, capped blame paths) — the same
  * per-item HTTP granularity as the reference, which is the API's
  * granularity; all heavy derivation stays in Spark. Tests drive the
  * whole thing through a scripted transport (no network), live runs
  * pass `new HttpTransport()`.
  */
object LivePipeline {

  final case class Endpoints(
      apiBase: String = "https://api.github.com",
      graphql: String = "https://api.github.com/graphql")

  private def readEntity(spark: SparkSession, records: Seq[String],
      schema: StructType): DataFrame = {
    import spark.implicits._
    if (records.isEmpty)
      spark.createDataFrame(spark.sparkContext.emptyRDD[Row], schema)
    else spark.read.schema(schema).json(records.toDS())
  }

  /** Fetch one repo's nine artifacts live and persist them; returns
    * the derived outputs. blameFileLimit mirrors BLAME_FILE_LIMIT (W2). */
  def processRepoLive(
      spark: SparkSession,
      transport: GithubClient.Transport,
      cfg: GithubClient.Config,
      repoName: String,
      outDir: String,
      endpoints: Endpoints = Endpoints(),
      generatedAt: String = "",
      blameFileLimit: Int = 25): Pipeline.RepoOutputs = {
    import GithubClient.{getWithRetry, paginate}
    val Array(owner, repo) = repoName.split("/", 2)
    val base = s"${endpoints.apiBase}/repos/$owner/$repo"

    // Raw entities (runner.py:36-53): paginated REST scans.
    val repoMeta = readEntity(spark,
      paginate(transport, cfg, base, repoName), Entities.repoMeta)
    val issues = readEntity(spark,
      paginate(transport, cfg, s"$base/issues?state=all", repoName),
      Entities.issue)
    val prs = readEntity(spark,
      paginate(transport, cfg, s"$base/pulls?state=all", repoName),
      Entities.pullRequest)
    val contributors = readEntity(spark,
      paginate(transport, cfg, s"$base/contributors", repoName),
      Entities.contributor)
    val commits = readEntity(spark,
      paginate(transport, cfg, s"$base/commits", repoName), Entities.commit)

    // S4/S5 point lookups over deduplicated key sets.
    val prNumbers = prs.select(col("number")).collect().map(_.getLong(0))
    val prCommitRecords = prNumbers.flatMap { n =>
      paginate(transport, cfg, s"$base/pulls/$n/commits", repoName)
        .map(r => s"""{"pr_number":$n,"rec":$r}""")
    }.toSeq
    val prCommits = readEntity(spark, prCommitRecords,
      StructType(Seq(
        org.apache.spark.sql.types.StructField("pr_number",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("rec", Entities.commit))))
      .select(col("pr_number"), col("rec.commit.message").as("message"))

    val mergeShas = prs.select(col("merge_commit_sha"))
      .filter(col("merge_commit_sha").isNotNull)
      .distinct().collect().map(_.getString(0))
    val commitDetailRecords = mergeShas.map { sha =>
      val resp = getWithRetry(transport, cfg, s"$base/commits/$sha")
      if (resp.status == 422)
        s"""{"sha":"$sha","message":null,"error":"invalid_sha"}"""
      else if (resp.status >= 200 && resp.status < 300) {
        // flatten to the linker's (sha, message, error) detail shape
        val parsed = readEntity(spark, Seq(resp.body), Entities.commit)
          .select(col("sha"), col("commit.message").as("message"))
          .collect().headOption
        parsed.map(r => s"""{"sha":"$sha","message":${GithubClient.jsonString(r.getString(1))},""" +
          """"error":null}""").getOrElse(
          s"""{"sha":"$sha","message":null,"error":null}""")
      } else s"""{"sha":"$sha","message":null,"error":"http_${resp.status}"}"""
    }.toSeq
    val detailSchema = StructType(Seq(
      org.apache.spark.sql.types.StructField("sha",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("message",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("error",
        org.apache.spark.sql.types.StringType)))
    val commitDetails = readEntity(spark, commitDetailRecords, detailSchema)

    // External refs: first extraction pass with empty details surfaces
    // the distinct misses (the reference's unique_refs set,
    // linkers.py:132-134); fetch each once; the final derive joins the
    // resolved authors. Targets of cross-repo links get the same
    // treatment (linkers.py:251,283-287).
    def emptyOf(s: StructType): DataFrame =
      spark.createDataFrame(spark.sparkContext.emptyRDD[Row], s)
    val probe = Pipeline.deriveAll(repoName, Pipeline.RepoInputs(
      repoMeta, issues, prs, contributors, commits,
      prCommits, commitDetails,
      emptyOf(Pipeline.issueDetailsSchema),
      emptyOf(Pipeline.targetDetailsSchema),
      emptyOf(Pipeline.blameRangesSchema)), generatedAt)

    val externalRefs = probe.prsWithLinkedIssues
      .select(explode(col("links")).as("l"))
      .filter(col("l.issue_author").isNull) // cache miss after local seed
      .select(lower(col("l.referenced_repo")).as("r"),
        col("l.issue_number").as("n"))
      .distinct().collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val extDetails = readEntity(spark, externalRefs.toSeq.map { case (r, n) =>
      val resp = getWithRetry(transport, cfg,
        s"${endpoints.apiBase}/repos/$r/issues/$n")
      if (resp.status >= 200 && resp.status < 300) {
        val author = readEntity(spark, Seq(resp.body), Entities.issue)
          .select(col("user.login")).collect().headOption
          .flatMap(x => Option(x.getString(0)))
        s"""{"repo_name":${GithubClient.jsonString(r)},"number":$n,"author":${GithubClient.jsonString(author.orNull)}}"""
      } else s"""{"repo_name":${GithubClient.jsonString(r)},"number":$n,"author":null}"""
    }, Pipeline.issueDetailsSchema)

    val targetRefs = probe.crossRepoLinks
      .select(lower(col("target.repo_name")).as("r"),
        col("target.number").as("n"))
      .distinct().collect().map(r => (r.getString(0), r.getLong(1)))
    val targetDetails = readEntity(spark, targetRefs.toSeq.flatMap {
      case (r, n) =>
        val resp = getWithRetry(transport, cfg,
          s"${endpoints.apiBase}/repos/$r/issues/$n")
        if (resp.status >= 200 && resp.status < 300) {
          val row = readEntity(spark, Seq(resp.body), Entities.issue)
            .select(col("user.login").as("a"), col("html_url").as("u"),
              col("created_at").as("c"),
              col("pull_request").isNotNull.as("p"))
            .collect().headOption
          row.map(x => s"""{"repo_name":${GithubClient.jsonString(r)},"number":$n,""" +
            s""""is_pr":${x.getBoolean(3)},"created_at":${GithubClient.jsonString(x.getString(2))},""" +
            s""""url":${GithubClient.jsonString(x.getString(1))},"author":${GithubClient.jsonString(x.getString(0))}}""")
        } else None // 404 ⇒ join miss ⇒ null-target row kept downstream
    }, Pipeline.targetDetailsSchema)

    // Blame (runner.py:73-75): branch → tree listing → capped paths →
    // per-file GraphQL blame with the ref→object fallback.
    val defaultBranch = repoMeta.select(col("default_branch")).collect()
      .headOption.flatMap(r => Option(r.getString(0))).getOrElse("main")
    val treeResp = getWithRetry(transport, cfg,
      s"$base/git/trees/$defaultBranch?recursive=1")
    val blamePaths: Seq[String] =
      if (treeResp.status < 200 || treeResp.status >= 300) Seq.empty
      else {
        import spark.implicits._
        val treeSchema = StructType(Seq(
          org.apache.spark.sql.types.StructField("tree",
            org.apache.spark.sql.types.ArrayType(StructType(Seq(
              org.apache.spark.sql.types.StructField("path",
                org.apache.spark.sql.types.StringType),
              org.apache.spark.sql.types.StructField("type",
                org.apache.spark.sql.types.StringType)))))))
        spark.read.schema(treeSchema).json(Seq(treeResp.body).toDS())
          .select(explode(col("tree")).as("t"))
          .filter(col("t.type") === "blob")
          .select(col("t.path")).collect().map(_.getString(0)).toSeq
          .take(if (blameFileLimit > 0) blameFileLimit else Int.MaxValue)
      }
    // Per-file failures warn and skip, exactly collectors.py:386-389;
    // empty blame results union to nothing (the reference's skip).
    val blameRanges = blamePaths.flatMap { p =>
      scala.util.Try(BlameFetch.fetchFileBlame(spark, transport, cfg,
        endpoints.graphql, owner, repo, defaultBranch, p)) match {
        case scala.util.Success(df) => Some(df)
        case scala.util.Failure(e) =>
          System.err.println(
            s"[warn] blame failed for $repoName:$p -> ${e.getMessage}")
          None
      }
    } match {
      case Seq() => emptyOf(Pipeline.blameRangesSchema)
      case dfs => dfs.reduce(_ unionByName _)
    }

    val out = Pipeline.deriveAll(repoName, Pipeline.RepoInputs(
      repoMeta, issues, prs, contributors, commits,
      prCommits, commitDetails, extDetails, targetDetails, blameRanges),
      generatedAt)
    Pipeline.persist(repoName, out, outDir)
    out
  }


}
