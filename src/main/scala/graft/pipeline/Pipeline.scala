package graft.pipeline

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{BooleanType, LongType, StringType, StructField, StructType}

import graft.io.JsonEntities
import graft.model.Entities
import graft.ops.Linkers

/** End-to-end per-repo derivation DAG (reference
  * src/retrieval/runner.py:27-77 process_repo): from the raw entity
  * artifacts (issues, pull_requests, commits — fetched by
  * `ingest.GithubClient` or replayed from disk) derive the three
  * linker datasets and persist all artifacts deterministically.
  *
  * The reference runs repos serially with per-repo crash isolation;
  * here each stage is a DataFrame job, so one repo's artifacts are a
  * partition of a multi-repo lake and repos parallelize as ordinary
  * partitions — the per-repo loop becomes `repos.foreach` on the
  * driver or one job over a repo_name-partitioned input.
  */
object Pipeline {

  /** The raw inputs process_repo consumes (already shaped per
    * model.Entities; point-lookup tables may be empty when no remote
    * fetches are replayed). */
  final case class RepoInputs(
      issues: DataFrame,
      pullRequests: DataFrame,
      commits: DataFrame,
      prCommits: DataFrame,
      commitDetails: DataFrame,
      externalIssueDetails: DataFrame,
      targetDetails: DataFrame)

  final case class RepoOutputs(
      issues: DataFrame,
      pullRequests: DataFrame,
      prsWithLinkedIssues: DataFrame,
      issuesClosedByCommits: DataFrame,
      crossRepoLinks: DataFrame)

  val prCommitsSchema: StructType = StructType(Seq(
    StructField("pr_number", LongType),
    StructField("message", StringType)))
  val commitDetailsSchema: StructType = StructType(Seq(
    StructField("sha", StringType),
    StructField("message", StringType)))
  val issueDetailsSchema: StructType = StructType(Seq(
    StructField("repo_name", StringType),
    StructField("number", LongType),
    StructField("author", StringType)))
  val targetDetailsSchema: StructType = StructType(Seq(
    StructField("repo_name", StringType),
    StructField("number", LongType),
    StructField("is_pr", BooleanType),
    StructField("created_at", StringType),
    StructField("url", StringType),
    StructField("author", StringType)))

  /** P1 — GitHub mixes PRs into /issues; the issues artifact drops
    * them (collectors.py:590). */
  def filterRealIssues(issues: DataFrame): DataFrame =
    if (issues.columns.contains("pull_request"))
      issues.filter(col("pull_request").isNull)
    else issues

  /** The derivation DAG. Stages mirror runner.py:36-71; fan-ins:
    * (prs, issues) → pr_links, commits → closed_by,
    * (issues, prs) → cross_links. */
  def deriveAll(repoName: String, in: RepoInputs): RepoOutputs = {
    val issues = filterRealIssues(
      JsonEntities.ensureRepoName(in.issues, repoName))
    val prs = JsonEntities.ensureRepoName(in.pullRequests, repoName)
    val commits = JsonEntities.ensureRepoName(in.commits, repoName)

    val prLinks = Linkers.prsWithLinkedIssues(repoName, prs, issues,
      in.prCommits, in.commitDetails, in.externalIssueDetails)

    // J2's author lookup feeds from the local issues (plus any
    // replayed remote details, same shape).
    val issueAuthors = issues.select(
      col("repo_name"), col("number"), col("user.login").as("author"))
      .unionByName(in.externalIssueDetails
        .select(col("repo_name"), col("number"), col("author")))
    val closedBy = Linkers.issuesClosedByCommits(repoName, commits,
      issueAuthors)

    val crossLinks = Linkers.crossRepoLinks(repoName, issues, prs,
      in.targetDetails)

    RepoOutputs(issues, prs, prLinks, closedBy, crossLinks)
  }

  /** Persist every artifact under `outDir/{owner_repo}/` as
    * deterministic sorted JSON (K1 contract). */
  def persist(repoName: String, out: RepoOutputs, outDir: String): Unit = {
    val dir = s"$outDir/${repoName.replace("/", "_")}"
    JsonEntities.writeDeterministic(out.issues, s"$dir/issues",
      Seq("number"))
    JsonEntities.writeDeterministic(out.pullRequests, s"$dir/pull_requests",
      Seq("number"))
    JsonEntities.writeDeterministic(out.prsWithLinkedIssues,
      s"$dir/prs_with_linked_issues", Seq("pr_number"))
    JsonEntities.writeDeterministic(out.issuesClosedByCommits,
      s"$dir/issues_closed_by_commits", Seq("commit_sha", "issue_number"))
    JsonEntities.writeDeterministic(out.crossRepoLinks,
      s"$dir/cross_repo_links", Seq("source.number", "target.number"))
  }

  /** File-replay form of process_repo: read raw artifacts from
    * `inDir/{owner_repo}/{issues,pull_requests,commits}.json`,
    * derive, persist. Point-lookup inputs default to empty. */
  def processRepo(spark: SparkSession, repoName: String, inDir: String,
      outDir: String): RepoOutputs = {
    val dir = s"$inDir/${repoName.replace("/", "_")}"
    def empty(s: StructType): DataFrame =
      spark.createDataFrame(spark.sparkContext.emptyRDD[Row], s)
    def readOrEmpty(entity: String, schema: StructType,
        file: String): DataFrame = {
      val p = new java.io.File(s"$dir/$file.json")
      if (p.exists()) JsonEntities.readEntity(spark, entity, p.getAbsolutePath)
      else empty(schema)
    }
    val in = RepoInputs(
      issues = readOrEmpty("issues", Entities.issue, "issues"),
      pullRequests =
        readOrEmpty("pull_requests", Entities.pullRequest, "pull_requests"),
      commits = readOrEmpty("commits", Entities.commit, "commits"),
      prCommits = empty(prCommitsSchema),
      commitDetails = empty(commitDetailsSchema),
      externalIssueDetails = empty(issueDetailsSchema),
      targetDetails = empty(targetDetailsSchema))
    val out = deriveAll(repoName, in)
    persist(repoName, out, outDir)
    out
  }
}
