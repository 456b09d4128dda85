package graft.queries

import org.apache.spark.sql.{DataFrame, functions => F}
import org.apache.spark.sql.functions._

/** The reference's declared analytics surface: the nine validated
  * ES|QL scenarios (docs/test_scenario.md:9-190) as named DataFrame
  * queries over the entity tables. Inputs are the entity DataFrames
  * (read via JsonEntities / any source with the Entities schemas),
  * so the same functions run over one repo's artifacts or a
  * 100 TB multi-repo lake — every query filters on the partition-
  * friendly `repo_name` key first, so with repo_name-partitioned
  * storage each scenario prunes to the repos it touches.
  */
object Scenarios {

  /** 1 — issue counts by state (truth: 196 = 33 open + 163 closed). */
  def issueCounts(issues: DataFrame, repo: String): DataFrame =
    issues.filter(col("repo_name") === repo)
      .agg(
        count(lit(1)).as("total"),
        sum(when(col("state") === "open", 1).otherwise(0)).as("open"),
        sum(when(col("state") === "closed", 1).otherwise(0)).as("closed"))

  /** 2 — per-issue comment count point lookup. */
  def issueComments(issues: DataFrame, repo: String, number: Long): DataFrame =
    issues.filter(col("repo_name") === repo && col("number") === number)
      .select(col("number"), col("title"), col("comments"))

  /** 3 — distinct issue authors (truth: 141). */
  def distinctAuthors(issues: DataFrame, repo: String): DataFrame =
    issues.filter(col("repo_name") === repo)
      .agg(countDistinct(col("user.login")).as("distinct_authors"))

  /** 4 — the PR(s) linking a given issue (MV_EXPAND links). */
  def prsLinkingIssue(prLinks: DataFrame, repo: String,
      issue: Long): DataFrame =
    prLinks.filter(col("repo_name") === repo)
      .select(col("pr_number"), col("title"), col("author"), col("state"),
        explode(col("links")).as("link"))
      .filter(col("link.issue_number") === issue)
      .select(col("pr_number"), col("title"), col("author"), col("state"),
        col("link.issue_number").as("issue_number"))

  /** 5 — commits that directly close a given issue. */
  def commitsClosingIssue(closedBy: DataFrame, repo: String,
      issue: Long): DataFrame =
    closedBy.filter(col("repo_name") === repo &&
        col("issue_number") === issue)
      .select(col("issue_number"), col("commit_sha"), col("commit_author"),
        col("has_closing_kw"), col("would_auto_close"))

  /** 6 — cross-repo dependency hotspots (top referenced repos). */
  def crossRepoHotspots(crossLinks: DataFrame, repo: String): DataFrame =
    crossLinks.filter(col("source.repo_name") === repo)
      .groupBy(col("target.repo_name").as("target_repo"))
      .agg(count(lit(1)).as("refs"))
      .orderBy(col("refs").desc, col("target_repo").asc)

  /** 7 — commit-history range: first/last authored timestamp + count. */
  def commitHistoryRange(commits: DataFrame, repo: String): DataFrame =
    commits.filter(col("repo_name") === repo)
      .select(col("commit.author.date").as("authored_at"))
      .agg(
        F.min(col("authored_at")).as("first_commit"),
        F.max(col("authored_at")).as("last_commit"),
        count(lit(1)).as("commit_count"))

  /** 8 — per-target link counts split by source type
    * (truth: mrmlnc/fast-glob = 10 = 8 issue + 2 PR). */
  def crossRepoHealth(crossLinks: DataFrame, repo: String): DataFrame =
    crossLinks.filter(col("source.repo_name") === repo)
      .groupBy(col("target.repo_name").as("target_repo"))
      .agg(
        count(lit(1)).as("total_links"),
        sum(when(col("source.type") === "issue", 1).otherwise(0))
          .as("issue_links"),
        sum(when(col("source.type") === "pull_request", 1).otherwise(0))
          .as("pr_links"))
      .orderBy(col("total_links").desc, col("target_repo").asc)

  /** 9a — distinct issues linked by PRs (truth: 51). */
  def prLinkedIssueCount(prLinks: DataFrame, repo: String): DataFrame =
    prLinks.filter(col("repo_name") === repo)
      .select(explode(col("links")).as("link"))
      .agg(countDistinct(col("link.issue_number"))
        .as("linked_issue_count"))

  /** 9b — distinct issues closed by commits (truth: 14). */
  def commitClosedIssueCount(closedBy: DataFrame, repo: String): DataFrame =
    closedBy.filter(col("repo_name") === repo)
      .agg(countDistinct(col("issue_number"))
        .as("commit_closed_issue_count"))
}
