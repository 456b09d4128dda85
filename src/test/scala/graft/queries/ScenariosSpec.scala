package graft.queries

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._
import graft.SparkSpecBase

/** The nine golden scenarios (reference docs/test_scenario.md) over a
  * miniature fixture shaped like the entity tables: the fixture
  * replicates the reference's ground-truth STRUCTURE (open/closed
  * splits, linked PR #156→#155, commit-closes #133, fast-glob
  * hotspot) at small scale, and each assert mirrors the pinned truth
  * relationships.
  */
class ScenariosSpec extends SparkSpecBase {
  private val repo = "micromatch/micromatch"

  private def df(schema: StructType, rows: Row*): DataFrame =
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 2), schema)

  private val userT = StructType(Seq(StructField("login", StringType)))
  private val issueT = StructType(Seq(
    StructField("repo_name", StringType),
    StructField("number", LongType),
    StructField("state", StringType),
    StructField("title", StringType),
    StructField("comments", LongType),
    StructField("user", userT)))

  private val issues = df(issueT,
    Row(repo, 25L, "closed", "glob bug", 7L, Row("alice")),
    Row(repo, 133L, "closed", "perf", 0L, Row("bob")),
    Row(repo, 155L, "open", "parse", 2L, Row("alice")),
    Row(repo, 156L, "open", "other", 0L, Row("carol")),
    Row("other/repo", 1L, "open", "x", 0L, Row("zed")))

  test("scenario 1: issue counts by state") {
    val r = Scenarios.issueCounts(issues, repo).head
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == (4L, 2L, 2L))
  }

  test("scenario 2: issue comment lookup") {
    val r = Scenarios.issueComments(issues, repo, 25L).head
    assert(r.getLong(0) == 25L && r.getLong(2) == 7L)
  }

  test("scenario 3: distinct authors") {
    assert(Scenarios.distinctAuthors(issues, repo).head.getLong(0) == 3L)
  }

  private val linkT = StructType(Seq(
    StructField("referenced_repo", StringType),
    StructField("issue_number", LongType),
    StructField("reference_type", StringType),
    StructField("has_closing_kw", BooleanType),
    StructField("would_auto_close", BooleanType),
    StructField("issue_author", StringType)))
  private val prLinksT = StructType(Seq(
    StructField("repo_name", StringType),
    StructField("pr_number", LongType),
    StructField("title", StringType),
    StructField("author", StringType),
    StructField("state", StringType),
    StructField("links", ArrayType(linkT))))

  private val prLinks = df(prLinksT,
    Row(repo, 156L, "Fix parse", "dev1", "closed", Seq(
      Row(repo, 155L, "pr_text", true, true, "alice"))),
    Row(repo, 160L, "Other", "dev2", "open", Seq(
      Row(repo, 155L, "commit_message", false, false, "alice"),
      Row(repo, 25L, "pr_text", true, false, "alice"))))

  test("scenario 4: PR linking issue 155 (truth shape: PR #156)") {
    val rows = Scenarios.prsLinkingIssue(prLinks, repo, 155L).collect()
    assert(rows.map(_.getLong(0)).toSet == Set(156L, 160L))
    assert(rows.forall(_.getAs[Long]("issue_number") == 155L))
  }

  private val closedByT = StructType(Seq(
    StructField("repo_name", StringType),
    StructField("commit_sha", StringType),
    StructField("commit_author", StringType),
    StructField("issue_number", LongType),
    StructField("has_closing_kw", BooleanType),
    StructField("would_auto_close", BooleanType)))
  private val closedBy = df(closedByT,
    Row(repo, "sha-a", "dev1", 133L, true, true),
    Row(repo, "sha-b", "dev2", 133L, true, true),
    Row(repo, "sha-c", "dev1", 25L, true, true))

  test("scenario 5: commits closing issue 133 (truth shape: 2 SHAs)") {
    val rows = Scenarios.commitsClosingIssue(closedBy, repo, 133L).collect()
    assert(rows.map(_.getString(1)).toSet == Set("sha-a", "sha-b"))
    assert(rows.forall(_.getBoolean(3) && rows.forall(_.getBoolean(4))))
  }

  private def linkEnd(r: String, t: String, n: Long) = Row(r, t, n)
  private val endT = StructType(Seq(
    StructField("repo_name", StringType),
    StructField("type", StringType),
    StructField("number", LongType)))
  private val crossT = StructType(Seq(
    StructField("source", endT), StructField("target", endT)))
  private val crossLinks = df(crossT,
    Row(linkEnd(repo, "issue", 1), linkEnd("mrmlnc/fast-glob", "issue", 10)),
    Row(linkEnd(repo, "issue", 2), linkEnd("mrmlnc/fast-glob", "issue", 11)),
    Row(linkEnd(repo, "pull_request", 3), linkEnd("mrmlnc/fast-glob", "pull_request", 12)),
    Row(linkEnd(repo, "issue", 4), linkEnd("nodejs/node", "issue", 9)))

  test("scenario 6: cross-repo hotspots ranked by refs") {
    val rows = Scenarios.crossRepoHotspots(crossLinks, repo).collect()
    assert(rows.head.getString(0) == "mrmlnc/fast-glob")
    assert(rows.head.getLong(1) == 3L)
  }

  private val commitT = StructType(Seq(
    StructField("repo_name", StringType),
    StructField("commit", StructType(Seq(
      StructField("author", StructType(Seq(
        StructField("date", StringType)))))))))
  private val commits = df(commitT,
    Row(repo, Row(Row("2017-01-01T00:00:00Z"))),
    Row(repo, Row(Row("2023-06-15T12:00:00Z"))),
    Row(repo, Row(Row("2020-03-03T09:30:00Z"))))

  test("scenario 7: commit history range") {
    val r = Scenarios.commitHistoryRange(commits, repo).head
    assert(r.getString(0) == "2017-01-01T00:00:00Z")
    assert(r.getString(1) == "2023-06-15T12:00:00Z")
    assert(r.getLong(2) == 3L)
  }

  test("scenario 8: per-target issue/PR link split (fast-glob shape)") {
    val rows = Scenarios.crossRepoHealth(crossLinks, repo).collect()
    val fg = rows.find(_.getString(0) == "mrmlnc/fast-glob").get
    assert((fg.getLong(1), fg.getLong(2), fg.getLong(3)) == (3L, 2L, 1L))
  }

  test("scenario 9: lifecycle coverage counts") {
    assert(Scenarios.prLinkedIssueCount(prLinks, repo).head.getLong(0) == 2L)
    assert(Scenarios.commitClosedIssueCount(closedBy, repo)
      .head.getLong(0) == 2L)
  }
}
