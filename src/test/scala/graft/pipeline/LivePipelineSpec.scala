package graft.pipeline

import org.apache.spark.sql.Row
import graft.SparkSpecBase
import graft.ingest.GithubClient

/** Full live-mode process_repo against a scripted GitHub: REST
  * pagination, PR-commit and merge-commit point lookups, external
  * issue details (200) and a 404 cross-link target, tree listing, and
  * GraphQL blame — every transport interaction faked, every derived
  * artifact checked. This is the network-free twin of pointing the
  * engine at api.github.com with `new HttpTransport()`. */
class LivePipelineSpec extends SparkSpecBase {

  private val api = "https://api.test"
  private val base = s"$api/repos/o/r"

  private def page(body: String,
      next: Option[String] = None): GithubClient.Response =
    GithubClient.Response(200,
      next.map(u => Map("Link" -> s"""<$u>; rel="next"""")).getOrElse(Map.empty),
      body)

  private val rest: Map[String, GithubClient.Response] = Map(
    s"$base?per_page=100" -> page(
      """{"full_name":"o/r","default_branch":"trunk"}"""),
    s"$base/issues?state=all&per_page=100" -> page(
      """[
        {"number":5,"state":"closed","title":"crash","body":"boom",
         "user":{"login":"reporter5"},"created_at":"2024-01-01T00:00:00Z"},
        {"number":6,"state":"open","title":"mixed-in PR","body":"",
         "user":{"login":"x"},"pull_request":{"url":"u"},
         "created_at":"2024-01-02T00:00:00Z"}
      ]""",
      next = Some(s"$base/issues?state=all&page=2")),
    s"$base/issues?state=all&page=2&per_page=100" -> page(
      """[
        {"number":9,"state":"open","title":"dep",
         "body":"blocked by another/one#4",
         "user":{"login":"reporter9"},"created_at":"2024-01-03T00:00:00Z"}
      ]"""),
    s"$base/pulls?state=all&per_page=100" -> page(
      """[
        {"number":7,"title":"Fix crash","body":"Fixes #5","state":"closed",
         "user":{"login":"dev7"},"merged_at":"2024-03-01T00:00:00Z",
         "merge_commit_sha":"msha","html_url":"pr7-url",
         "created_at":"2024-02-01T00:00:00Z"}
      ]"""),
    s"$base/contributors?per_page=100" -> page(
      """[{"login":"dev7","contributions":10}]"""),
    s"$base/commits?per_page=100" -> page(
      """[
        {"sha":"c1","html_url":"c1-url","author":{"login":"dev7"},
         "commit":{"message":"closes #5",
                   "author":{"name":"Dev Seven","date":"2024-02-01T00:00:00Z"}}}
      ]"""),
    s"$base/pulls/7/commits?per_page=100" -> page(
      """[{"sha":"pc1","commit":{"message":"prep for #9"}}]"""),
    s"$base/commits/msha" -> page(
      """{"sha":"msha","commit":{"message":"merge fixes other/lib#3"}}"""),
    s"$api/repos/other/lib/issues/3" -> page(
      """{"number":3,"user":{"login":"xlib"},"html_url":"xl-url",
         "created_at":"2023-01-01T00:00:00Z"}"""),
    s"$api/repos/another/one/issues/4" -> GithubClient.Response(404),
    s"$base/git/trees/trunk?recursive=1" -> page(
      """{"tree":[{"path":"src/a.js","type":"blob"},
                  {"path":"docs","type":"tree"}]}"""))

  private val blameBody =
    """{"data":{"repository":{"ref":{"target":{
      |  "__typename":"Commit","oid":"root1",
      |  "blame":{"ranges":[
      |    {"startingLine":1,"endingLine":12,"age":1,
      |     "commit":{"oid":"c1","committedDate":"2024-02-01T00:00:00Z",
      |       "message":"closes #5","author":{"name":"Dev Seven",
      |       "email":null,"user":{"login":"dev7"}}}}]}}}}}}""".stripMargin

  private class FakeGithub extends GithubClient.Transport {
    var gets: List[String] = Nil
    def get(url: String, headers: Map[String, String]): GithubClient.Response = {
      gets = gets :+ url
      rest.getOrElse(url, GithubClient.Response(404, body = s"miss: $url"))
    }
    override def post(url: String, headers: Map[String, String],
        body: String): GithubClient.Response =
      GithubClient.Response(200, body = blameBody)
  }

  test("live run derives and persists all nine artifacts end to end") {
    val outDir = java.nio.file.Files
      .createTempDirectory("graft-live-out").toString
    val t = new FakeGithub
    val out = LivePipeline.processRepoLive(spark, t,
      GithubClient.Config(), "o/r", outDir,
      LivePipeline.Endpoints(api, s"$api/graphql"))

    // P1 filter applied to the mixed-in PR
    assert(out.issues.count() == 2)
    assert(out.contributors.count() == 1)

    val links = out.prsWithLinkedIssues.collect()
      .head.getAs[scala.collection.Seq[Row]]("links")
    val byType = links.map(l =>
      l.getAs[String]("reference_type") ->
        (l.getAs[String]("referenced_repo"), l.getAs[Long]("issue_number"),
          l.getAs[String]("issue_author"))).toMap
    // pr_text #5 resolved from local issues
    assert(byType("pr_text") == (("o/r", 5L, "reporter5")))
    // PR-commit message ref resolved locally too
    assert(byType("commit_message") == (("o/r", 9L, "reporter9")))
    // merge-commit ref to ANOTHER repo resolved via the external lookup
    assert(byType("merge_commit_message") == (("other/lib", 3L, "xlib")))
    assert(t.gets.contains(s"$api/repos/other/lib/issues/3"))

    // commit c1 auto-closes #5
    val closed = out.issuesClosedByCommits.collect()
    assert(closed.map(_.getAs[String]("commit_sha")).toSeq == Seq("c1"))

    // the 404 target stays as a null-author cross-link row
    val cross = out.crossRepoLinks.collect()
    assert(cross.length == 1)
    val target = cross.head.getAs[Row]("target")
    assert(target.getAs[String]("repo_name") == "another/one")
    assert(target.getAs[String]("author") == null)

    // blame flowed: tree -> capped blob paths -> GraphQL -> summarized
    val blame = out.repoBlame.collect().head
    assert(blame.getAs[String]("ref") == "trunk")
    assert(blame.getAs[String]("head_commit_sha") == "c1")
    val file = blame.getAs[scala.collection.Seq[Row]]("files").head
    assert(file.getAs[String]("path") == "src/a.js")
    assert(file.getAs[String]("root_commit_oid") == "root1")
    assert(file.getAs[Long]("total_lines") == 12L)
    assert(file.getAs[scala.collection.Seq[Row]]("examples").head
      .getAs[Row]("matching_commit").getAs[String]("html_url") == "c1-url")

    // all nine artifacts on disk
    for (name <- Seq("repo_meta", "issues", "pull_requests", "contributors",
        "commits", "prs_with_linked_issues", "issues_closed_by_commits",
        "cross_repo_links", "repo_blame")) {
      assert(spark.read.json(s"$outDir/o_r/$name").count() > 0, name)
    }
  }
}
