package graft.pipeline

import java.nio.file.Files

import org.apache.spark.sql.Row
import graft.SparkSpecBase

/** End-to-end file-replay run of the process_repo DAG (mirrors the
  * reference tests/test_runner.py orchestration check): raw artifact
  * JSON in → all derived artifacts out, with the P1 filter, linker
  * joins, and deterministic persistence working together.
  */
class PipelineSpec extends SparkSpecBase {
  private val repo = "owner/repo"

  private def writeFixture(dir: java.io.File): Unit = {
    val d = new java.io.File(dir, "owner_repo")
    d.mkdirs()
    def put(name: String, body: String): Unit = {
      val w = new java.io.PrintWriter(new java.io.File(d, name), "UTF-8")
      w.println(body); w.close()
    }
    put("issues.json",
      """[
        {"number":5,"state":"closed","title":"crash","body":"boom",
         "user":{"login":"reporter5"},"created_at":"2024-01-01T00:00:00Z"},
        {"number":6,"state":"open","title":"mixed-in PR","body":"",
         "user":{"login":"x"},"pull_request":{"url":"u"},
         "created_at":"2024-01-02T00:00:00Z"},
        {"number":9,"state":"open","title":"dep",
         "body":"blocked by other/lib#3",
         "user":{"login":"reporter9"},"created_at":"2024-01-03T00:00:00Z"}
      ]""")
    put("pull_requests.json",
      """[
        {"number":7,"title":"Fix crash","body":"Fixes #5","state":"closed",
         "user":{"login":"dev7"},"merged_at":"2024-03-01T00:00:00Z",
         "html_url":"pr7-url","created_at":"2024-02-01T00:00:00Z"}
      ]""")
    put("commits.json",
      """[
        {"sha":"c1","html_url":"c1-url","author":{"login":"dev7"},
         "commit":{"message":"closes #5\nfull fix",
                   "author":{"name":"Dev Seven","date":"2024-02-01T00:00:00Z"}}},
        {"sha":"c2","html_url":"c2-url","author":{"login":"other"},
         "commit":{"message":"refactor only",
                   "author":{"name":"O","date":"2024-02-02T00:00:00Z"}}}
      ]""")
    put("repo_meta.json",
      """{"full_name":"owner/repo","default_branch":"trunk",
          "stargazers_count":7}""")
    put("contributors.json",
      """[
        {"login":"dev7","contributions":10},
        {"login":"other","contributions":3}
      ]""")
    put("blame_ranges.json",
      """[
        {"path":"src/a.js","root_commit_oid":"r1","startingLine":1,
         "endingLine":10,"age":1,
         "commit":{"oid":"c1","committedDate":"2024-02-01T00:00:00Z",
                   "message":"closes #5\nfull fix",
                   "author":{"name":"Dev Seven","email":null,
                             "user":{"login":"dev7"}}}},
        {"path":"src/a.js","root_commit_oid":"r1","startingLine":11,
         "endingLine":12,"age":2,
         "commit":{"oid":"c2","committedDate":"2024-02-02T00:00:00Z",
                   "message":"refactor only",
                   "author":{"name":"O","email":null,
                             "user":{"login":"other"}}}}
      ]""")
  }

  test("multi-repo loop: per-repo isolation, one repo's failure is contained") {
    val inDir = Files.createTempDirectory("graft-multi-in").toFile
    val outDir = Files.createTempDirectory("graft-multi-out").toString
    writeFixture(inDir) // owner_repo has data; empty_repo has none
    val results = Pipeline.processRepos(spark,
      Seq("owner/repo", "empty/repo"), inDir.getAbsolutePath, outDir)
    assert(results("owner/repo").isSuccess)
    assert(results("empty/repo").isSuccess) // empty inputs → empty outputs
    assert(results("empty/repo").get.issues.count() == 0)
    assert(results("owner/repo").get.issues.count() == 2)
  }

  test("processRepo derives and persists all artifacts from raw JSON") {
    val inDir = Files.createTempDirectory("graft-pipe-in").toFile
    val outDir = Files.createTempDirectory("graft-pipe-out").toString
    writeFixture(inDir)

    val out = Pipeline.processRepo(spark, repo, inDir.getAbsolutePath, outDir)

    // P1: the mixed-in PR row is dropped from issues
    assert(out.issues.count() == 2)

    // PR #7 links issue #5 with auto-close and the local author joined
    val prLinks = out.prsWithLinkedIssues.collect()
    assert(prLinks.length == 1)
    val link = prLinks.head.getAs[scala.collection.Seq[Row]]("links").head
    assert(link.getAs[Long]("issue_number") == 5L)
    assert(link.getAs[Boolean]("would_auto_close"))
    assert(link.getAs[String]("issue_author") == "reporter5")

    // commit c1 closes #5; c2 has no closing ref
    val closed = out.issuesClosedByCommits.collect()
    assert(closed.map(_.getAs[String]("commit_sha")).toSeq == Seq("c1"))
    assert(closed.head.getAs[String]("issue_author") == "reporter5")

    // issue #9 cross-references other/lib#3 (404-null target kept)
    val cross = out.crossRepoLinks.collect()
    assert(cross.length == 1)
    assert(cross.head.getAs[Row]("target").getAs[String]("repo_name") ==
      "other/lib")
    assert(cross.head.getAs[Row]("target").getAs[String]("author") == null)

    // ALL NINE artifacts persisted and re-readable (the Scala twin of
    // tests/test_runner.py:17-34 asserting save_json called 9×)
    for (name <- Seq("repo_meta", "issues", "pull_requests", "contributors",
        "commits", "prs_with_linked_issues", "issues_closed_by_commits",
        "cross_repo_links", "repo_blame")) {
      val back = spark.read.json(s"$outDir/owner_repo/$name")
      assert(back.count() > 0, s"$name round-trip")
    }
    // repo_name stamped everywhere (the universal join key contract)
    assert(spark.read.json(s"$outDir/owner_repo/issues")
      .filter(org.apache.spark.sql.functions.col("repo_name") === repo)
      .count() == 2)

    // repo_blame doc shape: branch from repo_meta, head SHA from the
    // commit history, per-file summary with matching_commit enrichment
    val blame = out.repoBlame.collect()
    assert(blame.length == 1)
    val b = blame.head
    assert(b.getAs[String]("ref") == "trunk")
    assert(b.getAs[String]("head_commit_sha") == "c1")
    val files = b.getAs[scala.collection.Seq[Row]]("files")
    assert(files.length == 1)
    val f = files.head
    assert(f.getAs[String]("path") == "src/a.js")
    assert(f.getAs[Long]("total_lines") == 12L)
    assert(f.getAs[Long]("ranges_count") == 2L)
    val topAuthor = f.getAs[scala.collection.Seq[Row]]("authors").head
    assert(topAuthor.getAs[String]("author") == "dev7")
    val ex = f.getAs[scala.collection.Seq[Row]]("examples").head
    assert(ex.getAs[Row]("matching_commit").getAs[String]("html_url") ==
      "c1-url")

    // the persisted doc must round-trip through the ENTITY reader (the
    // K4 re-chunk / indexing path), not just schema inference: enriched
    // files survive, head_commit_sha is retained, nothing lands in the
    // rescue column
    val back = graft.io.JsonEntities.readEntity(spark, "repo_blame",
      s"$outDir/owner_repo/repo_blame")
    val br = back.collect()
    assert(br.length == 1)
    assert(br.head.getAs[String]("_rescued_fringe") == null)
    assert(br.head.getAs[String]("head_commit_sha") == "c1")
    val backFile = br.head.getAs[scala.collection.Seq[Row]]("files").head
    assert(backFile.getAs[Long]("total_lines") == 12L)
    val backEx = backFile.getAs[scala.collection.Seq[Row]]("examples").head
    assert(backEx.getAs[Row]("matching_commit")
      .getAs[Row]("commit_author").getAs[String]("name") == "Dev Seven")
    // and the re-chunker consumes the re-read doc directly
    assert(graft.ops.Blame.rechunk(back).count() == 1)
  }

  test("snapshot head: commit graph beats skewed git dates") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // A is the true tip (B is its parent) but B carries a NEWER
    // client-set date — the graph pick must ignore the skew.
    val commits = Seq(
      ("A", Seq("B"), "2024-01-01T00:00:00Z"),
      ("B", Seq.empty[String], "2030-01-01T00:00:00Z"))
      .toDF("sha", "psha", "d")
      .select(col("sha"),
        transform(col("psha"), p => struct(p.as("sha"))).as("parents"),
        struct(
          struct(col("d").as("date")).as("author"),
          struct(lit(null).cast("string").as("date")).as("committer"))
          .as("commit"))
    assert(Pipeline.headCommitShaOfSnapshot(commits) == Some("A"))
    // without parent data the graph is silent and the date decides
    val noParents = commits.withColumn("parents",
      lit(null).cast(commits.schema("parents").dataType))
    assert(Pipeline.headCommitShaOfSnapshot(noParents) == Some("B"))
  }
}
