package graft.model

import org.apache.spark.sql.types._

/** Core StructTypes for the nine entity tables (reference
  * docs/pipeline_outputs.md:7-215, ES mappings schema.py:32-300).
  *
  * Schema philosophy mirrors the reference's "dynamic:true with
  * declared properties" (§1.3): each schema lists the queried core;
  * readers add a rescue column for the dynamic fringe so unknown
  * GitHub fields are kept, not silently dropped.
  *
  * ES `keyword`/`text` → StringType, `long` → LongType, `date` →
  * StringType at ingest (ISO-8601 `...Z`), parsed to TimestampType by
  * the `parsedTs` helper at query time — keeping raw strings at rest
  * makes the JSON round-trip byte-faithful.
  */
object Entities {

  val user: StructType = StructType(Seq(
    StructField("login", StringType),
    StructField("id", LongType),
    StructField("node_id", StringType),
    StructField("html_url", StringType),
    StructField("type", StringType),
    StructField("site_admin", BooleanType)))

  val license: StructType = StructType(Seq(
    StructField("key", StringType),
    StructField("name", StringType),
    StructField("spdx_id", StringType),
    StructField("url", StringType)))

  val repoMeta: StructType = StructType(Seq(
    StructField("repo_name", StringType),
    StructField("id", LongType),
    StructField("node_id", StringType),
    StructField("name", StringType),
    StructField("full_name", StringType),
    StructField("description", StringType),
    StructField("homepage", StringType),
    StructField("topics", ArrayType(StringType)),
    StructField("private", BooleanType),
    StructField("fork", BooleanType),
    StructField("default_branch", StringType),
    StructField("owner", user),
    StructField("organization", user),
    StructField("license", license),
    StructField("language", StringType),
    StructField("created_at", StringType),
    StructField("updated_at", StringType),
    StructField("pushed_at", StringType),
    StructField("stargazers_count", LongType),
    StructField("watchers_count", LongType),
    StructField("forks_count", LongType),
    StructField("open_issues_count", LongType),
    StructField("size", LongType)))

  val label: StructType = StructType(Seq(
    StructField("name", StringType),
    StructField("color", StringType),
    StructField("description", StringType)))

  val issue: StructType = StructType(Seq(
    StructField("repo_name", StringType),
    StructField("id", LongType),
    StructField("node_id", StringType),
    StructField("number", LongType),
    StructField("state", StringType),
    StructField("title", StringType),
    StructField("body", StringType),
    StructField("created_at", StringType),
    StructField("updated_at", StringType),
    StructField("closed_at", StringType),
    StructField("user", user),
    StructField("assignee", user),
    StructField("assignees", ArrayType(user)),
    StructField("labels", ArrayType(label)),
    StructField("comments", LongType),
    StructField("author_association", StringType),
    StructField("state_reason", StringType),
    // presence of this field is the P1 "actually a PR" marker
    StructField("pull_request",
      StructType(Seq(StructField("url", StringType))))))

  val pullRequest: StructType = StructType(Seq(
    StructField("repo_name", StringType),
    StructField("id", LongType),
    StructField("node_id", StringType),
    StructField("number", LongType),
    StructField("title", StringType),
    StructField("body", StringType),
    StructField("state", StringType),
    StructField("locked", BooleanType),
    StructField("draft", BooleanType),
    StructField("merged", BooleanType),
    StructField("merge_commit_sha", StringType),
    StructField("created_at", StringType),
    StructField("updated_at", StringType),
    StructField("closed_at", StringType),
    StructField("merged_at", StringType),
    StructField("user", user),
    StructField("assignee", user),
    StructField("assignees", ArrayType(user)),
    StructField("requested_reviewers", ArrayType(user)),
    StructField("labels", ArrayType(label)),
    StructField("author_association", StringType),
    StructField("html_url", StringType)))

  val gitActor: StructType = StructType(Seq(
    StructField("name", StringType),
    StructField("email", StringType),
    StructField("date", StringType)))

  val commit: StructType = StructType(Seq(
    StructField("repo_name", StringType),
    StructField("sha", StringType),
    StructField("node_id", StringType),
    StructField("commit", StructType(Seq(
      StructField("author", gitActor),
      StructField("committer", gitActor),
      StructField("message", StringType),
      StructField("comment_count", LongType)))),
    StructField("author", user),
    StructField("committer", user),
    StructField("url", StringType),
    StructField("html_url", StringType),
    StructField("parents", ArrayType(StructType(Seq(
      StructField("sha", StringType),
      StructField("url", StringType))))),
    StructField("files_changed", ArrayType(StringType)),
    StructField("files_changed_count", LongType),
    StructField("stats", StructType(Seq(
      StructField("additions", LongType),
      StructField("deletions", LongType),
      StructField("total", LongType))))))

  val contributor: StructType = StructType(Seq(
    StructField("repo_name", StringType),
    StructField("login", StringType),
    StructField("id", LongType),
    StructField("html_url", StringType),
    StructField("type", StringType),
    StructField("site_admin", BooleanType),
    StructField("contributions", LongType)))

  val prLink: StructType = StructType(Seq(
    StructField("referenced_repo", StringType),
    StructField("issue_number", LongType),
    StructField("reference_type", StringType),
    StructField("has_closing_kw", BooleanType),
    StructField("would_auto_close", BooleanType),
    StructField("issue_author", StringType)))

  val prsWithLinkedIssues: StructType = StructType(Seq(
    StructField("repo_name", StringType),
    StructField("pr_number", LongType),
    StructField("title", StringType),
    StructField("author", StringType),
    StructField("state", StringType),
    StructField("merged", BooleanType),
    StructField("links", ArrayType(prLink)),
    StructField("url", StringType),
    StructField("created_at", StringType)))

  val issuesClosedByCommits: StructType = StructType(Seq(
    StructField("repo_name", StringType),
    StructField("commit_sha", StringType),
    StructField("commit_url", StringType),
    StructField("commit_author", StringType),
    StructField("referenced_repo", StringType),
    StructField("issue_number", LongType),
    StructField("issue_author", StringType),
    StructField("reference_type", StringType),
    StructField("has_closing_kw", BooleanType),
    StructField("would_auto_close", BooleanType)))

  private val linkEnd: StructType = StructType(Seq(
    StructField("repo_name", StringType),
    StructField("type", StringType),
    StructField("number", LongType),
    StructField("url", StringType),
    StructField("created_at", StringType),
    StructField("author", StringType)))

  val crossRepoLink: StructType = StructType(Seq(
    StructField("source", StructType(linkEnd.fields.dropRight(1))),
    StructField("reference", StructType(Seq(
      StructField("found_in", StringType),
      StructField("seen_at", StringType),
      StructField("cross_ref_timestamp", StringType)))),
    StructField("target", linkEnd)))

  val matchingCommit: StructType = StructType(Seq(
    StructField("repo_name", StringType),
    StructField("sha", StringType),
    StructField("html_url", StringType),
    StructField("author_login", StringType),
    StructField("commit_author", gitActor),
    StructField("files_changed", ArrayType(StringType)),
    StructField("files_changed_count", LongType)))

  val blameRange: StructType = StructType(Seq(
    StructField("start", LongType),
    StructField("end", LongType),
    StructField("count", LongType),
    StructField("age", LongType),
    StructField("commit_sha", StringType),
    StructField("committed_date", StringType),
    StructField("message", StringType),
    StructField("matching_commit", matchingCommit)))

  val repoBlame: StructType = StructType(Seq(
    StructField("repo_name", StringType),
    StructField("ref", StringType),
    StructField("generated_at", StringType),
    StructField("head_commit_sha", StringType),
    StructField("error", StringType),
    StructField("files", ArrayType(StructType(Seq(
      StructField("path", StringType),
      StructField("ref", StringType),
      StructField("root_commit_oid", StringType),
      StructField("ranges_count", LongType),
      StructField("total_lines", LongType),
      StructField("authors", ArrayType(StructType(Seq(
        StructField("author", StringType),
        StructField("total_lines", LongType),
        StructField("ranges", ArrayType(blameRange)))))),
      StructField("examples", ArrayType(StructType(Seq(
        StructField("lines", StructType(Seq(
          StructField("start", LongType),
          StructField("end", LongType),
          StructField("count", LongType)))),
        StructField("commit_sha", StringType),
        StructField("committed_date", StringType),
        StructField("who", StringType),
        StructField("message", StringType),
        StructField("matching_commit", matchingCommit)))))))))))

  /** Entity name → schema, mirroring FILE_TO_INDEX (schema.py:369-379). */
  val all: Map[String, StructType] = Map(
    "repo_meta" -> repoMeta,
    "issues" -> issue,
    "pull_requests" -> pullRequest,
    "commits" -> commit,
    "contributors" -> contributor,
    "prs_with_linked_issues" -> prsWithLinkedIssues,
    "issues_closed_by_commits" -> issuesClosedByCommits,
    "cross_repo_links" -> crossRepoLink,
    "repo_blame" -> repoBlame)
}
