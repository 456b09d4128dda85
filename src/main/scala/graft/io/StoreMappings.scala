package graft.io

/** Per-entity document-store index mappings (reference
  * src/indexing/schema.py:32-300 MAPPINGS + COMMON_SETTINGS): each of
  * the nine lake entities gets an explicit typed contract —
  * `keyword` identifiers, `date` timestamps, `text` with the
  * English-stopword analyzer for prose, `nested` for repo_blame's
  * files/authors/ranges forest — instead of the store's dynamic
  * guesses (which would map `created_at` as text and break date-range
  * queries). `Indexer.scanAndIndex` threads these through its
  * ensureIndex hook (indexer.py:128-131 wires the same dict through
  * ensure_index).
  *
  * Rendered as compact JSON PUT bodies; the builders below exist so
  * the nesting reads like the reference's dict literal rather than a
  * wall of escaped braces.
  */
object StoreMappings {

  private val kw = """{"type":"keyword"}"""
  private val txt = """{"type":"text","analyzer":"text_en"}"""
  private val long_ = """{"type":"long"}"""
  private val int_ = """{"type":"integer"}"""
  private val bool = """{"type":"boolean"}"""
  private val date = """{"type":"date"}"""
  private val obj = """{"type":"object"}"""

  private def props(fields: (String, String)*): String =
    fields.map { case (n, t) => s""""$n":$t""" }.mkString("{", ",", "}")

  private def nested(fields: (String, String)*): String =
    s"""{"type":"nested","properties":${props(fields: _*)}}"""

  private def objWith(fields: (String, String)*): String =
    s"""{"type":"object","properties":${props(fields: _*)}}"""

  /** schema.py:9-22 COMMON_SETTINGS — single shard, no replicas, and
    * the `text_en` standard analyzer with English stopwords. */
  private val commonSettings =
    """"number_of_shards":1,"number_of_replicas":0,""" +
      """"analysis":{"analyzer":{"text_en":""" +
      """{"type":"standard","stopwords":"_english_"}}}"""

  private def body(properties: String, extraSettings: String = ""): String =
    s"""{"settings":{$commonSettings$extraSettings},""" +
      s""""mappings":{"dynamic":true,"properties":$properties}}"""

  /** schema.py:244-256 / 276-287 matching_commit (shared by ranges
    * and examples). */
  private val matchingCommit = objWith(
    "repo_name" -> kw, "sha" -> kw, "html_url" -> kw,
    "author_login" -> kw, "commit_author" -> obj,
    "files_changed" -> kw, "files_changed_count" -> int_)

  /** entity → index-creation JSON body. Keys are the bare entity
    * names; callers prepend their index prefix. */
  val forEntity: Map[String, String] = Map(
    "repo_meta" -> body(props( // schema.py:33-66
      "repo_name" -> kw, "id" -> long_, "node_id" -> kw, "name" -> kw,
      "full_name" -> kw, "private" -> bool, "owner" -> obj,
      "html_url" -> kw, "description" -> txt, "fork" -> bool,
      "url" -> kw, "homepage" -> kw, "language" -> kw, "topics" -> kw,
      "created_at" -> date, "updated_at" -> date, "pushed_at" -> date,
      "stargazers_count" -> int_, "watchers_count" -> int_,
      "forks_count" -> int_, "open_issues_count" -> int_,
      "size" -> int_, "license" -> obj, "permissions" -> obj,
      "organization" -> obj, "default_branch" -> kw)),
    "issues" -> body(props( // schema.py:67-96
      "repo_name" -> kw, "id" -> long_, "node_id" -> kw,
      "number" -> int_, "state" -> kw, "title" -> txt, "body" -> txt,
      "user" -> obj, "labels" -> obj, "assignee" -> obj,
      "assignees" -> obj, "milestone" -> obj, "comments" -> int_,
      "created_at" -> date, "updated_at" -> date, "closed_at" -> date,
      "author_association" -> kw, "reactions" -> obj,
      "state_reason" -> kw, "sub_issues_summary" -> obj,
      "issue_dependencies_summary" -> obj, "active_lock_reason" -> kw)),
    "pull_requests" -> body(props( // schema.py:97-130
      "repo_name" -> kw, "id" -> long_, "node_id" -> kw,
      "number" -> int_, "state" -> kw, "locked" -> bool,
      "title" -> txt, "body" -> txt, "user" -> obj,
      "created_at" -> date, "updated_at" -> date, "closed_at" -> date,
      "merged_at" -> date, "merge_commit_sha" -> kw,
      "assignee" -> obj, "assignees" -> obj,
      "requested_reviewers" -> obj, "requested_teams" -> obj,
      "labels" -> obj, "milestone" -> obj, "draft" -> bool,
      "head" -> obj, "base" -> obj, "_links" -> obj,
      "author_association" -> kw, "auto_merge" -> obj)),
    "commits" -> body(props( // schema.py:131-151
      "repo_name" -> kw, "sha" -> kw, "node_id" -> kw,
      "commit" -> obj, "url" -> kw, "html_url" -> kw,
      "comments_url" -> kw, "author" -> obj, "committer" -> obj,
      "parents" -> obj, "files_changed" -> kw,
      "files_changed_count" -> int_, "stats" -> obj)),
    "contributors" -> body(props( // schema.py:152-166
      "repo_name" -> kw, "login" -> kw, "id" -> long_,
      "html_url" -> kw, "type" -> kw, "site_admin" -> bool,
      "contributions" -> int_)),
    "prs_with_linked_issues" -> body(props( // schema.py:167-183
      "repo_name" -> kw, "pr_number" -> int_, "title" -> txt,
      "author" -> kw, "state" -> kw, "merged" -> bool,
      "links" -> obj, "url" -> kw, "created_at" -> date)),
    "issues_closed_by_commits" -> body(props( // schema.py:184-201
      "repo_name" -> kw, "commit_sha" -> kw, "commit_url" -> kw,
      "commit_author" -> kw, "referenced_repo" -> kw,
      "issue_number" -> int_, "issue_author" -> kw,
      "reference_type" -> kw, "has_closing_kw" -> bool,
      "would_auto_close" -> bool)),
    "cross_repo_links" -> body(props( // schema.py:202-212
      "source" -> obj, "reference" -> obj, "target" -> obj)),
    "repo_blame" -> body( // schema.py:213-299
      props(
        "repo_name" -> kw, "ref" -> kw, "generated_at" -> date,
        "error" -> txt,
        "files" -> nested(
          "path" -> kw, "ref" -> kw, "root_commit_oid" -> kw,
          "ranges_count" -> int_, "total_lines" -> int_,
          "authors" -> nested(
            "author" -> kw, "total_lines" -> int_,
            "ranges" -> nested(
              "start" -> int_, "end" -> int_, "count" -> int_,
              "age" -> int_, "commit_sha" -> kw,
              "committed_date" -> date, "message" -> txt,
              "matching_commit" -> matchingCommit)),
          "examples" -> nested(
            "lines" -> objWith(
              "start" -> int_, "end" -> int_, "count" -> int_),
            "commit_sha" -> kw, "committed_date" -> date,
            "who" -> kw, "message" -> txt,
            "matching_commit" -> matchingCommit))),
      // Large blame documents can exceed ES nested limits
      // (schema.py:294-298).
      extraSettings = ""","index.mapping.nested_objects.limit":150000"""),
  )
}
