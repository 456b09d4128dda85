package graft.io

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.ops.CanonicalJson

/** Deterministic document identity per entity (reference
  * schema.py:303-366, SURVEY §1.5) as column expressions — the sink
  * key layer. All ids are pure functions of the record, so re-indexing
  * is idempotent at any parallelism.
  */
object Ids {

  /** commits → sha (schema.py:303-304). */
  def commitId: Column = col("sha")

  /** issues → `{repo_name}#issue#{number}` (schema.py:307-311). */
  def issueId: Column =
    concat_ws("#", col("repo_name"), lit("issue"), col("number"))

  /** pull_requests → `{repo_name}#pr#{number}` (schema.py:313-316). */
  def prId: Column =
    concat_ws("#", col("repo_name"), lit("pr"), col("number"))

  /** prs_with_linked_issues → `{repo_name}#prlinks#{pr_number}`. */
  def prLinksId: Column =
    concat_ws("#", col("repo_name"), lit("prlinks"), col("pr_number"))

  /** issues_closed_by_commits →
    * `{repo_name}#closedby#{issue_number}#{commit_sha}`
    * (schema.py:325-331). */
  def closedById: Column = concat_ws("#",
    col("repo_name"), lit("closedby"), col("issue_number"),
    col("commit_sha"))

  /** contributors → `{repo_name}#contrib#{login}`. */
  def contributorId: Column =
    concat_ws("#", col("repo_name"), lit("contrib"), col("login"))

  /** cross_repo_links → SHA-1 of the source→target identity string
    * `{repo}:{type}:{number}->{repo}:{type}:{number}` (schema.py:334-341).
    * Absent/null fields render as the literal "None", exactly like the
    * reference's f-string over dict.get() misses — null targets (404s
    * kept per docs/project_analytics.md:18) therefore hash identically
    * to the reference ids. */
  def crossLinkId: Column = {
    def f(c: Column): Column = coalesce(c.cast("string"), lit("None"))
    sha1(concat(
      f(col("source.repo_name")), lit(":"), f(col("source.type")),
      lit(":"), f(col("source.number")), lit("->"),
      f(col("target.repo_name")), lit(":"), f(col("target.type")),
      lit(":"), f(col("target.number"))))
  }

  /** repo_blame (re-chunked per-file, the K4 single-file-doc shape) →
    * `{repo}#blame#{ref}#file#{sha1("{repo}:{ref}:{path}")}`
    * (schema.py:344-358). Docs without exactly one pathed file fall
    * back to `{repo}#blame#{ref}` (the reference's un-chunked form;
    * its chunk_id variant has no counterpart because this engine
    * always re-chunks per-file). */
  def blameFileId: Column = {
    val path = col("files")(0)("path")
    val digest = sha1(concat(
      col("repo_name"), lit(":"), col("ref"), lit(":"), path))
    when(size(col("files")) === 1 && path.isNotNull,
      concat_ws("#", col("repo_name"), lit("blame"), col("ref"),
        lit("file"), digest))
      .otherwise(concat_ws("#", col("repo_name"), lit("blame"), col("ref")))
  }

  /** Fallback — stable_hash_id: SHA-1 over canonical sorted-key JSON
    * of the whole record (schema.py:25-29). */
  def stableHashId(record: Column, salt: String = ""): Column =
    CanonicalJson.stable_hash_id(record, lit(salt))

  /** Entity name → id expression (the _id column each sink row gets). */
  def forEntity(name: String): Column = name match {
    case "commits" => commitId
    case "issues" => issueId
    case "pull_requests" => prId
    case "prs_with_linked_issues" => prLinksId
    case "issues_closed_by_commits" => closedById
    case "contributors" => contributorId
    case "cross_repo_links" => crossLinkId
    case "repo_blame" => blameFileId
    case _ => stableHashId(struct(col("*")))
  }
}
