package graft.io

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.ops.CanonicalJson

/** Deterministic document identity per entity (reference
  * schema.py:303-366, SURVEY §1.5) as column expressions — the sink
  * key layer. All ids are pure functions of the record, so re-indexing
  * is idempotent at any parallelism.
  *
  * Every keyed form carries the reference's degraded-record fallback:
  * when a key field is absent (Python-falsy — null, or empty string
  * for text keys) the id falls back to the salted whole-record
  * `stable_hash_id`, with the same per-entity salt strings, so a
  * malformed document still indexes under a stable, collision-safe id
  * instead of a partial key.
  */
object Ids {

  /** Python string truthiness: present AND non-empty. */
  private def truthy(c: Column): Column = c.isNotNull && length(c) > 0

  private def whole(salt: String): Column =
    stableHashId(struct(col("*")), salt)

  /** commits → sha, else stable_hash_id(doc, "commit:")
    * (schema.py:303-304). */
  def commitId: Column =
    when(truthy(col("sha")), col("sha")).otherwise(whole("commit:"))

  /** issues → `{repo_name}#issue#{number}` (schema.py:313-317). */
  def issueId: Column =
    when(truthy(col("repo_name")) && col("number").isNotNull,
      concat_ws("#", col("repo_name"), lit("issue"), col("number")))
      .otherwise(whole("issue:"))

  /** pull_requests → `{repo_name}#pr#{number}` (schema.py:307-310). */
  def prId: Column =
    when(truthy(col("repo_name")) && col("number").isNotNull,
      concat_ws("#", col("repo_name"), lit("pr"), col("number")))
      .otherwise(whole("pr:"))

  /** prs_with_linked_issues → `{repo_name}#prlinks#{pr_number}`
    * (schema.py:319-322; the reference's `pr_number or number`
    * alternate key is leniency for hand-fed docs — this engine's
    * artifact always carries pr_number). */
  def prLinksId: Column =
    when(truthy(col("repo_name")) && col("pr_number").isNotNull,
      concat_ws("#", col("repo_name"), lit("prlinks"), col("pr_number")))
      .otherwise(whole("prlinks:"))

  /** issues_closed_by_commits →
    * `{repo_name}#closedby#{issue_number}#{commit_sha}`
    * (schema.py:325-331). */
  def closedById: Column =
    when(truthy(col("repo_name")) && col("issue_number").isNotNull &&
        truthy(col("commit_sha")),
      concat_ws("#", col("repo_name"), lit("closedby"), col("issue_number"),
        col("commit_sha")))
      .otherwise(whole("closedby:"))

  /** contributors → `{repo_name}#contrib#{login}` (schema.py:361-366). */
  def contributorId: Column =
    when(truthy(col("repo_name")) && truthy(col("login")),
      concat_ws("#", col("repo_name"), lit("contrib"), col("login")))
      .otherwise(whole("contrib:"))

  /** repo_meta → repo_name, else stable_hash_id(doc, "meta:")
    * (schema.py:370). */
  def repoMetaId: Column =
    when(truthy(col("repo_name")), col("repo_name")).otherwise(whole("meta:"))

  /** cross_repo_links → SHA-1 of the source→target identity string
    * `{repo}:{type}:{number}->{repo}:{type}:{number}` (schema.py:334-341).
    * Absent/null fields render as the literal "None", exactly like the
    * reference's f-string over dict.get() misses — null targets (404s
    * kept per docs/project_analytics.md:18) therefore hash identically
    * to the reference ids. No whole-record fallback: the reference
    * hashes the key string unconditionally. */
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
    * (schema.py:344-359). Docs without exactly one non-empty-pathed
    * file use `{repo}#blame#{ref}` (the reference's un-chunked form;
    * its chunk_id variant has no counterpart because this engine
    * always re-chunks per-file), and a doc missing repo_name or ref
    * falls back to stable_hash_id(doc, "blame:"). */
  def blameFileId: Column = {
    val path = col("files")(0)("path")
    val digest = sha1(concat(
      col("repo_name"), lit(":"), col("ref"), lit(":"), path))
    val keyed = when(size(col("files")) === 1 && truthy(path),
      concat_ws("#", col("repo_name"), lit("blame"), col("ref"),
        lit("file"), digest))
      .otherwise(concat_ws("#", col("repo_name"), lit("blame"), col("ref")))
    when(truthy(col("repo_name")) && truthy(col("ref")), keyed)
      .otherwise(whole("blame:"))
  }

  /** Fallback — stable_hash_id: SHA-1 over canonical sorted-key JSON
    * of the whole record (schema.py:25-29). */
  def stableHashId(record: Column, salt: String = ""): Column =
    CanonicalJson.stable_hash_id(record, lit(salt))

  /** Entity name → id expression (the _id column each sink row gets). */
  def forEntity(name: String): Column = name match {
    case "repo_meta" => repoMetaId
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
