package graft.tools

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

/** CLI settings resolution (reference config.py:41-97 parse_args +
  * resolve_settings + src/secrets.py): secrets-file defaults, flag
  * overrides, the hardlock short-circuit, and tolerant secrets
  * loading. */
class RunIndexingSpec extends AnyFunSuite {

  private def secretsFile(json: String): String = {
    val f = Files.createTempFile("graft-secrets", ".json")
    Files.writeString(f, json)
    f.toString
  }

  test("defaults come from the elasticsearch secrets section") {
    val s = RunIndexing.defaults(LocalSecrets.load(Some(secretsFile(
      """{"elasticsearch": {"url": "https://es.internal:9200",
        |  "username": "u", "password": "p", "api_key": "",
        |  "index_prefix": "gh_", "batch_size": 250,
        |  "verify_tls": true},
        | "github_tokens": ["t1", "t2"]}""".stripMargin))))
    assert(s.esUrl == "https://es.internal:9200")
    assert(s.username.contains("u") && s.password.contains("p"))
    assert(s.apiKey.isEmpty) // empty api_key means basic auth wins
    assert(s.prefix == "gh_" && s.batchSize == 250 && s.verifyTls)
    assert(s.dataDir == "./output" && !s.dryRun)
  }

  test("missing or malformed secrets degrade to hardcoded defaults") {
    for (src <- Seq("/nonexistent/p.json", secretsFile("not json"),
        secretsFile("[1,2]"))) {
      val s = RunIndexing.defaults(LocalSecrets.load(Some(src)))
      assert(s.esUrl == "http://localhost:9200", src)
      assert(s.username.isEmpty && s.apiKey.isEmpty, src)
      assert(s.batchSize == 500 && s.prefix == "" && !s.verifyTls, src)
    }
  }

  test("flags override defaults; unknown flags fail fast") {
    val base = RunIndexing.defaults(LocalSecrets.load(Some("/none")))
    val s = RunIndexing.parseArgs(Seq("--data-dir", "/lake",
      "--es-url", "http://es:9200", "--api-key", "k",
      "--prefix", "x_", "--batch-size", "64",
      "--verify-tls", "--dry-run"), base)
    assert(s.dataDir == "/lake" && s.esUrl == "http://es:9200")
    assert(s.apiKey.contains("k") && s.prefix == "x_")
    assert(s.batchSize == 64 && s.verifyTls && s.dryRun)
    intercept[IllegalArgumentException] {
      RunIndexing.parseArgs(Seq("--nope"), base)
    }
    intercept[IllegalArgumentException] {
      RunIndexing.parseArgs(Seq("--data-dir"), base) // missing value
    }
  }

  test("hardlock discards parsed flags (config.py:85-87)") {
    val base = RunIndexing.defaults(LocalSecrets.load(Some("/none")))
    val s = RunIndexing.parseArgs(
      Seq("--data-dir", "/elsewhere", "--hardlock"), base)
    assert(s == base)
  }

  test("github_tokens list reads as strings") {
    val root = LocalSecrets.load(Some(secretsFile(
      """{"github_tokens": ["a", "b", 3]}""")))
    assert(LocalSecrets.strings(root, "github_tokens") == Seq("a", "b"))
    assert(LocalSecrets.strings(root, "missing").isEmpty)
  }
}
