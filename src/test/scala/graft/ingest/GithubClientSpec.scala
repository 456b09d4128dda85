package graft.ingest

import org.scalatest.funsuite.AnyFunSuite

/** Mirrors reference tests/test_http_client.py: link-header traversal +
  * repo_name stamping (171-191), retry/rotation state machines
  * (99-133), URL normalization.
  */
class GithubClientSpec extends AnyFunSuite {
  import GithubClient._

  private class FakeTransport(
      pages: Map[String, Response]) extends Transport {
    var calls: List[(String, Map[String, String])] = Nil
    def get(url: String, headers: Map[String, String]): Response = {
      calls = calls :+ (url -> headers)
      pages.getOrElse(url, Response(404))
    }
  }

  test("normalizeUrl preserves/adds per_page") {
    assert(normalizeUrl("http://x/issues", 50) ==
      "http://x/issues?per_page=50")
    assert(normalizeUrl("http://x/issues?state=all", 50) ==
      "http://x/issues?state=all&per_page=50")
    assert(normalizeUrl("http://x/issues?per_page=9", 50) ==
      "http://x/issues?per_page=9")
  }

  test("parseLinkNext finds the next cursor among rels") {
    val h = """<http://x/p2>; rel="next", <http://x/p9>; rel="last""""
    assert(parseLinkNext(h).contains("http://x/p2"))
    assert(parseLinkNext("""<http://x/p9>; rel="last"""").isEmpty)
    assert(parseLinkNext(null).isEmpty)
  }

  test("stampRepoName splices the join key, leaves existing untouched") {
    assert(stampRepoName("""{"a":1}""", "o/r") ==
      """{"repo_name":"o/r","a":1}""")
    assert(stampRepoName("""{"repo_name":"x","a":1}""", "o/r") ==
      """{"repo_name":"x","a":1}""")
    assert(stampRepoName("{}", "o/r") == """{"repo_name":"o/r"}""")
  }

  test("splitTopLevel splits array bodies, passes objects through") {
    assert(splitTopLevel("""[{"a":1},{"b":"x,{}"},{"c":[1,2]}]""") ==
      Seq("""{"a":1}""", """{"b":"x,{}"}""", """{"c":[1,2]}"""))
    assert(splitTopLevel("""{"just":"one"}""") == Seq("""{"just":"one"}"""))
    assert(splitTopLevel("[]") == Seq.empty)
  }

  test("paginate follows next links, stamps repo_name, caps pages") {
    val pages = Map(
      "http://x/items?per_page=2" -> Response(200,
        Map("Link" -> """<http://x/items?page=2&per_page=2>; rel="next""""),
        """[{"n":1},{"n":2}]"""),
      "http://x/items?page=2&per_page=2" -> Response(200, Map.empty,
        """[{"n":3}]"""))
    val t = new FakeTransport(pages)
    val recs = paginate(t, Config(perPage = 2), "http://x/items", "o/r")
    assert(recs == Seq(
      """{"repo_name":"o/r","n":1}""", """{"repo_name":"o/r","n":2}""",
      """{"repo_name":"o/r","n":3}"""))

    val capped = paginate(new FakeTransport(pages),
      Config(perPage = 2, maxPages = 1), "http://x/items", "o/r")
    assert(capped.length == 2)
  }

  test("lowercased headers (HTTP/2 wire form) still drive pagination") {
    val pages = Map(
      "http://x/items?per_page=2" -> Response(200,
        Map("link" -> """<http://x/items?page=2&per_page=2>; rel="next""""),
        """[{"n":1}]"""),
      "http://x/items?page=2&per_page=2" -> Response(200, Map.empty,
        """[{"n":2}]"""))
    val recs = paginate(new FakeTransport(pages), Config(perPage = 2),
      "http://x/items", "o/r")
    assert(recs.length == 2)
    // and the rate-limit header check is case-insensitive too
    assert(Response(403, Map("x-ratelimit-remaining" -> "0"))
      .header("X-RateLimit-Remaining").contains("0"))
  }

  test("rate limit rotates tokens before backing off") {
    var slept = List.empty[Long]
    val cfg = Config(tokens = Seq("t1", "t2"), maxRetries = 2,
      sleeper = ms => slept = slept :+ ms)
    val t = new Transport {
      var n = 0
      def get(url: String, headers: Map[String, String]): Response = {
        n += 1
        // t1 is exhausted; t2 succeeds
        if (headers("Authorization") == "token t1")
          Response(403, Map("X-RateLimit-Remaining" -> "0"))
        else Response(200, Map.empty, "{}")
      }
    }
    val r = getWithRetry(t, cfg, "http://x")
    assert(r.status == 200)
    assert(slept.isEmpty) // rotation sufficed, no sleep needed
  }

  test("5xx backs off exponentially then succeeds") {
    var slept = List.empty[Long]
    val cfg = Config(maxRetries = 3, backoffBaseMs = 10,
      sleeper = ms => slept = slept :+ ms)
    val t = new Transport {
      var n = 0
      def get(url: String, headers: Map[String, String]): Response = {
        n += 1
        if (n <= 2) Response(502) else Response(200, Map.empty, "{}")
      }
    }
    assert(getWithRetry(t, cfg, "http://x").status == 200)
    assert(slept == List(10L, 20L))
  }

  test("graphql posts escaped query with variables through retry machine") {
    var seen: (String, String) = null
    val t = new Transport {
      def get(url: String, headers: Map[String, String]) = Response(404)
      override def post(url: String, headers: Map[String, String],
          body: String): Response = {
        seen = (url, body)
        Response(200, Map.empty, """{"data":{}}""")
      }
    }
    val r = GithubClient.graphql(t, Config(tokens = Seq("tk")),
      "https://api.github.com/graphql",
      "query Blame($path: String!) {\n repository { name }\n}",
      """{"path":"a.txt"}""")
    assert(r.status == 200)
    assert(seen._1 == "https://api.github.com/graphql")
    assert(seen._2 ==
      """{"query":"query Blame($path: String!) {\n repository { name }\n}","variables":{"path":"a.txt"}}""")
  }

  test("422 is terminal — no retries") {
    val t = new FakeTransport(Map("http://x" -> Response(422)))
    assert(getWithRetry(t, Config(), "http://x").status == 422)
    assert(t.calls.length == 1)
  }

  test("issueComments pages the comments endpoint with repo_name stamp") {
    val url = "https://api.t/repos/o/r/issues/7/comments?per_page=100"
    val t = new FakeTransport(Map(url -> Response(200,
      body = """[{"id":1,"body":"lgtm","user":{"login":"rev"}}]""")))
    val recs = GithubClient.issueComments(t, Config(), "https://api.t",
      "o/r", 7L)
    assert(recs.length == 1)
    assert(recs.head.contains(""""repo_name":"o/r""""))
    assert(recs.head.contains(""""body":"lgtm""""))
  }
}
