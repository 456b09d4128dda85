package graft.ingest

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.time.Duration

import scala.jdk.CollectionConverters._

/** Live `java.net.http`-backed [[GithubClient.Transport]] — the one
  * small class that points the ingestion layer at a real GitHub API
  * (reference http_client.py's requests.Session role). All policy
  * (retry, backoff, token rotation, pagination) stays in
  * `GithubClient`; this class only performs single requests with
  * timeouts.
  *
  * HTTP/2 delivers header names lowercased, so response headers are
  * exposed through [[GithubClient.Response.header]]'s case-insensitive
  * lookup (the raw map preserves wire casing). I/O failures surface as
  * a synthetic 599 response, which the retry machine treats like a
  * 5xx — the same shape as the reference's RequestException retry.
  */
final class HttpTransport(
    connectTimeout: Duration = Duration.ofSeconds(10),
    requestTimeout: Duration = Duration.ofSeconds(30))
    extends GithubClient.Transport {

  private lazy val client: HttpClient = HttpClient.newBuilder()
    .connectTimeout(connectTimeout)
    .followRedirects(HttpClient.Redirect.NORMAL)
    .build()

  private def send(builder: HttpRequest.Builder,
      headers: Map[String, String]): GithubClient.Response = {
    headers.foreach { case (k, v) => builder.header(k, v) }
    // default media type only when the caller didn't pick one —
    // Builder.header ADDS, so an unconditional append would duplicate
    // a caller-supplied Accept and flip GitHub's content negotiation
    if (!headers.keys.exists(_.equalsIgnoreCase("Accept")))
      builder.header("Accept", "application/vnd.github+json")
    builder.timeout(requestTimeout)
    try {
      val resp = client.send(builder.build(),
        HttpResponse.BodyHandlers.ofString())
      val hdrs = resp.headers().map().asScala.map {
        case (k, vs) => k -> vs.asScala.mkString(", ")
      }.toMap
      GithubClient.Response(resp.statusCode(), hdrs, resp.body())
    } catch {
      case e: java.io.IOException =>
        GithubClient.Response(599, body = s"transport error: ${e.getMessage}")
      case e: InterruptedException =>
        Thread.currentThread().interrupt()
        GithubClient.Response(599, body = s"interrupted: ${e.getMessage}")
    }
  }

  override def get(url: String,
      headers: Map[String, String]): GithubClient.Response =
    send(HttpRequest.newBuilder(URI.create(url)).GET(), headers)

  override def post(url: String, headers: Map[String, String],
      body: String): GithubClient.Response =
    send(HttpRequest.newBuilder(URI.create(url))
      .POST(HttpRequest.BodyPublishers.ofString(body))
      .header("Content-Type", "application/json"), headers)
}

/** Network-gated smoke check (skipped in sandboxes without egress):
  * `GRAFT_SMOKE_REPO=owner/repo runMain graft.ingest.HttpSmoke` pages
  * one live endpoint through the full client stack. */
object HttpSmoke {
  def main(args: Array[String]): Unit = {
    sys.env.get("GRAFT_SMOKE_REPO") match {
      case None =>
        println("[smoke] GRAFT_SMOKE_REPO not set; skipping (no egress)")
      case Some(repo) =>
        val cfg = GithubClient.Config(
          tokens = sys.env.get("GITHUB_TOKEN").toSeq, maxPages = 1)
        val rows = GithubClient.paginate(new HttpTransport(), cfg,
          s"https://api.github.com/repos/$repo/issues?state=all", repo)
        println(s"[smoke] fetched ${rows.length} records from $repo")
    }
  }
}
