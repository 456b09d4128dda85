package graft.ingest

import scala.annotation.tailrec

/** Plain-Scala GitHub ingestion client (reference ring C:
  * http_client.py pagination/retry/rotation, SURVEY §2.1 S1-S5) —
  * driver-side I/O, cleanly separated from the query engine. Produces
  * record strings that become a `Dataset[String]` →
  * `spark.read.json(ds)` with the Entities schemas.
  *
  * Transport is injectable, so tests drive the full pagination/retry
  * state machine without network, and a file-replay transport turns
  * recorded responses into a reproducible source.
  */
object GithubClient {

  final case class Response(status: Int,
      headers: Map[String, String] = Map.empty, body: String = "") {
    /** Case-insensitive header lookup — HTTP/2 transports deliver
      * names lowercased, replay fixtures use canonical casing. */
    def header(name: String): Option[String] =
      headers.get(name).orElse {
        // Locale.ROOT: default-locale lowercasing corrupts 'I' under
        // Turkish locales, silently missing e.g. If-None-Match
        val l = name.toLowerCase(java.util.Locale.ROOT)
        headers.collectFirst {
          case (k, v) if k.toLowerCase(java.util.Locale.ROOT) == l => v
        }
      }
  }

  /** Pluggable HTTP. Must be pure per (url, headers, body) in replay.
    * `post` powers the GraphQL endpoint (S2); transports that only
    * serve REST replay can leave the default. */
  trait Transport {
    def get(url: String, headers: Map[String, String]): Response
    def post(url: String, headers: Map[String, String],
        body: String): Response =
      Response(405, body = "POST not supported by this transport")
  }

  final case class Config(
      tokens: Seq[String] = Seq.empty,
      maxRetries: Int = 3,
      perPage: Int = 100,
      maxPages: Int = 0, // 0 = unlimited
      sleeper: Long => Unit = ms => Thread.sleep(ms),
      backoffBaseMs: Long = 1000)

  /** P13 — URL normalization (http_client.py:358-366): make sure the
    * cursor URL keeps an explicit per_page. */
  def normalizeUrl(url: String, perPage: Int): String =
    if (url.contains("per_page=")) url
    else if (url.contains("?")) s"$url&per_page=$perPage"
    else s"$url?per_page=$perPage"

  /** Parse `Link: <url>; rel="next"` headers (http_client.py:369-381). */
  def parseLinkNext(linkHeader: String): Option[String] =
    Option(linkHeader).flatMap { h =>
      h.split(",").iterator.map(_.trim).collectFirst {
        case part if part.endsWith("rel=\"next\"") =>
          part.takeWhile(_ != ';').trim.stripPrefix("<").stripSuffix(">")
      }
    }

  /** Stamp repo_name onto a JSON object record (http_client.py:407-408)
    * — textual splice right after the opening brace, so the record
    * round-trips byte-identically otherwise. Records already carrying
    * repo_name are left untouched. */
  def stampRepoName(json: String, repoName: String): String = {
    val t = json.trim
    if (!t.startsWith("{") || t.contains("\"repo_name\"")) t
    else {
      val quoted = "\"repo_name\":\"" +
        repoName.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
      if (t == "{}") s"{$quoted}"
      else s"{$quoted," + t.drop(1)
    }
  }

  /** Split a JSON array body into its top-level element strings — the
    * paged-list shape of every GitHub list endpoint. A non-array body
    * yields itself (single-object endpoints). */
  def splitTopLevel(body: String): Seq[String] = {
    val t = body.trim
    if (!t.startsWith("[")) return Seq(t)
    val out = Seq.newBuilder[String]
    var depth = 0
    var inStr = false
    var esc = false
    var start = -1
    var i = 1
    while (i < t.length) {
      val c = t.charAt(i)
      if (esc) esc = false
      else if (inStr) {
        if (c == '\\') esc = true else if (c == '"') inStr = false
      } else c match {
        case '"' => inStr = true
        case '{' | '[' =>
          if (depth == 0) start = i
          depth += 1
        case '}' | ']' =>
          depth -= 1
          if (depth == 0 && start >= 0) {
            out += t.substring(start, i + 1); start = -1
          }
          if (depth < 0) i = t.length // closing of the outer array
        case _ =>
      }
      i += 1
    }
    out.result()
  }

  /** The retry/rotation state machine (http_client.py:244-355):
    * rate-limit (403/429) rotates to the next token, then backs off;
    * 5xx backs off; 422 and other 4xx are terminal. Returns the final
    * response (success or the terminal/give-up response). */
  def getWithRetry(transport: Transport, cfg: Config, url: String,
      tokenIdx: Int = 0, attempt: Int = 0): Response =
    requestWithRetry(cfg, h => transport.get(url, h), tokenIdx, attempt)

  /** S2 — GraphQL query execution (the blame queries of
    * collectors.py:58-119 run through this): POST {query, variables}
    * with the same retry/rotation machine as REST. Variables are
    * already-serialized JSON values. */
  /** JSON string literal (null → the literal null token) — shared by
    * the GraphQL body builder and record synthesis in LivePipeline. */
  def jsonString(s: String): String =
    if (s == null) "null"
    else "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""

  def graphql(transport: Transport, cfg: Config, endpoint: String,
      query: String, variablesJson: String = "{}"): Response = {
    val body =
      s"""{"query":${jsonString(query)},"variables":$variablesJson}"""
    requestWithRetry(cfg, h => transport.post(endpoint, h, body))
  }

  @tailrec
  private def requestWithRetry(cfg: Config,
      doRequest: Map[String, String] => Response,
      tokenIdx: Int = 0, attempt: Int = 0): Response = {
    val headers =
      if (cfg.tokens.isEmpty) Map.empty[String, String]
      else Map("Authorization" ->
        s"token ${cfg.tokens(tokenIdx % cfg.tokens.size)}")
    val resp = doRequest(headers)
    val rateLimited = resp.status == 429 ||
      (resp.status == 403 &&
        resp.header("X-RateLimit-Remaining").getOrElse("1") == "0")
    if (resp.status >= 200 && resp.status < 300) resp
    else if (attempt >= cfg.maxRetries) resp
    else if (rateLimited) {
      // rotate first; only sleep once every token has been tried
      if (tokenIdx + 1 < math.max(cfg.tokens.size, 1))
        requestWithRetry(cfg, doRequest, tokenIdx + 1, attempt)
      else {
        cfg.sleeper(cfg.backoffBaseMs * (1L << attempt))
        requestWithRetry(cfg, doRequest, 0, attempt + 1)
      }
    } else if (resp.status >= 500) {
      cfg.sleeper(cfg.backoffBaseMs * (1L << attempt))
      requestWithRetry(cfg, doRequest, tokenIdx, attempt + 1)
    } else resp // terminal 4xx (404, 422, ...)
  }

  /** get_issue_comments (collectors.py:660-663): all comments for one
    * issue, paginated like any list endpoint. Exported for parity with
    * the reference's public API (its pipeline never calls it either);
    * feed the records to spark.read.json with a caller schema. */
  def issueComments(transport: Transport, cfg: Config, apiBase: String,
      repoName: String, issueNumber: Long): Seq[String] =
    paginate(transport, cfg,
      s"$apiBase/repos/$repoName/issues/$issueNumber/comments", repoName)

  /** Paginated-scan result: `complete` is false when the scan ended
    * on a terminal HTTP error instead of the last page — the records
    * are the pages fetched before the failure (the reference's
    * warn-and-break partial result, http_client.py:395-401), but the
    * caller can tell the difference. `truncated` marks a scan cut off
    * by the caller's own maxPages cap with more pages available — a
    * DELIBERATE bound (the reference's MAX_PAGES_* semantics), kept
    * distinct from failure. */
  final case class PageResult(records: Seq[String], complete: Boolean,
      truncated: Boolean = false)

  /** S1 — paginated scan: follow rel="next" links, normalize per_page,
    * stamp repo_name on every record, honor maxPages. Returns the
    * record strings (feed to spark.read.json) plus the completeness
    * flag. */
  def paginateChecked(transport: Transport, cfg: Config, startUrl: String,
      repoName: String): PageResult = {
    val out = Seq.newBuilder[String]
    var url: Option[String] = Some(normalizeUrl(startUrl, cfg.perPage))
    var pages = 0
    var complete = true
    while (url.isDefined && (cfg.maxPages <= 0 || pages < cfg.maxPages)) {
      val resp = getWithRetry(transport, cfg, url.get)
      if (resp.status < 200 || resp.status >= 300) {
        complete = false
        url = None // stop on terminal error; caller sees partial data
      } else {
        splitTopLevel(resp.body).foreach(r =>
          out += stampRepoName(r, repoName))
        pages += 1
        url = parseLinkNext(resp.header("Link").orNull)
          .map(normalizeUrl(_, cfg.perPage))
      }
    }
    PageResult(out.result(), complete, truncated = url.isDefined)
  }

  /** `paginateChecked` without the completeness flag — for callers
    * where partial data is acceptable (the reference's behavior for
    * every full fetch). */
  def paginate(transport: Transport, cfg: Config, startUrl: String,
      repoName: String): Seq[String] =
    paginateChecked(transport, cfg, startUrl, repoName).records
}
