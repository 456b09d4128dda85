package graft.io

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.time.Duration

import com.fasterxml.jackson.databind.ObjectMapper

/** Live HTTP `_bulk` transport for [[BulkSink]] (reference
  * client.py:54-102 ESClient.bulk_index + indexer.py:115-178): POSTs
  * each NDJSON action/doc batch to `{base}/{index}/_bulk` and parses
  * the response's `items` for per-doc errors. With this plugged into
  * `BulkSink.write`, live publishing symmetric to live fetching: the
  * flushes run on the EXECUTORS (one client per task JVM), so indexing
  * throughput scales with the cluster instead of funneling through a
  * driver-side session like the reference's single requests.Session.
  *
  * Failure accounting mirrors the reference: a non-2xx response (or a
  * transport-level I/O failure) counts the whole batch as failed
  * (client.py:79-82 — exact doc count here, where the reference
  * over-counts short final batches); a 2xx response counts the items
  * whose action result carries an `error` (client.py:84-88).
  *
  * Auth is a pre-built Authorization header value — see
  * [[HttpBulkTransport.apiKey]] / [[HttpBulkTransport.basic]]
  * (client.py:26-29).
  */
final class HttpBulkTransport(
    baseUrl: String,
    auth: Option[String] = None,
    connectTimeout: Duration = Duration.ofSeconds(10),
    requestTimeout: Duration = Duration.ofSeconds(60),
    verifyTls: Boolean = true)
    extends BulkSink.BulkTransport {

  private val base = baseUrl.stripSuffix("/")

  // One client per task JVM; HttpClient is not serializable.
  // verifyTls=false (the reference's requests `verify=False` default,
  // config.py:21) accepts the self-signed certs of a dev/local store
  // by trusting any chain. Certificate validation only: the JDK
  // client's hostname check stays on unless the JVM-global
  // `jdk.internal.httpclient.disableHostnameVerification` property is
  // set, which this class deliberately does not touch.
  @transient private lazy val client: HttpClient = {
    val b = HttpClient.newBuilder().connectTimeout(connectTimeout)
    if (!verifyTls) b.sslContext(HttpBulkTransport.trustAllContext)
    b.build()
  }
  @transient private lazy val mapper = new ObjectMapper()

  private def request(method: String, url: String, body: String,
      contentType: String): HttpRequest = {
    val b = HttpRequest.newBuilder(URI.create(url))
      .method(method, HttpRequest.BodyPublishers.ofString(body))
      .header("Content-Type", contentType)
      .timeout(requestTimeout)
    auth.foreach(a => b.header("Authorization", a))
    b.build()
  }

  override def flush(index: String, lines: Seq[String]): Int = {
    val docCount = lines.length / 2
    val payload = lines.mkString("", "\n", "\n")
    try {
      val resp = client.send(
        request("POST", s"$base/$index/_bulk", payload,
          "application/x-ndjson"),
        HttpResponse.BodyHandlers.ofString())
      if (resp.statusCode() >= 300) {
        System.err.println(
          s"[error] bulk: ${resp.statusCode()} ${resp.body().take(300)}")
        docCount
      } else {
        // items: [{"index": {..., "error": {...}?}}, ...] — a doc
        // failed when any action value carries an error.
        val items = mapper.readTree(resp.body()).path("items")
        var failed = 0
        items.forEach { item =>
          val vs = item.elements()
          var bad = false
          while (vs.hasNext && !bad) bad = vs.next().hasNonNull("error")
          if (bad) failed += 1
        }
        failed
      }
    } catch {
      case e: java.io.IOException =>
        System.err.println(s"[error] bulk transport: $e")
        docCount
      case e: InterruptedException =>
        Thread.currentThread().interrupt()
        System.err.println(s"[error] bulk interrupted: ${e.getMessage}")
        docCount
    }
  }

  /** K3 — ensure_index (client.py:36-52): HEAD the index, create it
    * with the mapping when absent (404). Driver-side, called once
    * before the distributed write. `mappingJson` None uses the
    * reference's dynamic single-shard default. */
  def ensureIndex(index: String, mappingJson: Option[String] = None): Unit = {
    val headBuilder = HttpRequest.newBuilder(URI.create(s"$base/$index"))
      .method("HEAD", HttpRequest.BodyPublishers.noBody())
      .timeout(requestTimeout)
    auth.foreach(a => headBuilder.header("Authorization", a))
    val head = client.send(headBuilder.build(),
      HttpResponse.BodyHandlers.discarding())
    head.statusCode() match {
      case 404 =>
        val body = mappingJson.getOrElse(
          """{"settings":{"number_of_shards":1,"number_of_replicas":0},""" +
            """"mappings":{"dynamic":true}}""")
        val resp = client.send(
          request("PUT", s"$base/$index", body, "application/json"),
          HttpResponse.BodyHandlers.ofString())
        if (resp.statusCode() >= 300)
          throw new RuntimeException(
            s"Failed to create index '$index': ${resp.statusCode()} ${resp.body()}")
      case ok if ok >= 200 && ok < 300 => () // exists
      case other =>
        // 401/403/503 is NOT "exists": silently skipping creation would
        // send the whole distributed write at a missing index
        throw new RuntimeException(
          s"HEAD '$index' returned $other; cannot determine existence")
    }
  }
}

object HttpBulkTransport {
  /** Accept-any-chain SSLContext backing `verifyTls = false`. */
  private[io] def trustAllContext: javax.net.ssl.SSLContext = {
    val ctx = javax.net.ssl.SSLContext.getInstance("TLS")
    ctx.init(null, Array[javax.net.ssl.TrustManager](
      new javax.net.ssl.X509TrustManager {
        override def checkClientTrusted(
            chain: Array[java.security.cert.X509Certificate],
            authType: String): Unit = ()
        override def checkServerTrusted(
            chain: Array[java.security.cert.X509Certificate],
            authType: String): Unit = ()
        override def getAcceptedIssuers: Array[java.security.cert.X509Certificate] =
          Array.empty
      }), new java.security.SecureRandom())
    ctx
  }

  /** `Authorization: ApiKey ...` (client.py:27). */
  def apiKey(key: String): Option[String] = Some(s"ApiKey $key")

  /** `Authorization: Basic base64(user:pass)` (client.py:28-29). */
  def basic(username: String, password: String): Option[String] =
    Some("Basic " + java.util.Base64.getEncoder.encodeToString(
      s"$username:$password".getBytes(java.nio.charset.StandardCharsets.UTF_8)))
}
