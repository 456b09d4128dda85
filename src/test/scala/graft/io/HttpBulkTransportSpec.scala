package graft.io

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.apache.spark.sql.functions._
import graft.SparkSpecBase

/** Live `_bulk` publishing end-to-end against a real (localhost) HTTP
  * server: BulkSink batches NDJSON on the executors, HttpBulkTransport
  * POSTs each batch, and the ok/fail accounting reflects the scripted
  * `_bulk` response items — the network twin of IoSpec's FileTransport
  * coverage (reference tests/test_es_client.py). */
class HttpBulkTransportSpec extends SparkSpecBase {

  /** Scripted store: answers `_bulk` by echoing one item per doc,
    * marking any doc whose action id contains "bad" as errored; tracks
    * index existence for ensure_index. */
  private class ScriptedStore {
    @volatile var bulkBatches: List[Seq[String]] = Nil
    @volatile var putBodies: List[String] = Nil
    @volatile var indexExists = false

    private val server = HttpServer.create(new InetSocketAddress(0), 0)
    server.createContext("/", (x: HttpExchange) => handle(x))
    server.start()
    val port: Int = server.getAddress.getPort
    def url = s"http://127.0.0.1:$port"
    def stop(): Unit = server.stop(0)

    private def respond(x: HttpExchange, status: Int, body: String): Unit = {
      val bytes = body.getBytes(StandardCharsets.UTF_8)
      // HEAD responses must not carry a body
      if (x.getRequestMethod == "HEAD") {
        x.sendResponseHeaders(status, -1)
      } else {
        x.sendResponseHeaders(status, bytes.length)
        x.getResponseBody.write(bytes)
      }
      x.close()
    }

    private def handle(x: HttpExchange): Unit = {
      val path = x.getRequestURI.getPath
      val method = x.getRequestMethod
      val body = new String(x.getRequestBody.readAllBytes(),
        StandardCharsets.UTF_8)
      (method, path) match {
        case ("POST", p) if p.endsWith("/_bulk") =>
          val lines = body.split("\n").toSeq.filter(_.nonEmpty)
          synchronized { bulkBatches = bulkBatches :+ lines }
          val items = lines.grouped(2).map { pair =>
            if (pair.head.contains("bad"))
              """{"index":{"status":400,"error":{"type":"mapper_parsing_exception"}}}"""
            else """{"index":{"status":201}}"""
          }.mkString("[", ",", "]")
          respond(x, 200, s"""{"errors":false,"items":$items}""")
        case ("HEAD", _) =>
          respond(x, if (indexExists) 200 else 404, "")
        case ("PUT", _) =>
          synchronized { putBodies = putBodies :+ body }
          indexExists = true
          respond(x, 200, """{"acknowledged":true}""")
        case _ =>
          respond(x, 405, "")
      }
    }
  }

  test("bulk write over HTTP: batching, id wiring, ok/fail accounting") {
    val store = new ScriptedStore
    try {
      import spark.implicits._
      // 5 docs, one with a "bad" id, single partition, batches of 2 →
      // 3 flushes of 2/2/1 docs.
      val df = Seq("a1", "a2", "bad3", "a4", "a5").toDF("k").coalesce(1)
      val res = BulkSink.write(df, "docs", col("k"),
        new HttpBulkTransport(store.url), batchSize = 2)
      assert(res == BulkSink.BulkResult(4, 1))
      assert(store.bulkBatches.length == 3)
      assert(store.bulkBatches.map(_.length / 2).sorted == List(1, 2, 2))
      // action line carries index + deterministic id; doc line is JSON
      val first = store.bulkBatches.flatten.find(_.contains("\"_id\":\"a1\""))
      assert(first.contains("""{"index":{"_index":"docs","_id":"a1"}}"""))
    } finally store.stop()
  }

  test("ids with JSON-special characters stay valid NDJSON") {
    val store = new ScriptedStore
    try {
      import spark.implicits._
      // quotes/backslashes/newlines in a key field — ingested data can
      // legally contain them (login, repo_name)
      val df = Seq("""a"b""", """c\d""", "e\nf").toDF("k").coalesce(1)
      val res = BulkSink.write(df, "docs", col("k"),
        new HttpBulkTransport(store.url), batchSize = 10)
      assert(res == BulkSink.BulkResult(3, 0))
      // every line of the received batch parses as standalone JSON
      val lines = store.bulkBatches.flatten
      assert(lines.size == 6)
      val parsed = spark.read.json(lines.toDS())
      assert(!parsed.columns.contains("_corrupt_record"), lines)
      // round-trip: the escaped id decodes back to the raw key
      val ids = spark.read.json(lines.filter(_.contains("_id")).toDS())
        .select(col("index._id")).collect().map(_.getString(0)).toSet
      assert(ids == Set("""a"b""", """c\d""", "e\nf"))
    } finally store.stop()
  }

  test("whole batch counts failed on transport-level failure") {
    // No server listening on this port: I/O failure → every doc in
    // the batch failed, nothing thrown on the executor.
    val port = {
      val s = new java.net.ServerSocket(0)
      try s.getLocalPort finally s.close()
    }
    import spark.implicits._
    val df = Seq("x1", "x2", "x3").toDF("k").coalesce(1)
    val res = BulkSink.write(df, "docs", col("k"),
      new HttpBulkTransport(s"http://127.0.0.1:$port"), batchSize = 10)
    assert(res == BulkSink.BulkResult(0, 3))
  }

  test("ensureIndex creates the mapping only when absent") {
    val store = new ScriptedStore
    try {
      val t = new HttpBulkTransport(store.url,
        auth = HttpBulkTransport.apiKey("k123"))
      t.ensureIndex("docs", Some("""{"mappings":{"dynamic":true}}"""))
      assert(store.putBodies == List("""{"mappings":{"dynamic":true}}"""))
      // second call: HEAD hits, no second PUT (client.py:46-52)
      t.ensureIndex("docs", Some("""{"mappings":{"dynamic":true}}"""))
      assert(store.putBodies.length == 1)
    } finally store.stop()
  }
}
