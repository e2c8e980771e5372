package graft.http

import java.net.{HttpURLConnection, URI}
import java.nio.charset.StandardCharsets.UTF_8
import org.apache.spark.sql.Row
import graft.sink.Webhook
import graft.SparkSuite

/** HTTP façade (S1/S2, router.go:122-191,220-321) and the webhook sink
  * (K9, api_based/webhook.go:92-230) — real sockets on localhost. */
class HttpSpec extends SparkSuite {

  private def post(url: String, body: String): (Int, String) = {
    val conn = new URI(url).toURL.openConnection().asInstanceOf[HttpURLConnection]
    conn.setRequestMethod("POST"); conn.setDoOutput(true)
    val out = conn.getOutputStream
    try out.write(body.getBytes(UTF_8)) finally out.close()
    val code = conn.getResponseCode
    val is = if (code < 400) conn.getInputStream else conn.getErrorStream
    val resp = new String(is.readAllBytes(), UTF_8)
    conn.disconnect()
    (code, resp)
  }

  test("POST /post/:dest spools raw events per (dest, table) — S1") {
    val spooled = scala.collection.mutable.ArrayBuffer.empty[(String, String, String)]
    val srv = new IngestServer(
      spool = (d, t, e) => spooled.synchronized { spooled += ((d, t, e)); () },
      bulkLoad = (_, _, _, _) => 0L).start()
    try {
      val (code, resp) = post(s"http://127.0.0.1:${srv.port}/post/pg1?tableName=orders",
        """{"id":1,"v":"x"}""")
      assert(code == 200 && resp == """{"ok":true}""")
      assert(spooled.toSeq == Seq(("pg1", "orders", """{"id":1,"v":"x"}""")))
      val (code2, _) = post(s"http://127.0.0.1:${srv.port}/post/pg1", "")
      assert(code2 == 400)
    } finally srv.stop()
  }

  test("POST /bulk/:dest runs a synchronous NDJSON load and reports rows — S2") {
    var seen: (String, String, String, Seq[String]) = null
    val srv = new IngestServer(
      spool = (_, _, _) => (),
      bulkLoad = (d, t, m, lines) => { seen = (d, t, m, lines); lines.length.toLong }
    ).start()
    try {
      val (code, resp) = post(
        s"http://127.0.0.1:${srv.port}/bulk/duck?tableName=items&mode=batch",
        "{\"a\":1}\n{\"a\":2}\n\n{\"a\":3}")
      assert(code == 200 && resp == """{"ok":true,"rows":3}""")
      assert(seen == (("duck", "items", "batch", Seq("{\"a\":1}", "{\"a\":2}", "{\"a\":3}"))))
    } finally srv.stop()
  }

  test("bulk default mode is replace_table (router.go:233)") {
    var mode = ""
    val srv = new IngestServer((_, _, _) => (), (_, _, m, _) => { mode = m; 0L }).start()
    try {
      post(s"http://127.0.0.1:${srv.port}/bulk/x", """{"a":1}""")
      assert(mode == "replace_table")
    } finally srv.stop()
  }

  test("a failing bulk load returns ok:false with the error — S2 abort path") {
    val srv = new IngestServer((_, _, _) => (),
      (_, _, _, _) => throw new RuntimeException("sink down")).start()
    try {
      val (code, resp) = post(s"http://127.0.0.1:${srv.port}/bulk/x", """{"a":1}""")
      assert(code == 500 && resp.contains("sink down"))
    } finally srv.stop()
  }

  test("webhook sink posts NDJSON chunks from the executors — K9") {
    val received = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val receiver = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    receiver.createContext("/hook", (ex: com.sun.net.httpserver.HttpExchange) => {
      received.add(new String(ex.getRequestBody.readAllBytes(), UTF_8))
      ex.sendResponseHeaders(200, 2L); ex.getResponseBody.write("ok".getBytes(UTF_8)); ex.close()
    })
    receiver.start()
    try {
      val data = df("id BIGINT, v STRING", (1L to 5L).map(i => Row(i, s"v$i")))
      Webhook(s"http://127.0.0.1:${receiver.getAddress.getPort}/hook", chunkRows = 2).post(data)
      val lines = received.toArray.map(_.toString).flatMap(_.split("\n")).toSeq.sorted
      assert(lines.size == 5)
      assert(lines.head == """{"id":1,"v":"v1"}""")
    } finally receiver.stop(0)
  }

  test("webhook retries then fails hard after maxAttempts — K9 retry path") {
    val hits = new java.util.concurrent.atomic.AtomicInteger(0)
    val receiver = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    receiver.createContext("/hook", (ex: com.sun.net.httpserver.HttpExchange) => {
      hits.incrementAndGet()
      ex.sendResponseHeaders(503, -1L); ex.close()
    })
    receiver.start()
    try {
      val data = df("id BIGINT", Seq(Row(1L)))
      val err = intercept[org.apache.spark.SparkException] {
        Webhook(s"http://127.0.0.1:${receiver.getAddress.getPort}/hook",
          maxAttempts = 2, backoffMs = 10).post(data)
      }
      assert(err.getMessage != null)
      assert(hits.get() == 2)
    } finally receiver.stop(0)
  }
}
