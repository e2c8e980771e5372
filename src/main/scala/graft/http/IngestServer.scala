package graft.http

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets.UTF_8

/** HTTP façade (S1/S2) over the engine — the reference's two ingestion
  * endpoints re-expressed with the JDK's built-in server (zero deps):
  *
  *   - `POST /post/:destId?tableName=T` (router.go:122-191): ONE JSON event,
  *     appended to the destination's spool folder — the stand-in for the
  *     Kafka produce; the [[graft.streaming.MicroBatch]] file stream drains
  *     the spool exactly like the reference's batch consumer drains the
  *     topic. Responds `{"ok":true}` immediately (async path).
  *   - `POST /bulk/:destId?tableName=T&mode=M` (router.go:220-321): an
  *     NDJSON body processed SYNCHRONOUSLY through the caller-supplied
  *     loader; responds with the load state
  *     (`{"ok":true,"rows":N}` / `{"ok":false,"error":...}`).
  *
  * The HTTP layer holds no engine logic: `spool` and `bulkLoad` are
  * injected, so the same server fronts any destination stack. The payload
  * path is line-oriented — events are never parsed here (the reference also
  * forwards raw bytes to Kafka; parsing happens in the consumer).
  */
final class IngestServer(
    spool: (String, String, String) => Unit,        // (dest, table, rawEvent)
    bulkLoad: (String, String, String, Seq[String]) => Long, // (dest, table, mode, lines) => rows
    auth: Option[WriteKeys.Registry] = None // enables /api/s/... writeKey auth
) {

  private var server: HttpServer = _

  def port: Int = server.getAddress.getPort

  private def query(ex: HttpExchange): Map[String, String] =
    Option(ex.getRequestURI.getRawQuery).getOrElse("").split("&").toSeq
      .filter(_.contains("="))
      .map { kv => val Array(k, v) = kv.split("=", 2)
        java.net.URLDecoder.decode(k, "UTF-8") -> java.net.URLDecoder.decode(v, "UTF-8") }
      .toMap

  private def respond(ex: HttpExchange, code: Int, body: String): Unit = {
    val bytes = body.getBytes(UTF_8)
    ex.getResponseHeaders.set("Content-Type", "application/json")
    ex.sendResponseHeaders(code, bytes.length.toLong)
    ex.getResponseBody.write(bytes)
    ex.close()
  }

  private def destOf(ex: HttpExchange, prefix: String): String =
    ex.getRequestURI.getPath.stripPrefix(prefix).takeWhile(_ != '/')

  def start(portHint: Int = 0): IngestServer = {
    server = HttpServer.create(new InetSocketAddress("127.0.0.1", portHint), 0)
    server.createContext("/post/", (ex: HttpExchange) =>
      try {
        val dest = destOf(ex, "/post/")
        val table = query(ex).getOrElse("tableName", "events")
        val body = new String(ex.getRequestBody.readAllBytes(), UTF_8).trim
        if (ex.getRequestMethod != "POST" || dest.isEmpty || body.isEmpty)
          respond(ex, 400, """{"ok":false,"error":"POST /post/:dest with a JSON body"}""")
        else { spool(dest, table, body); respond(ex, 200, """{"ok":true}""") }
      } catch { case e: Exception =>
        respond(ex, 500, s"""{"ok":false,"error":${graft.Verify.jsonStr(Option(e.getMessage).getOrElse("error"))}}""")
      })
    server.createContext("/bulk/", (ex: HttpExchange) =>
      try {
        val dest = destOf(ex, "/bulk/")
        val q = query(ex)
        val table = q.getOrElse("tableName", "events")
        val mode = q.getOrElse("mode", "replace_table") // router.go:233 default
        val lines = new String(ex.getRequestBody.readAllBytes(), UTF_8)
          .split("\n").toSeq.map(_.trim).filter(_.nonEmpty)
        if (ex.getRequestMethod != "POST" || dest.isEmpty)
          respond(ex, 400, """{"ok":false,"error":"POST /bulk/:dest"}""")
        else {
          val rows = bulkLoad(dest, table, mode, lines)
          respond(ex, 200, s"""{"ok":true,"rows":$rows}""")
        }
      } catch { case e: Exception =>
        respond(ex, 500, s"""{"ok":false,"error":${graft.Verify.jsonStr(Option(e.getMessage).getOrElse("load failed"))}}""")
      })
    // Segment-compatible authenticated edge (ingest/router.go:174-176
    // `/api/s/:tp` + `/api/s/s2s/:tp`, auth per router.go:369-397): resolve
    // the writeKey to its bound stream (here: destination), stamp the event
    // with its type + ingest mode, spool like /post. 401 when the key is
    // missing, unknown, wrong-secret, or a browser key on the s2s path.
    auth.foreach { reg =>
      server.createContext("/api/s/", (ex: HttpExchange) =>
        try {
          val path = ex.getRequestURI.getPath.stripPrefix("/api/s/")
          val s2s = path.startsWith("s2s/")
          val tp = (if (s2s) path.stripPrefix("s2s/") else path).takeWhile(_ != '/')
          val body = new String(ex.getRequestBody.readAllBytes(), UTF_8).trim
          val hdr = (n: String) => Option(ex.getRequestHeaders.getFirst(n))
          val q = query(ex) // parse the query string once per request
          val key = WriteKeys.extract(hdr("Authorization"), hdr("X-Write-Key"),
            q.get("writekey"))
          if (ex.getRequestMethod != "POST" || tp.isEmpty || body.isEmpty)
            respond(ex, 400, """{"ok":false,"error":"POST /api/s/[s2s/]:type with a JSON body"}""")
          // the writeKeyDefined locator chain both /api/s endpoints run
          // (router_ingest_handler.go:30 + router.go:591-592): writeKey →
          // slug (query) → ambiguous-domain (Host) → sole; with no stream
          // config this degenerates to writeKey-only
          else WriteKeys.locate(reg, q.get("slug"),
                 hdr("Host").map(_.split(":")(0)), key, s2s) match {
            case None =>
              respond(ex, 401, s"""{"ok":false,"error":"invalid writeKey ${
                key.map(WriteKeys.mask).getOrElse("(none)")}"}""")
            case Some((streamId, keyType)) if !s2s && keyType == "browser" &&
                !graft.streaming.IngestFilters.checkOrigin(
                  reg.jsDomains.getOrElse(streamId, ""), hdr("Origin")) =>
              // browser ingest only: the stream's authorizedJavaScriptDomains
              // gate the Origin header (router.go:607-625) — defense in
              // depth on top of the writeKey credential
              respond(ex, 403, s"""{"ok":false,"error":${graft.Verify.jsonStr(
                s"origin ${hdr("Origin").getOrElse("")} is not authorized")}}""")
            case Some((streamId, keyType)) =>
              // stamp type + ingestType WITHOUT parsing the payload (the
              // reference also wraps raw bytes; parsing is the consumer's)
              // — but the URL-decoded type segment must be JSON-escaped
              // (a crafted %22 would otherwise inject envelope fields) and
              // the body must at least LOOK like a JSON value, or the
              // spooled record is unparseable yet was acked with 200
              val trimmed = body.trim
              if (trimmed.isEmpty ||
                  !(trimmed.head == '{' || trimmed.head == '[')) {
                respond(ex, 400,
                  """{"ok":false,"error":"body must be a JSON object or array"}""")
              } else {
                val stamped = s"""{"type":${graft.Verify.jsonStr(tp)},"ingestType":"${
                  if (s2s) "s2s" else keyType}","event":$trimmed}"""
                spool(streamId, q.getOrElse("tableName", "events"), stamped)
                respond(ex, 200, """{"ok":true}""")
              }
          }
        } catch { case e: Exception =>
          respond(ex, 500, s"""{"ok":false,"error":${graft.Verify.jsonStr(Option(e.getMessage).getOrElse("error"))}}""")
        })
    }
    server.start()
    this
  }

  def stop(): Unit = if (server != null) server.stop(0)
}
