package graft.http

import java.nio.charset.StandardCharsets.UTF_8

/** Static analytics-script serving (`ScriptHandler`,
  * ingest/router_script_handler.go:9-43, and `ClassicScriptHandler`,
  * ingest/router_classic_handler.go:57-78): the drop-in browser story —
  * `GET /p.js` serves the modern tag bundle, `GET /s/lib.js` the classic
  * one. Contract per the reference handlers:
  *
  *   - GET and HEAD only (405 otherwise);
  *   - strong `ETag` + `If-None-Match` → 304 with no body;
  *   - `Content-Length` always set; HEAD sends headers only;
  *   - gzip when the client's Accept-Encoding allows it (the reference's
  *     `ShouldCompress`), with `Content-Encoding: gzip` and the ETag
  *     varied so caches never mix encodings.
  *
  * The bundles are ORIGINAL implementations of the tag contract (the
  * reference embeds a built jitsu-js artifact; its source is the public
  * SDK, not this repo's to copy): the script locates its own `<script>`
  * tag, reads `data-*` config (`data-write-key`/`data-jitsu-api-key`,
  * `data-init-only`), derives the tracking host from its own `src`,
  * queues calls issued before load, and POSTs JSON events — `/p.js` to the
  * Segment-compatible `/api/s/:type` edge with `X-Write-Key`, `/s/lib.js`
  * to the classic `/api/v1/event?token=` edge. Hot-swappable: [[update]]
  * lets a deployment publish a new bundle without restart (the reference's
  * script repository refresh). Pure static edge — no engine involvement.
  */
final class ScriptServing(initial: Array[Byte]) {

  @volatile private var state: (Array[Byte], Array[Byte], String) = pack(initial)

  private def pack(raw: Array[Byte]): (Array[Byte], Array[Byte], String) = {
    val bos = new java.io.ByteArrayOutputStream()
    val gz = new java.util.zip.GZIPOutputStream(bos)
    gz.write(raw); gz.close()
    val md = java.security.MessageDigest.getInstance("MD5").digest(raw)
    (raw, bos.toByteArray, md.map("%02x".format(_)).mkString)
  }

  /** Publish a new bundle (script repository refresh). */
  def update(raw: Array[Byte]): Unit = state = pack(raw)

  def etag: String = "\"" + state._3 + "\""

  /** Serve one exchange per the reference contract. */
  def serve(ex: com.sun.net.httpserver.HttpExchange): Unit = {
    val method = ex.getRequestMethod
    if (method != "GET" && method != "HEAD") {
      ex.sendResponseHeaders(405, -1L); ex.close(); return
    }
    val (raw, gzipped, tag) = state
    val gzip = Option(ex.getRequestHeaders.getFirst("Accept-Encoding"))
      .exists(_.toLowerCase(java.util.Locale.ROOT).contains("gzip"))
    // the encoding is part of the representation: vary the ETag with it so
    // a shared cache can never hand a gzip body to a non-gzip client
    val fullTag = "\"" + tag + (if (gzip) "-gz" else "") + "\""
    val h = ex.getResponseHeaders
    h.set("ETag", fullTag)
    h.set("Cache-Control", "public, max-age=120")
    if (Option(ex.getRequestHeaders.getFirst("If-None-Match")).contains(fullTag)) {
      ex.sendResponseHeaders(304, -1L); ex.close(); return
    }
    val body = if (gzip) gzipped else raw
    h.set("Content-Type", "application/javascript")
    if (gzip) h.set("Content-Encoding", "gzip")
    if (method == "HEAD") {
      // JDK server: length -1 = no body; advertise the real length manually
      h.set("Content-Length", body.length.toString)
      ex.sendResponseHeaders(200, -1L)
    } else {
      ex.sendResponseHeaders(200, body.length.toLong)
      ex.getResponseBody.write(body)
    }
    ex.close()
  }
}

object ScriptServing {

  /** Shared tag-bootstrap helper: find our script tag, read config, build a
    * queueing client. Kept deliberately small and readable — this is the
    * CONTRACT (attrs, queue, endpoint), not a port of the built SDK. */
  private def bundle(endpointJs: String, name: String): Array[Byte] =
    s"""// graft $name tag — original implementation of the jitsu tag contract
       |(function () {
       |  "use strict";
       |  if (typeof window === "undefined") return;
       |  var tag = document.currentScript ||
       |    document.querySelector("script[data-write-key],script[data-jitsu-api-key]");
       |  if (!tag) return;
       |  var key = tag.getAttribute("data-write-key") ||
       |    tag.getAttribute("data-jitsu-api-key") || "";
       |  var host = tag.getAttribute("data-host") ||
       |    (tag.src ? tag.src.replace(/\\/(p|s\\/lib)\\.js([?#].*)?$$/, "") : "");
       |  function describe() {
       |    return {
       |      url: location.href, path: location.pathname,
       |      referrer: document.referrer, title: document.title,
       |      search: location.search
       |    };
       |  }
       |  function send(type, name, props) {
       |    var body = { type: type, properties: props || {}, context: { page: describe() } };
       |    if (name) body.event = name;
       |    try {
       |$endpointJs
       |    } catch (e) { /* tracking must never break the page */ }
       |  }
       |  var api = {
       |    track: function (n, p) { send("track", n, p); },
       |    page: function (p) { send("page", null, p); },
       |    identify: function (id, t) { send("identify", null, { userId: id, traits: t || {} }); }
       |  };
       |  // drain calls queued before the script loaded: jitsu("track", ...)
       |  var q = window.jitsuQ = window.jitsuQ || [];
       |  window.jitsu = function () {
       |    var args = Array.prototype.slice.call(arguments);
       |    var fn = api[args[0]];
       |    if (fn) fn.apply(null, args.slice(1));
       |  };
       |  for (var i = 0; i < q.length; i++) window.jitsu.apply(null, q[i]);
       |  q.length = 0;
       |  if (tag.getAttribute("data-init-only") !== "true") api.page();
       |})();
       |""".stripMargin.getBytes(UTF_8)

  /** `/p.js` — posts to the Segment-compatible edge with `X-Write-Key`. */
  def modernBundle: Array[Byte] = bundle(
    """      var xhr = new XMLHttpRequest();
      |      xhr.open("POST", host + "/api/s/" + type);
      |      xhr.setRequestHeader("Content-Type", "application/json");
      |      if (key) xhr.setRequestHeader("X-Write-Key", key);
      |      xhr.send(JSON.stringify(body));""".stripMargin, "p.js")

  /** `/s/lib.js` — posts to the classic `/api/v1/event?token=` edge. */
  def classicBundle: Array[Byte] = bundle(
    """      var xhr = new XMLHttpRequest();
      |      xhr.open("POST", host + "/api/v1/event?token=" + encodeURIComponent(key));
      |      xhr.setRequestHeader("Content-Type", "application/json");
      |      xhr.send(JSON.stringify(body));""".stripMargin, "lib.js")
}
