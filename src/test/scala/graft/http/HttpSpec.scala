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

  private def postAuth(url: String, body: String,
                       headers: Map[String, String]): (Int, String) = {
    val conn = new URI(url).toURL.openConnection().asInstanceOf[HttpURLConnection]
    conn.setRequestMethod("POST"); conn.setDoOutput(true)
    headers.foreach { case (k, v) => conn.setRequestProperty(k, v) }
    val out = conn.getOutputStream
    try out.write(body.getBytes(UTF_8)) finally out.close()
    val code = conn.getResponseCode
    val is = if (code < 400) conn.getInputStream else conn.getErrorStream
    val resp = new String(is.readAllBytes(), UTF_8)
    conn.disconnect()
    (code, resp)
  }

  private def testRegistry = WriteKeys.Registry(
    bindings = Map(
      "k1" -> WriteKeys.Binding("k1",
        WriteKeys.storedHash("sec1", "salt0", "global-secret"), "destA", "s2s"),
      "kb" -> WriteKeys.Binding("kb",
        WriteKeys.storedHash("bsec", "s2", "global-secret"), "destB", "browser")),
    plain = Map("plainkey" -> (("destC", "browser"))),
    globalSecrets = Seq("global-secret"))

  test("writeKey hashing: storedHash verifies, wrong secret/salt/global fails") {
    val reg = testRegistry
    assert(reg.checkHash(WriteKeys.storedHash("s", "x", "global-secret"), "s"))
    assert(!reg.checkHash(WriteKeys.storedHash("s", "x", "global-secret"), "wrong"))
    assert(!reg.checkHash(WriteKeys.storedHash("s", "x", "other-global"), "s"))
    assert(!reg.checkHash("malformed-no-dot", "s"))
    assert(WriteKeys.mask("k1:sec1") == "k1:***")
    assert(WriteKeys.mask("plainkey") == "p***y")
  }

  test("writeKey extraction: Authorization Basic > X-Write-Key > query") {
    val b64 = java.util.Base64.getEncoder.encodeToString("k1:sec1:".getBytes(UTF_8))
    assert(WriteKeys.extract(Some(s"Basic $b64"), Some("x"), Some("q"))
      .contains("k1:sec1")) // trailing ':' trimmed, header wins
    assert(WriteKeys.extract(None, Some("x"), Some("q")).contains("x"))
    assert(WriteKeys.extract(None, None, Some("q")).contains("q"))
    assert(WriteKeys.extract(None, None, None).isEmpty)
  }

  test("/api/s/s2s/:type: valid key spools a stamped event to its stream — auth path") {
    val spooled = scala.collection.mutable.ArrayBuffer.empty[(String, String, String)]
    val srv = new IngestServer(
      spool = (d, t, e) => spooled.synchronized { spooled += ((d, t, e)); () },
      bulkLoad = (_, _, _, _, _) => 0L, auth = Some(testRegistry)).start()
    try {
      val (code, resp) = postAuth(
        s"http://127.0.0.1:${srv.port}/api/s/s2s/track",
        """{"userId":"u1"}""", Map("X-Write-Key" -> "k1:sec1"))
      assert(code == 200 && resp == """{"ok":true}""")
      assert(spooled.toSeq == Seq(("destA", "events",
        """{"type":"track","ingestType":"s2s","event":{"userId":"u1"}}""")))
      // Basic auth spelling of the same key also lands
      val b64 = java.util.Base64.getEncoder.encodeToString("k1:sec1".getBytes(UTF_8))
      val (code2, _) = postAuth(s"http://127.0.0.1:${srv.port}/api/s/s2s/identify",
        """{"traits":{}}""", Map("Authorization" -> s"Basic $b64"))
      assert(code2 == 200 && spooled.length == 2)
    } finally srv.stop()
  }

  test("/api/s envelope: URL-decoded type is JSON-escaped; non-JSON body gets 400, not a 200 ack") {
    val spooled = scala.collection.mutable.ArrayBuffer.empty[(String, String, String)]
    val srv = new IngestServer(
      spool = (d, t, e) => spooled.synchronized { spooled += ((d, t, e)); () },
      bulkLoad = (_, _, _, _, _) => 0L, auth = Some(testRegistry)).start()
    try {
      // %22%2C%22x%22%3A%22y decodes to `a","x":"y` — without escaping this
      // would inject a top-level "x" field into the envelope
      val (code, _) = postAuth(
        s"http://127.0.0.1:${srv.port}/api/s/s2s/a%22%2C%22x%22%3A%22y",
        """{"u":1}""", Map("X-Write-Key" -> "k1:sec1"))
      assert(code == 200)
      assert(spooled.head._3 ==
        """{"type":"a\",\"x\":\"y","ingestType":"s2s","event":{"u":1}}""")
      // a body that is not a JSON object/array must not be acked and spooled
      val (code2, _) = postAuth(s"http://127.0.0.1:${srv.port}/api/s/s2s/track",
        "not json at all", Map("X-Write-Key" -> "k1:sec1"))
      assert(code2 == 400 && spooled.length == 1)
    } finally srv.stop()
  }

  test("authorizedJsDomains/checkOrigin matrix mirrors the reference (eager, sanitize, missing-Origin)") {
    import graft.streaming.IngestFilters._
    // rules sanitize: scheme + trailing slash stripped, whitespace trimmed
    assert(authorizedJsDomains("https://app.example.com/", "app.example.com"))
    assert(authorizedJsDomains(" http://a.io , b.io", "b.io"))
    // EAGER wildcard: *.example.com admits subdomains AND the bare apex
    // (unlike the non-eager ingest host filter)
    assert(authorizedJsDomains("*.example.com", "shop.example.com"))
    assert(authorizedJsDomains("*.example.com", "example.com"))
    assert(!authorizedJsDomains("*.example.com", "evil.com"))
    assert(authorizedJsDomains("*", "anything.at.all"))
    // checkOrigin: empty/'*' config admits; MISSING Origin admits (non-CORS
    // clients pass — the writeKey is the credential); scheme+port stripped
    assert(checkOrigin("", Some("https://evil.com")))
    assert(checkOrigin("*", Some("https://evil.com")))
    assert(checkOrigin("*.example.com", None))
    assert(checkOrigin("*.example.com", Some("")))
    assert(checkOrigin("*.example.com", Some("https://shop.example.com:8443")))
    assert(!checkOrigin("*.example.com", Some("https://evil.com")))
    assert(checkOrigin("app.io", Some("http://app.io:3000")))
  }

  /** HttpURLConnection silently drops the restricted `Origin` header, so
    * the origin-gate test posts through java.net.http.HttpClient (which
    * allows it). */
  private def postOrigin(url: String, body: String,
                         headers: Map[String, String]): (Int, String) = {
    val b = java.net.http.HttpRequest.newBuilder(new URI(url))
      .POST(java.net.http.HttpRequest.BodyPublishers.ofString(body))
    headers.foreach { case (k, v) => b.header(k, v) }
    val resp = java.net.http.HttpClient.newHttpClient().send(
      b.build(), java.net.http.HttpResponse.BodyHandlers.ofString())
    (resp.statusCode(), resp.body())
  }

  test("/api/s browser path enforces authorizedJavaScriptDomains on the Origin header") {
    val reg = testRegistry.copy(jsDomains = Map("destB" -> "*.example.com"))
    val spooled = scala.collection.mutable.ArrayBuffer.empty[String]
    val srv = new IngestServer(
      spool = (_, _, e) => spooled.synchronized { spooled += e; () },
      bulkLoad = (_, _, _, _, _) => 0L, auth = Some(reg)).start()
    try {
      val url = s"http://127.0.0.1:${srv.port}/api/s/page"
      // authorized subdomain and bare apex (eager) both land
      assert(postOrigin(url, """{"a":1}""", Map("X-Write-Key" -> "kb:bsec",
        "Origin" -> "https://shop.example.com"))._1 == 200)
      assert(postOrigin(url, """{"a":1}""", Map("X-Write-Key" -> "kb:bsec",
        "Origin" -> "https://example.com:443"))._1 == 200)
      // foreign origin is 403 and never spools
      val (code, body) = postOrigin(url, """{"a":1}""", Map("X-Write-Key" -> "kb:bsec",
        "Origin" -> "https://evil.com"))
      assert(code == 403 && body.contains("not authorized"))
      // no Origin header: allowed (non-CORS client; key is the credential)
      assert(postOrigin(url, """{"a":1}""", Map("X-Write-Key" -> "kb:bsec"))._1 == 200)
      // a stream with NO domain config is unrestricted (destC via plain key)
      assert(postOrigin(s"$url?writekey=plainkey", """{"a":1}""",
        Map("Origin" -> "https://evil.com"))._1 == 200)
      // s2s endpoints never origin-check (the gate is browser-only)
      assert(postOrigin(s"http://127.0.0.1:${srv.port}/api/s/s2s/track",
        """{"a":1}""", Map("X-Write-Key" -> "k1:sec1",
        "Origin" -> "https://evil.com"))._1 == 200)
      assert(spooled.length == 5)
    } finally srv.stop()
  }

  test("stream locators: per-ingest-type chains, strict refusal, domain rules, sole fallback") {
    import WriteKeys.{Stream, locate}
    val streams = Seq(
      Stream("destA", strict = true, domains = Seq("a.io")),
      Stream("destB", domains = Seq("shared.io", "b.io")),
      Stream("destC", domains = Seq("shared.io")))
    val reg = testRegistry.copy(streams = streams)
    // writeKeyDefined (the /api/s handler's chain, BOTH endpoints): the
    // presented KEY wins over a slug — a credential is never overridden
    assert(locate(reg, Some("destB"), None, Some("plainkey"), s2sEndpoint = false)
      .contains(("destC", "browser")))
    // keyless slug resolution; plain public keys alias their stream's slug
    assert(locate(reg, Some("destB"), None, None, s2sEndpoint = false)
      .contains(("destB", "browser")))
    assert(locate(reg, Some("plainkey"), None, None, s2sEndpoint = false)
      .contains(("destC", "browser")))
    // a strict stream never resolves by slug/domain — only by writeKey
    assert(locate(reg, Some("destA"), None, None, s2sEndpoint = false).isEmpty)
    assert(locate(reg, None, Some("a.io"), None, s2sEndpoint = false).isEmpty)
    assert(locate(reg, Some("destA"), None, Some("k1:sec1"), s2sEndpoint = true)
      .contains(("destA", "s2s")))
    // writeKeyDefined ambiguous-domain: any non-strict match, even keyed-but-failed
    assert(locate(reg, None, Some("shared.io"), Some("bad:key"), s2sEndpoint = false)
      .contains(("destB", "browser")))
    // sole-stream workspace resolves keylessly on BOTH /api/s endpoints
    val sole = testRegistry.copy(streams = Seq(Stream("only")))
    assert(locate(sole, None, None, None, s2sEndpoint = false).contains(("only", "browser")))
    assert(locate(sole, None, None, None, s2sEndpoint = true).contains(("only", "s2s")))
    assert(locate(testRegistry.copy(streams = Seq(Stream("only", strict = true))),
      None, None, None, s2sEndpoint = false).isEmpty)
    // classic browser chain: slug WINS over the key; domain uniqueness; a
    // shared domain resolves only keylessly
    assert(locate(reg, Some("destB"), None, Some("plainkey"), s2sEndpoint = false,
      ingestType = "browser").contains(("destB", "browser")))
    assert(locate(reg, None, Some("b.io"), None, s2sEndpoint = false,
      ingestType = "browser").contains(("destB", "browser")))
    assert(locate(reg, None, Some("shared.io"), None, s2sEndpoint = false,
      ingestType = "browser").contains(("destB", "browser")))
    assert(locate(reg, None, Some("shared.io"), Some("bad:key"), s2sEndpoint = false,
      ingestType = "browser").isEmpty)
    // classic s2s chain has NO sole fallback
    assert(locate(sole, None, None, None, s2sEndpoint = true,
      ingestType = "s2s").isEmpty)
    // with no stream config every chain degenerates to writeKey-only
    assert(locate(testRegistry, Some("destB"), Some("b.io"), None,
      s2sEndpoint = false).isEmpty)
    assert(locate(testRegistry, None, None, Some("kb:bsec"), s2sEndpoint = false)
      .contains(("destB", "browser")))
  }

  test("/api/s with a stream config: writeKey wins, slug and sole resolve keylessly on the live server") {
    val spooled = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    val reg = testRegistry.copy(streams = Seq(
      WriteKeys.Stream("destB"), WriteKeys.Stream("destA", strict = true)))
    val srv = new IngestServer(
      spool = (d, _, e) => spooled.synchronized { spooled += ((d, e)); () },
      bulkLoad = (_, _, _, _, _) => 0L, auth = Some(reg)).start()
    try {
      // keyless slug resolution lands on the non-strict stream
      assert(postAuth(s"http://127.0.0.1:${srv.port}/api/s/page?slug=destB",
        """{"a":1}""", Map.empty)._1 == 200)
      assert(spooled.last._1 == "destB" && spooled.last._2.contains("\"ingestType\":\"browser\""))
      // a strict stream is NOT reachable by slug
      assert(postAuth(s"http://127.0.0.1:${srv.port}/api/s/page?slug=destA",
        """{"a":1}""", Map.empty)._1 == 401)
      // a presented KEY wins over a slug (the credential routes the event)
      assert(postAuth(s"http://127.0.0.1:${srv.port}/api/s/s2s/track?slug=destB",
        """{"a":1}""", Map("X-Write-Key" -> "k1:sec1"))._1 == 200)
      assert(spooled.last._1 == "destA")
    } finally srv.stop()
  }

  test("/api/s sole-stream workspace: keyless posts resolve on BOTH endpoints") {
    val spooled = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    val reg = testRegistry.copy(streams = Seq(WriteKeys.Stream("onlyD")))
    val srv = new IngestServer(
      spool = (d, _, e) => spooled.synchronized { spooled += ((d, e)); () },
      bulkLoad = (_, _, _, _, _) => 0L, auth = Some(reg)).start()
    try {
      assert(postAuth(s"http://127.0.0.1:${srv.port}/api/s/page",
        """{"a":1}""", Map.empty)._1 == 200)
      assert(spooled.last._1 == "onlyD" && spooled.last._2.contains("\"ingestType\":\"browser\""))
      assert(postAuth(s"http://127.0.0.1:${srv.port}/api/s/s2s/track",
        """{"a":1}""", Map.empty)._1 == 200)
      assert(spooled.last._2.contains("\"ingestType\":\"s2s\""))
    } finally srv.stop()
  }

  test("/api/s/s2s rejects: no key, wrong secret, unknown id; hashed browser key RESOLVES as browser") {
    val spooled = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    val srv = new IngestServer(
      (d, _, e) => spooled.synchronized { spooled += ((d, e)); () },
      (_, _, _, _, _) => 0L, auth = Some(testRegistry)).start()
    try {
      val url = s"http://127.0.0.1:${srv.port}/api/s/s2s/track"
      assert(postAuth(url, """{"a":1}""", Map.empty)._1 == 401)
      assert(postAuth(url, """{"a":1}""", Map("X-Write-Key" -> "k1:WRONG"))._1 == 401)
      assert(postAuth(url, """{"a":1}""", Map("X-Write-Key" -> "nope:x"))._1 == 401)
      // a hashed BROWSER key on the s2s endpoint: under the writeKeyDefined
      // chain the keyType check is skipped (router.go:641-648) — the key
      // resolves to ITS stream and the event is stamped with the KEY's
      // type, not the endpoint's
      val (cb, _) = postAuth(url, """{"a":1}""", Map("X-Write-Key" -> "kb:bsec"))
      assert(cb == 200)
      assert(spooled.last._1 == "destB" &&
        spooled.last._2.contains("\"ingestType\":\"browser\""))
      // ...and on the browser endpoint too
      assert(postAuth(s"http://127.0.0.1:${srv.port}/api/s/page",
        """{"a":1}""", Map("X-Write-Key" -> "kb:bsec"))._1 == 200)
      // a plain BROWSER key only resolves on the browser endpoint — plain
      // public plaintexts are not in the s2s map (repository.go:88-111)
      assert(postAuth(s"http://127.0.0.1:${srv.port}/api/s/page?writekey=plainkey",
        """{"a":1}""", Map.empty)._1 == 200)
      assert(postAuth(s"$url?writekey=plainkey", """{"a":1}""", Map.empty)._1 == 401)
      // 401 responses never echo the key
      val (_, body) = postAuth(url, """{"a":1}""", Map("X-Write-Key" -> "k1:WRONG"))
      assert(body.contains("k1:***") && !body.contains("WRONG"))
    } finally srv.stop()
  }

  test("POST /post/:dest spools raw events per (dest, table) — S1") {
    val spooled = scala.collection.mutable.ArrayBuffer.empty[(String, String, String)]
    val srv = new IngestServer(
      spool = (d, t, e) => spooled.synchronized { spooled += ((d, t, e)); () },
      bulkLoad = (_, _, _, _, _) => 0L).start()
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
    var seen: (String, String, String, Seq[String], Seq[String]) = null
    val srv = new IngestServer(
      spool = (_, _, _) => (),
      bulkLoad = (d, t, m, pk, lines) => { seen = (d, t, m, pk, lines); lines.length.toLong }
    ).start()
    try {
      val (code, resp) = post(
        s"http://127.0.0.1:${srv.port}/bulk/duck?tableName=items&mode=batch&pk=a&pk=b",
        "{\"a\":1}\n{\"a\":2}\n\n{\"a\":3}")
      assert(code == 200 && resp == """{"ok":true,"rows":3}""")
      // repeated ?pk= params arrive in order (router.go QueryArray)
      assert(seen == (("duck", "items", "batch", Seq("a", "b"),
        Seq("{\"a\":1}", "{\"a\":2}", "{\"a\":3}"))))
    } finally srv.stop()
  }

  test("bulk contract: tableName required, X-Jitsu-Schema validated + forwarded, ABORT aborts") {
    var seen: BulkRequest = null
    val srv = new IngestServer((_, _, _) => (), (_, _, _, _, _) => 0L,
      bulkLoadEx = Some(req => { seen = req; req.lines.length.toLong })).start()
    try {
      // tableName is required (router.go:253-256)
      val (c0, r0) = post(s"http://127.0.0.1:${srv.port}/bulk/d1", """{"a":1}""")
      assert(c0 == 400 && r0.contains("tableName query parameter is required"))
      // a declared schema rides X-Jitsu-Schema into the loader
      val schema = """{"name":"items","fields":[{"name":"a","type":4}]}"""
      val (c1, r1) = postAuth(s"http://127.0.0.1:${srv.port}/bulk/d1?tableName=items",
        "{\"a\":1}\n{\"a\":2}", Map("X-Jitsu-Schema" -> schema))
      assert(c1 == 200 && r1 == """{"ok":true,"rows":2}""")
      assert(seen == BulkRequest("d1", "items", "replace_table", Nil, Some(schema),
        Seq("""{"a":1}""", """{"a":2}""")))
      // malformed schema header: the reference's 400 before any stream work
      val (c2, r2) = postAuth(s"http://127.0.0.1:${srv.port}/bulk/d1?tableName=items",
        """{"a":1}""", Map("X-Jitsu-Schema" -> "{not json"))
      assert(c2 == 400 && r2.contains("schema unmarshal error"))
      // syntactically-valid but WRONG-SHAPED schemas 400 the same way — the
      // reference unmarshals into a struct (router.go:263-267), so a
      // non-object root / non-array fields / mistyped name all error
      Seq("[1,2]", "\"s\"", """{"fields":5}""", """{"fields":[5]}""",
        """{"fields":[{"name":5}]}""", """{"fields":[{"name":"a","type":"s"}]}""")
        .foreach { bad =>
          val (cb, rb) = postAuth(s"http://127.0.0.1:${srv.port}/bulk/d1?tableName=items",
            """{"a":1}""", Map("X-Jitsu-Schema" -> bad))
          assert(cb == 400 && rb.contains("schema unmarshal error"), s"schema $bad")
        }
      // an ABORT line anywhere aborts the load (router.go:285-289)
      seen = null
      val (c3, r3) = post(s"http://127.0.0.1:${srv.port}/bulk/d1?tableName=items",
        "{\"a\":1}\nABORT: caller gave up\n{\"a\":2}")
      assert(c3 == 400 && r3.contains("aborted") && seen == null)
      // consumed == 0 answers 200 ok but the LOADER NEVER RUNS
      // (router.go:313-317: Abort + ok) — an empty replace_table body must
      // not wipe the target
      seen = null
      val (c4, r4) = post(s"http://127.0.0.1:${srv.port}/bulk/d1?tableName=items", "\n  \n")
      assert(c4 == 200 && r4 == """{"ok":true,"rows":0}""" && seen == null)
    } finally srv.stop()
  }

  test("/post validates modeOverride; /profiles enqueues the profileId per (builder, priority)") {
    val spooled = scala.collection.mutable.ArrayBuffer.empty[(String, String, String)]
    val srv = new IngestServer(
      (d, t, e) => spooled.synchronized { spooled += ((d, t, e)); () },
      (_, _, _, _, _) => 0L).start()
    try {
      val (c1, _) = post(s"http://127.0.0.1:${srv.port}/post/pg1?tableName=t&modeOverride=stream",
        """{"a":1}""")
      assert(c1 == 200)
      val (c2, r2) = post(s"http://127.0.0.1:${srv.port}/post/pg1?tableName=t&modeOverride=upsert",
        """{"a":1}""")
      assert(c2 == 400 && r2.contains("invalid bulker mode: upsert"))
      // tableName required on the events path too (router.go:156-159) —
      // never silently defaulted
      val (c2b, r2b) = post(s"http://127.0.0.1:${srv.port}/post/pg1", """{"a":1}""")
      assert(c2b == 400 && r2b.contains("tableName query parameter is required"))
      // profile-rebuild trigger (router.go:193-218)
      val (c3, r3) = post(s"http://127.0.0.1:${srv.port}/profiles/pb1/high?profileId=u42", "")
      assert(c3 == 200 && r3 == """{"ok":true}""", r3)
      assert(spooled.toSeq.contains(("pb1", "profiles_high", """{"profileId":"u42"}""")))
      val (c4, _) = post(s"http://127.0.0.1:${srv.port}/profiles/pb1", "")
      assert(c4 == 400) // priority segment required
    } finally srv.stop()
  }

  test("bulk default mode is replace_table (router.go:233)") {
    var mode = ""
    val srv = new IngestServer((_, _, _) => (), (_, _, m, _, _) => { mode = m; 0L }).start()
    try {
      post(s"http://127.0.0.1:${srv.port}/bulk/x?tableName=t", """{"a":1}""")
      assert(mode == "replace_table")
    } finally srv.stop()
  }

  test("a failing bulk load returns ok:false with the error — S2 abort path") {
    val srv = new IngestServer((_, _, _) => (),
      (_, _, _, _, _) => throw new RuntimeException("sink down")).start()
    try {
      val (code, resp) = post(s"http://127.0.0.1:${srv.port}/bulk/x?tableName=t", """{"a":1}""")
      assert(code == 500 && resp.contains("sink down"))
    } finally srv.stop()
  }

  test("error bodies stay valid JSON when the exception message carries quotes") {
    val srv = new IngestServer(
      (_, _, _) => throw new RuntimeException("""boom "quoted" \ path"""),
      (_, _, _, _, _) => throw new RuntimeException(null: String)).start()
    try {
      val (c1, r1) = post(s"http://127.0.0.1:${srv.port}/post/x?tableName=t", """{"a":1}""")
      assert(c1 == 500 && r1.contains("""boom \"quoted\" \\ path"""), r1)
      // a null message renders as the fallback, not the string "null"
      val (c2, r2) = post(s"http://127.0.0.1:${srv.port}/bulk/x?tableName=t", """{"a":1}""")
      assert(c2 == 500 && r2.contains("load failed") && !r2.contains("\"null\""), r2)
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
