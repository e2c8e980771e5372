package graft.sink

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets.UTF_8
import java.util.zip.GZIPInputStream

import graft.SparkSuite

/** Mixpanel api_based adapter: envelope shaping, gzip transport, the fixed
  * retry ladder, and the soft-400 validation contract — all against a local
  * endpoint (mixpanel.go:25,103-174 semantics). */
class MixpanelSpec extends SparkSuite {
  import spark.implicits._

  private def withServer(handler: (Int, HttpExchange) => (Int, String))
                        (f: String => Unit): Unit = {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    val n = new java.util.concurrent.atomic.AtomicInteger()
    server.createContext("/", (ex: HttpExchange) => {
      val (code, body) = handler(n.incrementAndGet(), ex)
      val bytes = body.getBytes(UTF_8)
      ex.sendResponseHeaders(code, bytes.length.toLong)
      ex.getResponseBody.write(bytes)
      ex.close()
    })
    server.start()
    try f(s"http://127.0.0.1:${server.getAddress.getPort}")
    finally server.stop(0)
  }

  private def gunzip(b: Array[Byte]): String =
    new String(new GZIPInputStream(new java.io.ByteArrayInputStream(b))
      .readAllBytes(), UTF_8)

  test("shape maps flat events into the /import envelope") {
    val df = Seq((7L, 42L, "click", 1704067200000L, 0.5))
      .toDF("event_id", "user_id", "event_type", "ts_ms", "value")
    val j = Mixpanel("p1", "sa:pw").shape(df).collect()(0).getString(0)
    assert(j == """{"event":"click","properties":{"time":1704067200000,""" +
      """"$insert_id":"7","distinct_id":"42","value":0.5}}""", j)
  }

  test("importUrl: US default, EU residency, test override") {
    assert(Mixpanel("p1", "sa").importUrl ==
      "https://api.mixpanel.com/import?strict=1&project_id=p1")
    assert(Mixpanel("p1", "sa", dataResidency = "EU").importUrl ==
      "https://api-eu.mixpanel.com/import?strict=1&project_id=p1")
    assert(Mixpanel("p1", "sa", apiBase = Some("http://x:1")).importUrl ==
      "http://x:1/import?strict=1&project_id=p1")
  }

  test("postChunk ships gzip NDJSON with Basic service-account auth") {
    var seen: (String, String, String) = null
    withServer { (_, ex) =>
      seen = (gunzip(ex.getRequestBody.readAllBytes()),
        ex.getRequestHeaders.getFirst("Authorization"),
        ex.getRequestHeaders.getFirst("Content-Encoding"))
      (200, """{"num_records_imported":2,"status":"OK"}""")
    } { base =>
      val r = Mixpanel.postChunk(s"$base/import?strict=1&project_id=p", "sa:pw",
        "{\"a\":1}\n{\"a\":2}")
      assert(r.status == 200 && !r.softFailure)
    }
    assert(seen._1 == "{\"a\":1}\n{\"a\":2}")
    assert(seen._2 == "Basic " + java.util.Base64.getEncoder
      .encodeToString("sa:pw".getBytes(UTF_8)))
    assert(seen._3 == "gzip")
  }

  test("retry ladder: 503 then 200 succeeds; persistent 503 exhausts 5 attempts") {
    var calls = 0
    withServer { (nth, _) =>
      calls = nth
      if (nth < 3) (503, "unavailable") else (200, "{}")
    } { base =>
      assert(Mixpanel.postChunk(s"$base/i", "sa", "{}").status == 200)
    }
    assert(calls == 3)
    var total = 0
    withServer { (nth, _) => total = nth; (503, "down") } { base =>
      val e = intercept[RuntimeException](Mixpanel.postChunk(s"$base/i", "sa", "{}"))
      assert(e.getMessage.contains("failed after 5 attempts"))
    }
    assert(total == 5)
  }

  test("400 validation with partial import is SOFT; other 400s throw") {
    withServer { (_, _) =>
      (400, """{"code":400,"error":"some data points in the request failed validation","num_records_imported":1,"failed_records":[{"index":0,"field":"properties.time","message":"missing"}]}""")
    } { base =>
      val r = Mixpanel.postChunk(s"$base/i", "sa", "{}")
      assert(r.status == 400 && r.softFailure)
    }
    withServer { (_, _) => (400, """{"error":"malformed"}""") } { base =>
      intercept[RuntimeException](Mixpanel.postChunk(s"$base/i", "sa", "{}"))
    }
  }

  test("post drives the distributed path end to end") {
    val received = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    withServer { (_, ex) =>
      received.add(gunzip(ex.getRequestBody.readAllBytes()))
      (200, "{}")
    } { base =>
      val df = (1L to 6L).map(i => (i, i * 10, "click", 1704067200000L + i))
        .toDF("event_id", "user_id", "event_type", "ts_ms")
      val mp = Mixpanel("p", "sa", apiBase = Some(base), chunkRows = 2)
      mp.post(mp.shape(df))
    }
    val lines = received.toArray.map(_.toString).flatMap(_.split("\n"))
    assert(lines.length == 6)
    assert(lines.forall(l => l.contains("\"event\":\"click\"") &&
      l.contains("$insert_id")))
  }
}
