package graft.streaming

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._
import graft.SparkSuite

/** Config hot-reload (`jitsubase/appbase/abstract_repository.go` +
  * `bulkerapp/app/http_configuration_source.go`): atomic snapshot swap,
  * tag short-circuit, keep-stale-on-failure, change notification — and the
  * property that matters in the stream: a link added/removed mid-stream
  * takes effect on the next micro-batch with no event lost. */
class ConfigReloadSpec extends SparkSuite {

  test("ConfigRepository: tag short-circuit, atomic swap + onChange, stale survives a failing poll") {
    var polls = 0
    val repo = new ConfigRepository[Map[String, Int]](Map("a" -> 1), tag => {
      polls += 1
      polls match {
        case 1 => Some((Map("a" -> 2), "v2"))        // modified
        case 2 => assert(tag.contains("v2")); None   // unmodified at tag v2
        case _ => throw new RuntimeException("config source down")
      }
    })
    val seen = scala.collection.mutable.ArrayBuffer.empty[Map[String, Int]]
    repo.onChange(m => { seen += m; () })
    assert(repo.current == Map("a" -> 1))
    assert(repo.refresh())                      // swap
    assert(repo.current == Map("a" -> 2))
    assert(!repo.refresh())                     // tag says unmodified
    assert(!repo.refresh())                     // source down: keep stale
    assert(repo.current == Map("a" -> 2) && repo.failureCount == 1)
    assert(seen.toSeq == Seq(Map("a" -> 2)))
  }

  test("a throwing onChange listener cannot mask a successful swap or starve later listeners") {
    val repo = new ConfigRepository[Int](0, _ => Some((1, "v1")))
    val calls = scala.collection.mutable.ArrayBuffer.empty[String]
    repo.onChange(_ => { calls += "first"; throw new RuntimeException("listener bug") })
    repo.onChange(v => { calls += s"second:$v"; () })
    // the swap already happened, so refresh() reports TRUE (not a load
    // failure), failureCount stays 0, and the second listener still fires
    assert(repo.refresh())
    assert(repo.current == 1 && repo.failureCount == 0)
    assert(calls.toSeq == Seq("first", "second:1"))
  }

  test("link added mid-stream takes effect on the NEXT micro-batch; no event lost") {
    val base = java.nio.file.Files.createTempDirectory("graft_reload_").toString
    val dir = new java.io.File(s"$base/input"); dir.mkdirs()
    // two "topic segments" = two micro-batches (maxFilesPerTrigger=1)
    def write(name: String, ids: Range): Unit = {
      val w = new java.io.PrintWriter(s"$base/input/$name")
      try ids.foreach { i =>
        val typ = if (i % 2 == 0) "click" else "view"
        w.println(s"""{"id":$i,"typ":"$typ","evt":"e$i","host":"app.io"}""")
      } finally w.close()
    }
    write("001.json", 1 to 4)
    write("002.json", 5 to 8)
    // equal mtimes leave the micro-batch order to map iteration — pin it
    assert(new java.io.File(s"$base/input/001.json")
      .setLastModified(System.currentTimeMillis() - 60000L))
    assert(new java.io.File(s"$base/input/002.json")
      .setLastModified(System.currentTimeMillis()))
    val v1 = Seq("A" -> IngestFilters.Opts())
    val v2 = Seq("A" -> IngestFilters.Opts(events = Some("click")),
      "B" -> IngestFilters.Opts())
    val links = new ConfigRepository[Seq[(String, IngestFilters.Opts)]](v1,
      tag => if (tag.isEmpty) Some((v2, "v2")) else None)
    val landed = scala.collection.mutable.Map.empty[String, Set[Long]]
    val schema = StructType(Seq(StructField("id", LongType),
      StructField("typ", StringType), StructField("evt", StringType),
      StructField("host", StringType)))
    val retry = RetryQueue(s"$base/retry", s"$base/dlq")
    MicroBatch.runFileStream(spark, s"$base/input", schema, s"$base/ckpt",
      retry, clock = () => 0L) { batch =>
      // the reference's consumers read repository.GetData() per cycle; the
      // Spark twin reads the snapshot at each micro-batch boundary
      Router.routeLinks(batch, links.current, "typ", "evt", "host") { (dest, slice) =>
        val ids = slice.select("id").collect().map(_.getLong(0)).toSet
        landed.synchronized {
          landed(dest) = landed.getOrElse(dest, Set.empty) ++ ids; ()
        }
      }
      links.refresh() // the poll lands BETWEEN batches
      ()
    }
    // batch 1 ran under v1: everything to A, B did not exist yet
    assert(landed("A").intersect((1L to 4L).toSet) == (1L to 4L).toSet)
    // batch 2 ran under v2: A narrowed to clicks, the NEW link B got all —
    // and the union proves no event of batch 2 was lost in the swap
    assert(landed("A").intersect((5L to 8L).toSet) == Set(6L, 8L))
    assert(landed("B") == (5L to 8L).toSet)
  }

  test("IngestServer.updateAuth: a revoked key 401s and a new key lands without restart") {
    import graft.http.{IngestServer, WriteKeys}
    def reg(keyId: String, secret: String) = WriteKeys.Registry(
      bindings = Map(keyId -> WriteKeys.Binding(keyId,
        WriteKeys.storedHash(secret, "s", "gs"), "destA", "s2s")),
      plain = Map.empty, globalSecrets = Seq("gs"))
    val spooled = new java.util.concurrent.atomic.AtomicInteger(0)
    val srv = new IngestServer((_, _, _) => { spooled.incrementAndGet(); () },
      (_, _, _, _, _) => 0L, auth = Some(reg("k1", "sec1"))).start()
    try {
      def post(key: String): Int = {
        val conn = new java.net.URI(
          s"http://127.0.0.1:${srv.port}/api/s/s2s/track")
          .toURL.openConnection().asInstanceOf[java.net.HttpURLConnection]
        conn.setRequestMethod("POST"); conn.setDoOutput(true)
        conn.setRequestProperty("X-Write-Key", key)
        val out = conn.getOutputStream
        try out.write("""{"a":1}""".getBytes("UTF-8")) finally out.close()
        val c = conn.getResponseCode; conn.disconnect(); c
      }
      assert(post("k1:sec1") == 200)
      srv.updateAuth(reg("k2", "sec2")) // key rotation: k1 revoked, k2 live
      assert(post("k1:sec1") == 401)
      assert(post("k2:sec2") == 200)
      assert(spooled.get() == 2)
    } finally srv.stop()
  }
}
