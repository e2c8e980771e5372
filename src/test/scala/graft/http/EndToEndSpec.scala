package graft.http

import java.net.{HttpURLConnection, URI}
import java.nio.charset.StandardCharsets.UTF_8
import org.apache.spark.sql.types._
import graft.{Engine, StreamConfig}
import graft.sink.{JdbcSink, TableCache}
import graft.sql.DerbyDialect
import graft.streaming.{MicroBatch, RetryQueue}
import graft.SparkSuite

/** The reference's §3.1 production path end-to-end: HTTP POST → spool
  * (Kafka stand-in) → checkpointed micro-batch consumer → transactional
  * warehouse load; and §3.2: HTTP bulk → synchronous engine load. Every
  * hop is the real component, wired together. */
class EndToEndSpec extends SparkSuite {

  private def post(url: String, body: String): Int = {
    val conn = new URI(url).toURL.openConnection().asInstanceOf[HttpURLConnection]
    conn.setRequestMethod("POST"); conn.setDoOutput(true)
    val out = conn.getOutputStream
    try out.write(body.getBytes(UTF_8)) finally out.close()
    val code = conn.getResponseCode
    conn.getInputStream.readAllBytes(); conn.disconnect()
    code
  }

  test("async path: POST /post → spool file → micro-batch stream → Derby") {
    TableCache.clear()
    val base = java.nio.file.Files.createTempDirectory("graft_e2e_").toString
    val sink = JdbcSink("jdbc:derby:memory:e2e_async;create=true", DerbyDialect)
    try sink.withConnection(sink.exec(_, """DROP TABLE "ORDERS"""" ))
    catch { case _: Exception => () }

    // S1: one spool segment per (dest, table) — appended per event like the
    // reference's per-topic produce
    val srv = new IngestServer(
      spool = (dest, table, event) => {
        val dir = new java.io.File(s"$base/spool/$dest")
        dir.mkdirs()
        val f = new java.io.FileWriter(new java.io.File(dir, s"$table.json"), true)
        try f.write(event + "\n") finally f.close()
      },
      bulkLoad = (_, _, _, _, _) => 0L).start()
    try {
      (1 to 5).foreach(i =>
        assert(post(s"http://127.0.0.1:${srv.port}/post/pg1?tableName=orders",
          s"""{"id":$i,"v":"r$i"}""") == 200))
    } finally srv.stop()

    // S4+B3: the batch consumer drains the spool into the warehouse
    val engine = new Engine(spark, sink)
    val retry = RetryQueue(s"$base/retry", s"$base/dlq")
    MicroBatch.runFileStream(spark, s"$base/spool/pg1",
      StructType(Seq(StructField("id", LongType), StructField("v", StringType))),
      s"$base/ckpt", retry, clock = () => 0L) { batch =>
      import spark.implicits._
      val st = engine.createStream("orders",
        StreamConfig(mode = Engine.Batch, pk = Seq("id"), deduplicate = true))
      st.consumeDataset(batch.toJSON)
      assert(st.complete().status == "ok")
    }
    val back = spark.read.jdbc(sink.url, "\"ORDERS\"", new java.util.Properties())
    assert(back.count() == 5)
    assert(canon(back.filter("ID = 3").select("V")) == Seq(Seq("r3")))
  }

  test("sync path: POST /bulk → engine load → rows in the response table") {
    TableCache.clear()
    val sink = JdbcSink("jdbc:derby:memory:e2e_bulk;create=true", DerbyDialect)
    try sink.withConnection(sink.exec(_, """DROP TABLE "ITEMS"""" ))
    catch { case _: Exception => () }
    val engine = new Engine(spark, sink)
    val srv = new IngestServer(
      spool = (_, _, _) => (),
      bulkLoad = (_, table, mode, pk, lines) => {
        import spark.implicits._
        // ?pk= switches on pk + dedup exactly like the reference's
        // WithPrimaryKey(pkeys...) + WithDeduplicate (router.go:258-262)
        val st = engine.createStream(table,
          StreamConfig(mode = mode, pk = pk, deduplicate = pk.nonEmpty))
        st.consumeDataset(lines.toDS())
        val state = st.complete()
        assert(state.status == "ok", state.error)
        state.rows
      }).start()
    try {
      val body = (1 to 7).map(i => s"""{"id":$i}""").mkString("\n")
      assert(post(s"http://127.0.0.1:${srv.port}/bulk/d1?tableName=items&mode=replace_table",
        body) == 200)
      // the pk leg: duplicate ids in one NDJSON body collapse (last wins)
      val dupBody = ((1 to 6).map(i => s"""{"id":$i,"v":"a$i"}""") :+
        """{"id":3,"v":"winner"}""").mkString("\n")
      assert(post(s"http://127.0.0.1:${srv.port}/bulk/d1?tableName=items&mode=replace_table&pk=id",
        dupBody) == 200)
    } finally srv.stop()
    val back = spark.read.jdbc(sink.url, "\"ITEMS\"", new java.util.Properties())
    assert(back.count() == 6)
    assert(canon(back.filter("ID = 3").select("V")) == Seq(Seq("winner")))
  }

  test("sync path: X-Jitsu-Schema pins declared column types through the LIVE engine load") {
    TableCache.clear()
    val sink = JdbcSink("jdbc:derby:memory:e2e_schema;create=true", DerbyDialect)
    try sink.withConnection(sink.exec(_, """DROP TABLE "TYPED"""" ))
    catch { case _: Exception => () }
    val engine = new Engine(spark, sink)
    val srv = new IngestServer(
      spool = (_, _, _) => (), bulkLoad = (_, _, _, _, _) => 0L,
      bulkLoadEx = Some { req =>
        import spark.implicits._
        val (declared, kinds) = req.declaredSchema
        val st = engine.createStream(req.table, StreamConfig(mode = req.mode,
          pk = req.pks, deduplicate = req.pks.nonEmpty,
          declaredFields = declared, columnTypes = kinds))
        st.consumeDataset(req.lines.toDS())
        val state = st.complete()
        assert(state.status == "ok", state.error)
        state.rows
      }).start()
    try {
      // score is declared FLOAT64 though every value in the data is a
      // round int, and note is declared STRING but absent from the data —
      // WithSchema pins both ahead of inference (datatype iota ints)
      val schema = """{"name":"typed","fields":[{"name":"id","type":2},""" +
        """{"name":"score","type":3},{"name":"note","type":4}]}"""
      val conn = new java.net.URI(
        s"http://127.0.0.1:${srv.port}/bulk/d1?tableName=typed&mode=replace_table")
        .toURL.openConnection().asInstanceOf[java.net.HttpURLConnection]
      conn.setRequestMethod("POST"); conn.setDoOutput(true)
      conn.setRequestProperty("X-Jitsu-Schema", schema)
      val out = conn.getOutputStream
      try out.write("{\"id\":1,\"score\":5}\n{\"id\":2,\"score\":7}".getBytes("UTF-8"))
      finally out.close()
      assert(conn.getResponseCode == 200)
      conn.disconnect()
    } finally srv.stop()
    val cols = sink.existingColumns("TYPED").get.map(c => c.name -> c.kind).toMap
    assert(cols("SCORE") == graft.core.DataKind.Float64) // pinned, not inferred Int64
    assert(cols("NOTE") == graft.core.DataKind.Str)      // declared-only column exists
    val back = spark.read.jdbc(sink.url, "\"TYPED\"", new java.util.Properties())
    assert(back.count() == 2)
  }

  test("declared-but-absent columns respect maxColumns — seeding cannot push the DDL past the cap") {
    TableCache.clear()
    val sink = JdbcSink("jdbc:derby:memory:e2e_cap;create=true", DerbyDialect)
    try sink.withConnection(sink.exec(_, """DROP TABLE "CAPPED"""" ))
    catch { case _: Exception => () }
    val engine = new Engine(spark, sink)
    import spark.implicits._
    // data carries 2 columns = exactly the cap; both declared-only fields
    // have zero room and must drop (they carry no data), NOT overflow the
    // DDL to 4 columns
    val st = engine.createStream("capped", StreamConfig(mode = "replace_table",
      maxColumns = 2, declaredFields = Seq("id", "v", "note", "extra"),
      columnTypes = Map("note" -> graft.core.DataKind.Str)))
    st.consumeDataset(Seq("""{"id":1,"v":"x"}""", """{"id":2,"v":"y"}""").toDS())
    val state = st.complete()
    assert(state.status == "ok", state.error)
    val cols = sink.existingColumns("CAPPED").get.map(_.name).toSet
    assert(cols == Set("ID", "V"), s"DDL exceeded the cap: $cols")
  }
}
