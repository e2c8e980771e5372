package graft.sources

import graft.{Engine, SparkSuite}
import graft.core.DataKind
import graft.sink.JdbcSink
import graft.sql.DerbyDialect

/** Airbyte-protocol source (S6): the parsing/catalog half and the read
  * sidecar's state-gating + status-rollup matrix (sync-sidecar/read.go,
  * types.go, spec_catalog.go, main.go:194-213). */
class AirbyteSpec extends SparkSuite {

  // --- line classification (main.go:194-213) ---

  test("classify: JSON rows, level-word passthrough, unknown-word ERROR, malformed") {
    assert(Airbyte.classify("""{"type":"LOG","log":{"level":"INFO","message":"m"}}""")
      .isInstanceOf[Airbyte.JsonRow])
    assert(Airbyte.classify("  info starting up ") ==
      Airbyte.Passthrough("INFO", "starting up"))
    assert(Airbyte.classify("WARN low disk") == Airbyte.Passthrough("WARN", "low disk"))
    // unknown first word → whole line at ERROR level (main.go:210)
    assert(Airbyte.classify("stacktrace at Foo.bar") ==
      Airbyte.Passthrough("ERROR", "stacktrace at Foo.bar"))
    assert(Airbyte.classify("""{"type":"LOG", broken""") ==
      Airbyte.Passthrough("ERROR", """{"type":"LOG", broken"""))
    assert(Airbyte.classify("""{"type":"LOG", broken}""").isInstanceOf[Airbyte.Malformed])
  }

  // --- JSON-schema property → type ladder (types.go:159-201) ---

  test("propertyKind maps the reference's type ladder") {
    def kind(json: String) = Airbyte.propertyKind(Airbyte.mapper.readTree(json))
    assert(kind("""{"type":"string"}""") == DataKind.Str)
    assert(kind("""{"type":"string","format":"date-time"}""") == DataKind.Timestamp)
    assert(kind("""{"type":"string","format":"date"}""") == DataKind.Timestamp)
    assert(kind("""{"type":"boolean"}""") == DataKind.Bool)
    assert(kind("""{"type":"integer"}""") == DataKind.Int64)
    assert(kind("""{"type":"number"}""") == DataKind.Float64)
    assert(kind("""{"type":"number","airbyte_type":"integer"}""") == DataKind.Int64)
    assert(kind("""{"type":["null","integer"]}""") == DataKind.Int64)
    assert(kind("""{"type":"array"}""") == DataKind.Json)
    assert(kind("""{"type":"object"}""") == DataKind.Json)
    assert(kind("""{"oneOf":[{"type":"string"},{"type":"integer"}]}""") == DataKind.Str)
    assert(kind("""{}""") == DataKind.Str)
  }

  test("parseCatalog: stream key, flattened pk, table_name override, order") {
    val streams = Airbyte.parseCatalog("""{"streams":[
      {"stream":{"name":"a","namespace":"ns",
        "json_schema":{"properties":{"id":{"type":"integer"},"v":{"type":"number"}}},
        "source_defined_primary_key":[["id"],["v"]],
        "default_cursor_field":["v"]},
       "sync_mode":"incremental","cursor_field":["id"]},
      {"stream":{"name":"b","namespace":"","table_name":"custom_t",
        "json_schema":{"properties":{}},"source_defined_primary_key":[],
        "default_cursor_field":[]},
       "sync_mode":"full_refresh","cursor_field":[]}]}""")
    assert(streams.map(_.key) == Seq("ns.a", "b"))
    assert(streams.head.primaryKeys == Seq("id", "v")) // [][]string flattened
    assert(streams.head.schema == Seq("id" -> DataKind.Int64, "v" -> DataKind.Float64))
    assert(streams.head.cursorField == Seq("id"))
    assert(streams(1).tableName.contains("custom_t"))
  }

  // --- read sidecar matrix ---

  private def freshEngine(db: String): (Engine, JdbcSink) = {
    val sink = JdbcSink(s"jdbc:derby:memory:$db;create=true", DerbyDialect,
      maxWriteConnections = 2)
    (new Engine(spark, sink), sink)
  }

  private val oneStreamCatalog = Airbyte.parseCatalog("""{"streams":[
    {"stream":{"name":"t","namespace":"ns",
      "json_schema":{"properties":{"id":{"type":"integer"},"v":{"type":"integer"}}},
      "source_defined_primary_key":[["id"]],"default_cursor_field":["v"]},
     "sync_mode":"incremental","cursor_field":[]}]}""")

  private def rec(id: Long, v: Long) =
    s"""{"type":"RECORD","record":{"stream":"t","namespace":"ns","data":{"id":$id,"v":$v}}}"""
  private def state(v: Long) =
    s"""{"type":"STATE","state":{"type":"STREAM","stream":{"stream_descriptor":{"name":"t","namespace":"ns"},"stream_state":{"v":$v}}}}"""
  private def status(st: String) =
    s"""{"type":"TRACE","trace":{"type":"STREAM_STATUS","stream_status":{"stream_descriptor":{"name":"t","namespace":"ns"},"status":"$st"}}}"""

  test("STATE for an unprocessed stream is ignored; sentinel states gate on run error") {
    val (engine, _) = freshEngine("ab_spec_gate1")
    val runner = new AirbyteRunner(engine, oneStreamCatalog)
    // STREAM state before any record/STARTED: stream not processed → dropped
    runner.processLine(state(7))
    // LEGACY + GLOBAL states save while the run is clean
    runner.processLine("""{"type":"STATE","state":{"data":{"legacy":1}}}""")
    runner.processLine(
      """{"type":"STATE","state":{"type":"GLOBAL","global":{"shared_state":{"g":1}}}}""")
    // an ERROR-level connector LOG registers the run error (main.go:165-167)
    runner.processLine("""{"type":"LOG","log":{"level":"ERROR","message":"boom"}}""")
    // …after which sentinel states are NOT saved (read.go:315-319)
    runner.processLine("""{"type":"STATE","state":{"data":{"legacy":2}}}""")
    val result = runner.finish()
    assert(result.states == Seq(
      AirbyteRunner.LegacyStateKey -> """{"legacy":1}""",
      AirbyteRunner.GlobalStateKey -> """{"shared_state":{"g":1}}"""))
    // the unprocessed catalog stream rolls up FAILED (read.go:94)
    assert(result.streams.map(r => (r.stream, r.status)) == Seq("ns.t" -> "FAILED"))
    assert(result.status == "FAILED")
  }

  test("stream error blocks later records, later states, and yields PARTIAL after a commit") {
    val (engine, sink) = freshEngine("ab_spec_gate2")
    try sink.withConnection(sink.exec(_, """DROP TABLE "T"""")) catch { case _: Exception => () }
    val runner = new AirbyteRunner(engine, oneStreamCatalog,
      AirbyteRunner.Config(initialState = """{"ns.t":{"v":0}}"""))
    runner.processLine(status("STARTED"))
    runner.processLine(rec(1, 10)); runner.processLine(rec(2, 20))
    runner.processLine(state(20)) // incremental → checkpoint: commit + save
    runner.processLine(
      """{"type":"TRACE","trace":{"type":"ERROR","error":{"stream_descriptor":{"name":"t","namespace":"ns"},"message":"died"}}}""")
    runner.processLine(rec(3, 30)) // ignored: stream already errored
    runner.processLine(state(30))  // NOT saved (read.go:311-314)
    runner.processLine(status("INCOMPLETE"))
    val result = runner.finish()
    assert(result.states == Seq("ns.t" -> """{"v":20}"""))
    val sr = result.streams.head
    assert(sr.status == "PARTIAL" && sr.events == 2 && sr.error == "died")
    assert(result.status == "PARTIAL")
    val rows = spark.read.jdbc(sink.url, "\"T\"", new java.util.Properties())
    assert(rows.count() == 2) // only the checkpointed chunk landed
  }

  test("clean incremental run: chunked commits, duplicate STATE suppressed, SUCCESS") {
    val (engine, sink) = freshEngine("ab_spec_gate3")
    try sink.withConnection(sink.exec(_, """DROP TABLE "T"""")) catch { case _: Exception => () }
    val runner = new AirbyteRunner(engine, oneStreamCatalog,
      AirbyteRunner.Config(initialState = """{"ns.t":{"v":0}}"""))
    runner.processLine(status("STARTED"))
    runner.processLine(rec(1, 10))
    runner.processLine(state(10)); runner.processLine(state(10)) // dup line suppressed
    runner.processLine(rec(1, 99)) // pk update in a later chunk: merge last-wins
    runner.processLine(rec(2, 20))
    runner.processLine(state(99))
    runner.processLine(status("COMPLETE"))
    val result = runner.finish()
    assert(result.streams.head.status == "SUCCESS")
    assert(result.streams.head.events == 3)
    assert(result.states == Seq("ns.t" -> """{"v":99}"""))
    assert(result.status == "SUCCESS")
    val rows = spark.read.jdbc(sink.url, "\"T\"", new java.util.Properties())
      .collect().map(r => (r.getLong(r.fieldIndex("ID")), r.getLong(r.fieldIndex("V"))))
      .sortBy(_._1).toSeq
    assert(rows == Seq(1L -> 99L, 2L -> 20L))
  }

  test("interrupted stream without its own error takes errorFromLogs or the interrupt text") {
    val (engine, _) = freshEngine("ab_spec_gate4")
    val runner = new AirbyteRunner(engine, oneStreamCatalog)
    runner.processLine(status("STARTED"))
    runner.processLine(rec(1, 10))
    // solely-running stream: an ERROR log attributes to it (read.go:267-279)
    runner.processLine("""{"type":"LOG","log":{"level":"ERROR","message":"oom"}}""")
    val result = runner.finish() // run error → close(complete=false)
    val sr = result.streams.head
    assert(sr.status == "FAILED" && sr.error == "oom" && sr.events == 0)
    assert(result.status == "FAILED")
    assert(result.error == "ERROR: oom")
  }

  test("record for a stream missing from the catalog is dropped with a log, run unharmed") {
    val (engine, _) = freshEngine("ab_spec_gate5")
    val runner = new AirbyteRunner(engine, oneStreamCatalog,
      AirbyteRunner.Config(initialState = "{}"))
    runner.processLine(
      """{"type":"RECORD","record":{"stream":"ghost","namespace":"ns","data":{"id":1}}}""")
    runner.processLine(status("STARTED"))
    runner.processLine(rec(1, 1))
    runner.processLine(state(1))
    runner.processLine(status("COMPLETE"))
    val result = runner.finish()
    assert(result.streams.map(_.status) == Seq("SUCCESS"))
    assert(result.status == "SUCCESS")
    assert(result.logs.exists(l => l._3.contains("'ns.ghost' is not in catalog")))
  }

  test("generic TRACE ERROR message falls back to internal_message then errorFromLogs") {
    val (engine, _) = freshEngine("ab_spec_gate6")
    val runner = new AirbyteRunner(engine, oneStreamCatalog)
    runner.processLine(status("STARTED"))
    runner.processLine(rec(1, 1))
    runner.processLine("""{"type":"LOG","log":{"level":"FATAL","message":"root cause"}}""")
    runner.processLine(s"""{"type":"TRACE","trace":{"type":"ERROR","error":{"stream_descriptor":{"name":"t","namespace":"ns"},"message":"${AirbyteRunner.SomethingWentWrongError}","internal_message":""}}}""")
    val result = runner.finish()
    // read.go:567-570: the generic message yields to the attributed log error
    assert(result.streams.head.error == "root cause")
  }

  test("unsupported message type aborts the run like the reference's panic") {
    val (engine, _) = freshEngine("ab_spec_gate7")
    val runner = new AirbyteRunner(engine, oneStreamCatalog)
    val result = runner.run(Iterator(
      status("STARTED"), rec(1, 1),
      """{"type":"WHATEVER"}""",
      rec(2, 2))) // never reached
    assert(result.streams.head.status == "FAILED")
    assert(result.status == "FAILED")
    assert(result.error.contains("not supported Airbyte message type"))
  }

  test("${LEGACY} namespace folds the full stream key into the table name") {
    val (engine, sink) = freshEngine("ab_spec_ns")
    try sink.withConnection(sink.exec(_, """DROP TABLE "P_NS_T"""")) catch { case _: Exception => () }
    val runner = new AirbyteRunner(engine, oneStreamCatalog,
      AirbyteRunner.Config(namespace = AirbyteRunner.LegacyNamespace,
        tableNamePrefix = "p_", initialState = "{}"))
    runner.processLine(status("STARTED"))
    runner.processLine(rec(5, 50))
    runner.processLine(status("COMPLETE"))
    val result = runner.finish()
    assert(result.status == "SUCCESS")
    // table p_<namespace.name> with the dot sanitized by the dialect
    val rows = spark.read.jdbc(sink.url, "\"P_NS_T\"", new java.util.Properties())
    assert(rows.count() == 1)
  }

  // --- spec/check/discover sidecar (spec_catalog.go) ---

  test("discover: payload rows clear earlier soft errors; SUCCEEDED normalizes") {
    val r = Airbyte.runDiscover(Iterator(
      """{"type":"LOG","log":{"level":"ERROR","message":"transient"}}""",
      """{"type":"CONNECTION_STATUS","connectionStatus":{"status":"SUCCEEDED","message":"ok"}}""",
      """{"type":"CATALOG","catalog":{"streams":[]}}""",
      "info done"))
    assert(r.status == "SUCCESS")
    assert(r.connectionStatus.contains(("SUCCESS", "ok")))
    assert(r.catalog.contains("""{"streams":[]}"""))
  }

  test("discover: a lone ERROR log fails the command; SPEC row lands verbatim") {
    val bad = Airbyte.runDiscover(Iterator(
      """{"type":"LOG","log":{"level":"ERROR","message":"no creds"}}"""))
    assert(bad.status == "FAILED" && bad.error == "no creds")
    val ok = Airbyte.runDiscover(Iterator(
      """{"type":"SPEC","spec":{"connectionSpecification":{"type":"object"}}}"""))
    assert(ok.status == "SUCCESS")
    assert(ok.spec.contains("""{"connectionSpecification":{"type":"object"}}"""))
  }
}
