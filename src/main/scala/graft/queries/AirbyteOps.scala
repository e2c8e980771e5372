package graft.queries

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Engine
import graft.core.Tables
import graft.sink.JdbcSink
import graft.sources.{Airbyte, AirbyteRunner}
import graft.sql.DerbyDialect

/** S6 — the Airbyte-protocol source data plane (sync-sidecar/read.go) LIVE
  * end-to-end: a deterministic connector transcript (RECORD / STATE / TRACE
  * / LOG / CONTROL lines derived from the events + customer tables) runs
  * through [[graft.sources.AirbyteRunner]] into a Derby-backed
  * [[graft.Engine]], and the output is the union of the final warehouse
  * tables, the per-stream status map, and the saved state checkpoints —
  * every piece recomputable by the oracle from the same parquet.
  *
  * The transcript exercises the protocol's load-bearing semantics:
  *   - incremental + initial state → Batch mode; chunked STATE checkpoints
  *     commit-then-save; a cross-chunk pk update merges last-wins;
  *   - full_refresh → ReplaceTable: a pre-seeded junk generation vanishes;
  *   - a mid-stream TRACE ERROR: later records ignored, later STATEs NOT
  *     saved ("because of previous errors", read.go:311-314), final status
  *     PARTIAL (committed chunk survives), run rollup PARTIAL.
  *
  * The driver plays the CONNECTOR role (the protocol is a sequential pipe by
  * nature — same adjudication as b8's HTTP-client loop); the engine side of
  * every chunk load is fully distributed.
  */
object AirbyteOps {

  private val CatalogJson = """{"streams":[
    {"stream":{"name":"orders_inc","namespace":"dev",
      "json_schema":{"properties":{
        "event_id":{"type":"integer"},"user_id":{"type":"integer"},
        "etype":{"type":"string"},"cents":{"type":"integer"}}},
      "source_defined_primary_key":[["event_id"]],
      "default_cursor_field":[]},
     "sync_mode":"incremental","cursor_field":["cents"]},
    {"stream":{"name":"users_full","namespace":"dev",
      "json_schema":{"properties":{
        "k":{"type":"integer"},"name":{"type":"string"},
        "cents":{"type":"number","airbyte_type":"integer"}}},
      "source_defined_primary_key":[],
      "default_cursor_field":[]},
     "sync_mode":"full_refresh","cursor_field":[]},
    {"stream":{"name":"flaky_inc","namespace":"dev",
      "json_schema":{"properties":{
        "event_id":{"type":"integer"},"user_id":{"type":"integer"},
        "etype":{"type":"string"},"cents":{"type":"integer"}}},
      "source_defined_primary_key":[["event_id"]],
      "default_cursor_field":["cents"]},
     "sync_mode":"incremental","cursor_field":[]}]}"""

  private def record(ns: String, name: String, data: String): String =
    s"""{"type":"RECORD","record":{"stream":"$name","namespace":"$ns","data":$data}}"""
  private def streamState(ns: String, name: String, state: String): String =
    s"""{"type":"STATE","state":{"type":"STREAM","stream":{"stream_descriptor":{"name":"$name","namespace":"$ns"},"stream_state":$state}}}"""
  private def streamStatus(ns: String, name: String, status: String): String =
    s"""{"type":"TRACE","trace":{"type":"STREAM_STATUS","stream_status":{"stream_descriptor":{"name":"$name","namespace":"$ns"},"status":"$status"}}}"""
  private def traceError(ns: String, name: String, message: String): String =
    s"""{"type":"TRACE","trace":{"type":"ERROR","error":{"stream_descriptor":{"name":"$name","namespace":"$ns"},"message":"$message"}}}"""

  def s6AirbyteSync(s: SparkSession, d: String): DataFrame = {
    val sink = JdbcSink("jdbc:derby:memory:graft_s6;create=true", DerbyDialect,
      maxWriteConnections = 4)
    Seq("AB_DEV_ORDERS_INC", "AB_DEV_USERS_FULL", "AB_DEV_FLAKY_INC").foreach { t =>
      try sink.withConnection(sink.exec(_, s"""DROP TABLE "$t""""))
      catch { case _: java.sql.SQLException => () }
    }

    // quantize IN SPARK with the house floor(x*100 + 0.5) rule, then collect
    // integer-only payloads — no float rendering can diverge from the oracle
    // FIXED-COUNT sample (600 smallest 1/17 ids): the driver-side line
    // builder + Derby ingest cost the same at every SF (r15 verdict)
    val ev = Tables.events(s, d).filter(col("event_id") % 17 === 0)
      .select(col("event_id"), col("user_id"), col("event_type"),
        floor(col("value") * 100 + 0.5).cast(LongType).as("cents"))
      .orderBy(col("event_id")).limit(600)
    val sample = ev.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
      .sortBy(_._1)
    val s0 = sample.filter(_._1 % 3 == 0) // orders_inc
    val s1 = sample.filter(_._1 % 3 == 1) // flaky_inc
    val users = Tables.customer(s, d).filter(col("c_custkey") % 11 === 0)
      .select(col("c_custkey"), col("c_name"),
        floor(col("c_acctbal") * 100 + 0.5).cast(LongType).as("cents"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).sortBy(_._1)

    def evJson(t: (Long, Long, String, Long), centsShift: Long = 0L): String =
      s"""{"event_id":${t._1},"user_id":${t._2},"etype":"${t._3}","cents":${t._4 + centsShift}}"""

    // pre-seed a junk generation under users_full: ReplaceTable must erase it
    {
      import s.implicits._
      val junk = Seq((-1L, "junk", -1L)).toDF("k", "name", "cents")
      val spec = sink.specFor(junk, "ab_dev_users_full")
      sink.ensureTable(spec)
      sink.append(junk, spec.name)
    }

    val ordersChunk1 = s0
    val ordersChunk2 = s0.filter(_._1 % 5 == 0) // pk updates: +100000 cents
    val flakyChunk1 = s1.filter(_._1 % 2 == 0)
    val flakyChunk2 = s1.filterNot(_._1 % 2 == 0) // after the error: ignored
    // the state lines below take .max of these cells; an empty cell means
    // the driver's regenerated testdata broke the %17/%3/%5/%2 sampling
    // assumption — fail with the diagnosis, not an opaque empty.max (the
    // oracle's MAX would go NULL there, so no output shape matches anyway)
    require(ordersChunk2.nonEmpty && flakyChunk1.nonEmpty && flakyChunk2.nonEmpty,
      s"s6 fixture sampling cells empty (|s0|=${s0.length} |s1|=${s1.length} " +
        s"|orders2|=${ordersChunk2.length} |flaky1|=${flakyChunk1.length}): " +
        "testdata event_id distribution no longer covers %17/%3/%5/%2")
    val lines = Vector.newBuilder[String]
    lines += "info connector booting" // bare passthrough line (main.go:194-213)
    lines += streamStatus("dev", "users_full", "STARTED")
    users.foreach(u => lines += record("dev", "users_full",
      s"""{"k":${u._1},"name":"${u._2}","cents":${u._3}}"""))
    lines += streamStatus("dev", "users_full", "COMPLETE")
    lines += streamStatus("dev", "orders_inc", "STARTED")
    ordersChunk1.foreach(t => lines += record("dev", "orders_inc", evJson(t)))
    val st1 = streamState("dev", "orders_inc", s"""{"c":${s0.map(_._1).max}}""")
    lines += st1
    lines += st1 // consecutive duplicate STATE line: suppressed (read.go:246-249)
    ordersChunk2.foreach(t => lines += record("dev", "orders_inc", evJson(t, 100000L)))
    lines += streamState("dev", "orders_inc",
      s"""{"c":${ordersChunk2.map(_._1).max}}""")
    lines += streamStatus("dev", "orders_inc", "COMPLETE")
    lines += streamStatus("dev", "flaky_inc", "STARTED")
    flakyChunk1.foreach(t => lines += record("dev", "flaky_inc", evJson(t)))
    lines += streamState("dev", "flaky_inc", s"""{"c":${flakyChunk1.map(_._1).max}}""")
    lines += traceError("dev", "flaky_inc", "connector exploded")
    flakyChunk2.foreach(t => lines += record("dev", "flaky_inc", evJson(t)))
    // post-error STATE: must NOT be saved (read.go:311-314)
    lines += streamState("dev", "flaky_inc", s"""{"c":${s1.map(_._1).max}}""")
    lines += streamStatus("dev", "flaky_inc", "INCOMPLETE")
    lines += """{"type":"CONTROL","control":{"type":"CONNECTOR_CONFIG"}}"""

    val engine = new Engine(s, sink)
    val runner = new AirbyteRunner(engine, Airbyte.parseCatalog(CatalogJson),
      AirbyteRunner.Config(tableNamePrefix = "ab_${SOURCE_NAMESPACE}_",
        initialState = """{"dev.orders_inc":{"c":0}}""", packageName = "airbyte/source-fixture"))
    val result = runner.run(lines.result().iterator)

    def readBack(table: String) =
      s.read.jdbc(sink.url, s"\"$table\"", new java.util.Properties())
    val ordersRows = readBack("AB_DEV_ORDERS_INC").select(lit("orders").as("src"),
      col("EVENT_ID").as("k"), col("CENTS").as("cents"), col("ETYPE").as("tag"))
    val usersRows = readBack("AB_DEV_USERS_FULL").select(lit("users").as("src"),
      col("K").as("k"), col("CENTS").as("cents"), col("NAME").as("tag"))
    val flakyRows = readBack("AB_DEV_FLAKY_INC").select(lit("flaky").as("src"),
      col("EVENT_ID").as("k"), col("CENTS").as("cents"), col("ETYPE").as("tag"))

    val metaSchema = StructType(Seq(
      StructField("src", StringType), StructField("k", LongType),
      StructField("cents", LongType, nullable = true), StructField("tag", StringType)))
    import scala.jdk.CollectionConverters._
    val metaRows: Seq[Row] =
      result.streams.map(sr =>
        Row("status", sr.events, null, s"${sr.stream}=${sr.status}")) ++
      result.states.map { case (k, v) => Row("state", null, null, s"$k=$v") } :+
      Row("run", null, null, result.status)
    val meta = s.createDataFrame(metaRows.asJava, metaSchema)
    ordersRows.unionByName(usersRows).unionByName(flakyRows).unionByName(meta)
  }

  private val s6Oracle = """
    WITH smp AS (
      SELECT event_id, user_id, event_type,
             CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
      FROM events WHERE event_id % 17 = 0
      ORDER BY event_id LIMIT 600),
    s0 AS (SELECT * FROM smp WHERE event_id % 3 = 0),
    s1 AS (SELECT * FROM smp WHERE event_id % 3 = 1),
    u AS (SELECT c_custkey AS k, c_name AS name,
                 CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) AS cents
          FROM customer WHERE c_custkey % 11 = 0)
    SELECT 'orders' AS src, event_id AS k,
           cents + CASE WHEN event_id % 5 = 0 THEN 100000 ELSE 0 END AS cents,
           event_type AS tag
    FROM s0
    UNION ALL SELECT 'users', k, cents, name FROM u
    UNION ALL SELECT 'flaky', event_id, cents, event_type
              FROM s1 WHERE event_id % 2 = 0
    UNION ALL SELECT 'status',
      (SELECT COUNT(*) FROM s0) + (SELECT COUNT(*) FROM s0 WHERE event_id % 5 = 0),
      NULL, 'dev.orders_inc=SUCCESS'
    UNION ALL SELECT 'status', (SELECT COUNT(*) FROM u), NULL,
      'dev.users_full=SUCCESS'
    UNION ALL SELECT 'status', (SELECT COUNT(*) FROM s1 WHERE event_id % 2 = 0),
      NULL, 'dev.flaky_inc=PARTIAL'
    UNION ALL SELECT 'state', NULL, NULL,
      'dev.orders_inc={"c":' || (SELECT MAX(event_id) FROM s0 WHERE event_id % 5 = 0) || '}'
    UNION ALL SELECT 'state', NULL, NULL,
      'dev.flaky_inc={"c":' || (SELECT MAX(event_id) FROM s1 WHERE event_id % 2 = 0) || '}'
    UNION ALL SELECT 'run', NULL, NULL, 'PARTIAL'"""

  // ======================================================================
  // S8 — the Firebase connector data plane (connectors/firebase/firebase.go)
  // LIVE end-to-end: graft.sources.Firebase plays the connector over a
  // deterministic Firestore/Auth fixture derived from part/lineitem/customer,
  // its protocol lines run through the SAME AirbyteRunner as s6, and the
  // output is the union of the landed warehouse tables + the runner rollup —
  // all oracle-recomputed from parquet. Exercised semantics: ID-ordered
  // pagination (batchSize=7 forces ~40 page restarts), LatLng→dotted-key
  // flattening (landed as location_latitude/location_longitude), nested-map
  // recursion (meta_size), subcollection JSON-array-string embedding with
  // Go's sorted-key marshal, the auth-user mapping with the millis/1000
  // seconds-precision timestamp quirk (landed as Derby TIMESTAMPs via the
  // engine's sniff), nil provider slice → SQL NULL, and the final LEGACY
  // state saved under _LEGACY_STATE.

  private val S8NowMs = 1754003456789L

  def s8FirebaseSync(s: SparkSession, d: String): DataFrame = {
    import graft.sources.Firebase
    val sink = JdbcSink("jdbc:derby:memory:graft_s8;create=true", DerbyDialect,
      maxWriteConnections = 4)
    Seq("FB_FIRESTORE_PRODUCTS", "FB_AUTH_USERS").foreach { t =>
      try sink.withConnection(sink.exec(_, s"""DROP TABLE "$t""""))
      catch { case _: java.sql.SQLException => () }
    }

    // FIXED-COUNT caps (the r15 b8/b13 precedent): fixture cost is constant
    // at every SF. Quantization happens IN SPARK with the house floor rule.
    val parts = Tables.part(s, d).filter(col("p_partkey") % 7 === 0)
      .select(col("p_partkey"), col("p_name"), col("p_brand"), col("p_type"),
        col("p_size").cast(LongType).as("psize"),
        floor(col("p_retailprice") * 100 + 0.5).cast(LongType).as("cents"))
      .orderBy(col("p_partkey")).limit(294)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getString(3),
        r.getLong(4), r.getLong(5))).sortBy(_._1)
    val partKeys = parts.map(_._1)
    val ships = Tables.lineitem(s, d)
      .filter(col("l_partkey").isin(partKeys.map(Long.box): _*))
      .select(col("l_partkey"), col("l_orderkey"), col("l_linenumber").cast(LongType),
        floor(col("l_quantity") * 100 + 0.5).cast(LongType).as("qty_q"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .groupBy(_._1)
      .view.mapValues(_.sortBy(t => (t._2, t._3)).toSeq).toMap
    val users = Tables.customer(s, d).filter(col("c_custkey") % 11 === 0)
      .select(col("c_custkey"), col("c_name"))
      .orderBy(col("c_custkey")).limit(400)
      .collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    require(parts.nonEmpty && users.nonEmpty,
      s"s8 fixture sampling empty (|parts|=${parts.length} |users|=${users.length}): " +
        "testdata key distribution no longer covers %7/%11")

    val docs = parts.map { case (pk, name, brand, ptype, psize, cents) =>
      Firebase.Doc(
        id = f"p$pk%07d",
        data = Map(
          "name" -> name, "brand" -> brand, "ptype" -> ptype,
          "retail_cents" -> cents,
          "location" -> Firebase.LatLng((pk % 180 - 90) + 0.25, (pk % 360 - 180) + 0.5),
          "meta" -> Map("size" -> psize)),
        subcollections = Seq("shipments" ->
          ships.getOrElse(pk, Seq.empty).map { case (_, ok, ln, q) =>
            Map[String, Any]("line" -> ln, "order" -> ok, "qty_q" -> q)
          }))
    }
    val authUsers = users.map { case (ck, name) =>
      val created = 1500000000000L + ck * 3600000L + ck % 997
      val login = created + ck * 720000L + 500
      Firebase.AuthUser(
        uid = s"u$ck", email = s"c$ck@example.test", displayName = name,
        phoneNumber = "+1-555-" + f"$ck%06d",
        photoUrl = s"https://img.example.test/u$ck",
        providerIds = (ck % 3) match {
          case 0 => Seq("password", "google.com")
          case 1 => Seq("password")
          case _ => null
        },
        disabled = ck % 5 == 0,
        creationTimestampMs = created,
        lastLogInTimestampMs = login,
        lastRefreshTimestampMs = login + (ck % 24) * 60000L + 999)
    }
    val store = new Firebase.FixtureStore(Seq("products" -> docs.toSeq), authUsers.toSeq)

    val engine = new Engine(s, sink)
    val catalog = Airbyte.parseCatalog(Firebase.configuredCatalogJson(store))
    val runner = new AirbyteRunner(engine, catalog,
      AirbyteRunner.Config(tableNamePrefix = "fb_${SOURCE_NAMESPACE}_",
        packageName = "airbyte/source-firebase"))
    val result = runner.run(
      Firebase.read(store, catalog, S8NowMs, batchSize = 7))

    def readBack(table: String) =
      s.read.jdbc(sink.url, s"\"$table\"", new java.util.Properties())
    val prod = readBack("FB_FIRESTORE_PRODUCTS")
    val usr = readBack("FB_AUTH_USERS")
    val prodRows = prod.select(lit("prod").as("src"), col("ID").as("k"),
      col("NAME").as("s1"), col("BRAND").as("s2"),
      col("RETAIL_CENTS").as("n1"), col("META_SIZE").as("n2"),
      col("SHIPMENTS").as("js"))
    val geoRows = prod.select(lit("geo").as("src"), col("ID").as("k"),
      col("PTYPE").as("s1"), lit(null).cast(StringType).as("s2"),
      floor(col("LOCATION_LATITUDE") * 100 + 0.5).cast(LongType).as("n1"),
      floor(col("LOCATION_LONGITUDE") * 100 + 0.5).cast(LongType).as("n2"),
      lit(null).cast(StringType).as("js"))
    val userRows = usr.select(lit("user").as("src"), col("UID").as("k"),
      col("EMAIL").as("s1"), col("NAME").as("s2"),
      when(col("DISABLED"), 1L).otherwise(0L).as("n1"),
      unix_timestamp(col("CREATED_AT")).as("n2"),
      col("SIGN_IN_METHODS").as("js"))
    val userMetaRows = usr.select(lit("user_meta").as("src"), col("UID").as("k"),
      col("PHONE").as("s1"), col("PHOTO_URL").as("s2"),
      unix_timestamp(col("LAST_LOGIN")).as("n1"),
      unix_timestamp(col("LAST_REFRESH")).as("n2"),
      lit(null).cast(StringType).as("js"))

    val metaSchema = StructType(Seq(
      StructField("src", StringType), StructField("k", StringType),
      StructField("s1", StringType, nullable = true),
      StructField("s2", StringType, nullable = true),
      StructField("n1", LongType, nullable = true),
      StructField("n2", LongType, nullable = true),
      StructField("js", StringType, nullable = true)))
    import scala.jdk.CollectionConverters._
    val metaRows: Seq[Row] =
      result.streams.map(sr =>
        Row("status", sr.stream, sr.status, null, sr.events, null, null)) ++
      result.states.map { case (k, v) => Row("state", k, null, null, null, null, v) } :+
      Row("run", result.status, null, null, null, null, null)
    val meta = s.createDataFrame(metaRows.asJava, metaSchema)
    prodRows.unionByName(geoRows).unionByName(userRows)
      .unionByName(userMetaRows).unionByName(meta)
  }

  private val s8Oracle = s"""
    WITH p AS (
      SELECT p_partkey AS pk, p_name AS name, p_brand AS brand, p_type AS ptype,
             CAST(p_size AS BIGINT) AS psize,
             CAST(floor(p_retailprice * 100 + 0.5) AS BIGINT) AS cents
      FROM part WHERE p_partkey % 7 = 0 ORDER BY p_partkey LIMIT 294),
    ship AS (
      SELECT l_partkey AS pk,
             '[' || string_agg('{"line":' || CAST(l_linenumber AS BIGINT)
               || ',"order":' || l_orderkey || ',"qty_q":'
               || CAST(floor(l_quantity * 100 + 0.5) AS BIGINT) || '}',
               ',' ORDER BY l_orderkey, l_linenumber) || ']' AS js
      FROM lineitem JOIN p ON p.pk = l_partkey GROUP BY l_partkey),
    u AS (
      SELECT c_custkey AS ck, c_name AS name,
             1500000000000 + c_custkey * 3600000 + c_custkey % 997 AS created_ms,
             1500000000000 + c_custkey * 3600000 + c_custkey % 997
               + c_custkey * 720000 + 500 AS login_ms
      FROM customer WHERE c_custkey % 11 = 0 ORDER BY c_custkey LIMIT 400)
    SELECT 'prod' AS src, 'p' || lpad(CAST(pk AS VARCHAR), 7, '0') AS k,
           name AS s1, brand AS s2, cents AS n1, psize AS n2,
           COALESCE(js, '[]') AS js
    FROM p LEFT JOIN ship USING (pk)
    UNION ALL
    SELECT 'geo', 'p' || lpad(CAST(pk AS VARCHAR), 7, '0'), ptype, NULL,
           (pk % 180 - 90) * 100 + 25, (pk % 360 - 180) * 100 + 50, NULL
    FROM p
    UNION ALL
    SELECT 'user', 'u' || CAST(ck AS VARCHAR),
           'c' || CAST(ck AS VARCHAR) || '@example.test', name,
           CASE WHEN ck % 5 = 0 THEN 1 ELSE 0 END,
           created_ms // 1000,
           CASE CAST(ck % 3 AS INTEGER)
             WHEN 0 THEN '["password","google.com"]'
             WHEN 1 THEN '["password"]' ELSE NULL END
    FROM u
    UNION ALL
    SELECT 'user_meta', 'u' || CAST(ck AS VARCHAR),
           '+1-555-' || lpad(CAST(ck AS VARCHAR), 6, '0'),
           'https://img.example.test/u' || CAST(ck AS VARCHAR),
           login_ms // 1000,
           (login_ms + (ck % 24) * 60000 + 999) // 1000, NULL
    FROM u
    UNION ALL
    SELECT 'status', 'firestore.products', 'SUCCESS', NULL,
           (SELECT COUNT(*) FROM p), NULL, NULL
    UNION ALL
    SELECT 'status', 'auth.users', 'SUCCESS', NULL,
           (SELECT COUNT(*) FROM u), NULL, NULL
    UNION ALL
    SELECT 'state', '_LEGACY_STATE', NULL, NULL, NULL, NULL,
           '{"timestamp":$S8NowMs}'
    UNION ALL
    SELECT 'run', 'SUCCESS', NULL, NULL, NULL, NULL, NULL"""

  val qs: Map[String, Q] = Map(
    "s6_airbyte_sync" -> Q(s6AirbyteSync, Some(s6Oracle)),
    "s8_firebase_sync" -> Q(s8FirebaseSync, Some(s8Oracle)))
}
