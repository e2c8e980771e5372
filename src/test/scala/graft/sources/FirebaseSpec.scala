package graft.sources

import graft.{Engine, SparkSuite}
import graft.sink.JdbcSink
import graft.sql.DerbyDialect

/** Firebase connector data plane (connectors/firebase/firebase.go):
  * spec/check/discover surface, the pagination loop's restart semantics,
  * convertSpecificTypes, the auth-user mapping, the timestamp quirk, and
  * the read stream's protocol shape through the shared runner. */
class FirebaseSpec extends SparkSuite {

  import Firebase._

  private def doc(id: String, data: Map[String, Any]) = Doc(id, data)

  // --- spec / check / discover through the shared sidecar loop ---

  test("spec + check + discover land via runDiscover (SUCCEEDED normalizes)") {
    val store = new FixtureStore(
      Seq("b_col" -> Seq(doc("d1", Map("x" -> 1L))), "a_col" -> Seq.empty),
      Seq(AuthUser("u1", "e", "n", "p", "ph", Seq("password"), disabled = false,
        1500000000000L, 1500000000000L, 1500000000000L)))
    val res = Airbyte.runDiscover(Iterator(spec(), check(store), discover(store)))
    assert(res.status == "SUCCESS")
    assert(res.spec.exists(_.contains("\"serviceAccountKey\"")))
    // sourceRunner.go:76-81 writes SUCCEEDED; the sidecar normalizes
    assert(res.connectionStatus.contains(("SUCCESS", "")))
    // the raw CATALOG payload is the unconfigured {"streams":[{name,...}]}
    // form; the orchestrator wraps each entry under "stream" before the
    // sidecar sees it — configuredCatalogJson is that wrapped twin
    assert(res.catalog.get.contains("\"a_col\"") && res.catalog.get.contains("\"users\""))
    val cat = Airbyte.parseCatalog(configuredCatalogJson(store))
    // collections in ID order, users/auth appended LAST (firebase.go:159-168)
    assert(cat.map(_.key) == Seq("firestore.a_col", "firestore.b_col", "auth.users"))
    assert(cat.forall(_.schema.isEmpty)) // empty json_schema: engine infers
    assert(cat.find(_.name == "b_col").get.primaryKeys == Seq("id"))
    assert(cat.find(_.name == "users").get.primaryKeys == Seq("uid"))
  }

  // --- pagination (firebase.go:277-356) ---

  /** instrumented store recording every page() call */
  private final class CountingStore(docs: Seq[Doc]) extends Store {
    val underlying = new FixtureStore(Seq("c" -> docs), Seq.empty)
    var calls: List[(Option[String], Int)] = Nil
    def collectionIds = underlying.collectionIds
    def hasCollection(id: String) = underlying.hasCollection(id)
    def page(collection: String, startAfter: Option[String], limit: Int) = {
      calls :+= (startAfter, limit)
      underlying.page(collection, startAfter, limit)
    }
    def users = Seq.empty
  }

  private def readRecords(store: Store, batchSize: Int): Seq[String] = {
    val cat = Airbyte.parseCatalog(configuredCatalogJson(store))
      .filter(_.namespace == "firestore")
    read(store, cat, nowMs = 1000L, batchSize = batchSize).toList
      .filter(_.contains("\"RECORD\""))
  }

  test("pagination restarts after each FULL page; partial page stops") {
    val store = new CountingStore((1 to 7).map(i => doc(s"d$i", Map("i" -> i.toLong))))
    val recs = readRecords(store, batchSize = 3)
    assert(recs.size == 7)
    // 3 pages: fresh, after d3, after d6 (which returns 1 < batchSize → stop)
    assert(store.calls == List((None, 3), (Some("d3"), 3), (Some("d6"), 3)))
  }

  test("a collection sized an exact multiple of batchSize issues one extra empty page") {
    val store = new CountingStore((1 to 6).map(i => doc(s"d$i", Map("i" -> i.toLong))))
    val recs = readRecords(store, batchSize = 3)
    assert(recs.size == 6)
    assert(store.calls == List((None, 3), (Some("d3"), 3), (Some("d6"), 3)))
  }

  test("a nil-data doc is skipped but still advances the cursor and the page count") {
    // d2 has nil data: no record, but it closes page 1 (firebase.go:297-322
    // sets lastDoc/loaded before the nil check)
    val docs = Seq(doc("d1", Map("i" -> 1L)), Doc("d2", null), doc("d3", Map("i" -> 3L)))
    val store = new CountingStore(docs)
    val recs = readRecords(store, batchSize = 2)
    assert(recs.size == 2)
    assert(recs.forall(r => r.contains("\"d1\"") || r.contains("\"d3\"")))
    assert(store.calls == List((None, 2), (Some("d2"), 2)))
  }

  test("a missing collection aborts the read with the reference's message") {
    val store = new FixtureStore(Seq("real" -> Seq.empty), Seq.empty)
    val cat = Airbyte.parseCatalog(
      """{"streams":[{"stream":{"name":"ghost","namespace":"firestore",
        "json_schema":{},"source_defined_primary_key":[["id"]]},
        "sync_mode":"full_refresh"}]}""")
    val ex = intercept[IllegalStateException] {
      read(store, cat, nowMs = 0L).toList
    }
    assert(ex.getMessage == "collection [ghost] doesn't exist in Firestore")
  }

  // --- convertSpecificTypes (firebase.go:383-399) ---

  test("LatLng flattens to literal-dot keys; nested maps recurse; arrays do not") {
    val in = Map[String, Any](
      "geo" -> LatLng(1.25, -2.5),
      "nest" -> Map[String, Any]("inner" -> LatLng(3.0, 4.0), "keep" -> 7L),
      "arr" -> Seq(Map("lat" -> LatLng(9.0, 9.0))), // untouched: Go has no slice case
      "plain" -> "v")
    val out = convertSpecificTypes(in)
    assert(out("geo.latitude") == 1.25 && out("geo.longitude") == -2.5)
    assert(!out.contains("geo"))
    val nest = out("nest").asInstanceOf[Map[String, Any]]
    assert(nest("inner.latitude") == 3.0 && nest("keep") == 7L && !nest.contains("inner"))
    assert(out("arr") == in("arr"))
    assert(out("plain") == "v")
  }

  // --- the timestamp quirk (firebase.go:18,378-381) ---

  test("unixTimestampToIsoString: millis/1000 truncation, fixed .000000Z layout") {
    // the 999 ms remainder truncates away (Go int64 division toward zero)
    assert(unixTimestampToIsoString(1500000000999L) == "2017-07-14T02:40:00.000000Z")
    assert(unixTimestampToIsoString(1500000000000L) == "2017-07-14T02:40:00.000000Z")
    assert(unixTimestampToIsoString(1L) == "1970-01-01T00:00:00.000000Z")
  }

  // --- record payload shapes ---

  test("users: exact field set, nil providers marshal to JSON null") {
    val store = new FixtureStore(Seq.empty, Seq(
      AuthUser("u1", "a@b.c", "Ann", "+1", "http://p", null, disabled = true,
        1500000000123L, 1500000000456L, 1500000000789L),
      // zero providers via an EMPTY seq: Go appends onto a nil slice, so a
      // provider-less user always marshals null, never "[]"
      AuthUser("u2", "z@b.c", "Zed", "+2", "http://q", Seq.empty, disabled = false,
        1500000000123L, 1500000000456L, 1500000000789L)))
    val cat = Airbyte.parseCatalog(configuredCatalogJson(store))
    val rec = read(store, cat, nowMs = 42L).toList.filter(_.contains("\"RECORD\""))
    assert(rec.size == 2)
    val data2 = Airbyte.mapper.readTree(rec(1)).get("record").get("data")
    assert(data2.get("sign_in_methods").isNull) // empty slice → null too
    val node = Airbyte.mapper.readTree(rec.head).get("record")
    assert(node.get("namespace").asText == "auth" && node.get("stream").asText == "users")
    val data = node.get("data")
    assert(data.get("sign_in_methods").isNull) // nil slice → null (firebase.go:256-260)
    assert(data.get("uid").asText == "u1" && data.get("email").asText == "a@b.c")
    assert(data.get("name").asText == "Ann" && data.get("phone").asText == "+1")
    assert(data.get("photo_url").asText == "http://p")
    assert(data.get("disabled").asBoolean)
    assert(data.get("created_at").asText == "2017-07-14T02:40:00.000000Z")
    assert(data.get("last_login").asText == "2017-07-14T02:40:00.000000Z")
  }

  test("subcollections embed as sorted-key JSON-array STRINGS; empty → []") {
    val d = Doc("p1", Map("n" -> 1L), subcollections = Seq(
      "subs" -> Seq(Map[String, Any]("zeta" -> 1L, "alpha" -> "x")),
      "none" -> Seq.empty))
    val store = new FixtureStore(Seq("c" -> Seq(d)), Seq.empty)
    val cat = Airbyte.parseCatalog(configuredCatalogJson(store))
      .filter(_.namespace == "firestore")
    val rec = read(store, cat, nowMs = 0L).toList.filter(_.contains("\"RECORD\""))
    val data = Airbyte.mapper.readTree(rec.head).get("record").get("data")
    // Go json.Marshal sorts map keys: alpha before zeta
    assert(data.get("subs").isTextual)
    assert(data.get("subs").asText == """[{"alpha":"x","zeta":1}]""")
    assert(data.get("none").asText == "[]") // make([],0) marshals to []
    assert(data.get("id").asText == "p1")   // set after conversion
  }

  test("read emits exactly one final LEGACY state stamped nowMs") {
    val store = new FixtureStore(Seq("c" -> Seq(doc("d1", Map("i" -> 1L)))), Seq.empty)
    val cat = Airbyte.parseCatalog(configuredCatalogJson(store))
    val lines = read(store, cat, nowMs = 777L).toList
    val states = lines.filter(_.contains("\"STATE\""))
    assert(states == List("""{"type":"STATE","state":{"data":{"timestamp":777}}}"""))
    assert(lines.last == states.head) // after ALL streams (firebase.go:233-235)
  }

  // --- end-to-end through the shared runner ---

  test("runner integration: LEGACY state saved, missing collection → FAILED rollup") {
    val sink = JdbcSink("jdbc:derby:memory:graft_fbspec;create=true", DerbyDialect)
    val store = new FixtureStore(
      Seq("c" -> Seq(doc("d1", Map("i" -> 1L, "s" -> "v")))), Seq.empty)
    val engine = new Engine(spark, sink)
    val cat = Airbyte.parseCatalog(configuredCatalogJson(store))
      .filter(_.namespace == "firestore")
    val runner = new AirbyteRunner(engine, cat,
      AirbyteRunner.Config(tableNamePrefix = "fbs_", packageName = "airbyte/source-firebase"))
    val res = runner.run(read(store, cat, nowMs = 99L))
    assert(res.status == "SUCCESS")
    assert(res.states.toMap.get(AirbyteRunner.LegacyStateKey).contains("""{"timestamp":99}"""))

    // a read that dies on a missing collection never reaches the state line,
    // and the pending stream fails (AirbyteRunner.run's recover path)
    val badCat = Airbyte.parseCatalog(
      """{"streams":[{"stream":{"name":"ghost","namespace":"firestore","json_schema":{}},
        "sync_mode":"full_refresh"}]}""")
    val runner2 = new AirbyteRunner(new Engine(spark, sink), badCat,
      AirbyteRunner.Config(tableNamePrefix = "fbs2_", packageName = "airbyte/source-firebase"))
    val res2 = runner2.run(read(store, badCat, nowMs = 99L))
    assert(res2.status == "FAILED")
    assert(res2.states.isEmpty)
  }
}
