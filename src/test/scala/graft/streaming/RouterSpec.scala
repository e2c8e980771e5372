package graft.streaming

import org.apache.spark.sql.{DataFrame, Row}
import graft.SparkSuite

/** Event routing fan-out (B5, topic_manager.go:726-787) and the per-batch
  * events log (B7). */
class RouterSpec extends SparkSuite {

  test("routeBatch slices a batch per routing value") {
    val batch = df("t STRING, id BIGINT", Seq(
      Row("a", 1L), Row("b", 2L), Row("a", 3L), Row(null, 4L)))
    val got = scala.collection.mutable.Map.empty[String, Seq[Long]]
    Router.routeBatch(batch, "t", defaultTable = "dflt") { (table, slice) =>
      got(table) = slice.collect().toSeq.map(_.getLong(0)).sorted
    }
    assert(got.toMap == Map("a" -> Seq(1L, 3L), "b" -> Seq(2L), "dflt" -> Seq(4L)))
  }

  test("routed slices drop the routing column (it lives in the table name)") {
    val batch = df("t STRING, id BIGINT", Seq(Row("a", 1L)))
    var cols: Seq[String] = Nil
    Router.routeBatch(batch, "t", "d") { (_, slice) => cols = slice.columns.toSeq }
    assert(cols == Seq("id"))
  }

  /** Drives [[IngestFilters.predicate]] over one row and returns pass/fail —
    * the matrix mirrors ApplyFilters (ingest/filters.go:38–50). */
  private def admits(opts: IngestFilters.Opts, typ: String, evt: String,
                     host: String): Boolean = {
    import org.apache.spark.sql.functions.col
    df("typ STRING, evt STRING, host STRING", Seq(Row(typ, evt, host)))
      .filter(IngestFilters.predicate(opts, col("typ"), col("evt"), col("host")))
      .count() == 1
  }

  test("IngestFilters matrix mirrors the reference: trim/case, *, newline lists, type-or-event") {
    val none = IngestFilters.Opts()
    // absent options mean match-all
    assert(admits(none, "click", "evt", "anything.io"))
    // events: newline list, trimmed + case-folded, against type OR event
    val ev = IngestFilters.Opts(events = Some(" Click \nSIGNUP"))
    assert(admits(ev, "click", "x", "h"))   // " Click " trims/folds to type
    assert(admits(ev, "CLICK", "x", "h"))   // subject folds too
    assert(admits(ev, "x", "signup", "h"))  // OR-arm: event name matches
    assert(!admits(ev, "view", "evt_view", "h"))
    // a literal-star entry anywhere in the list admits everything
    assert(admits(IngestFilters.Opts(events = Some("nope\n*")), "view", "x", "h"))
    // " * " is NOT the wildcard (the reference tests the raw filter for *)
    assert(!admits(IngestFilters.Opts(events = Some(" * ")), "view", "x", "h"))
    assert(admits(IngestFilters.Opts(events = Some(" * ")), "*", "x", "h"))
  }

  test("IngestFilters hosts: *.domain suffix is non-eager; exact hosts exact; AND with events") {
    val hs = IngestFilters.Opts(hosts = Some("*.example.com\napp.io"))
    assert(admits(hs, "t", "e", "shop.example.com"))
    assert(admits(hs, "t", "e", "a.b.example.com"))
    assert(!admits(hs, "t", "e", "example.com")) // bare apex: non-eager miss
    assert(admits(hs, "t", "e", "app.io"))
    assert(!admits(hs, "t", "e", "App.IO")) // domain rules are NOT case-folded
    assert(!admits(hs, "t", "e", "evil-app.io"))
    // hosts AND events must BOTH pass
    val both = IngestFilters.Opts(events = Some("click"), hosts = Some("*.example.com"))
    assert(admits(both, "click", "e", "shop.example.com"))
    assert(!admits(both, "click", "e", "other.io"))
    assert(!admits(both, "view", "e", "shop.example.com"))
    // null subjects behave like the reference's empty-string GetS
    assert(admits(IngestFilters.Opts(events = Some("\n")), null, null, "h") ==
      admits(IngestFilters.Opts(events = Some("\n")), "", "", "h"))
  }

  test("routeLinks: one batch, every link gets exactly its filter's rows") {
    val batch = df("typ STRING, evt STRING, host STRING, id BIGINT", Seq(
      Row("click", "evt_click", "shop.example.com", 1L),
      Row("view", "evt_view", "example.com", 2L),
      Row("purchase", "evt_purchase", "app.io", 3L)))
    val links = Seq(
      "all" -> IngestFilters.Opts(),
      "clicks" -> IngestFilters.Opts(events = Some("click\nevt_purchase")),
      "apex" -> IngestFilters.Opts(hosts = Some("*.example.com")))
    val got = scala.collection.mutable.Map.empty[String, Seq[Long]]
    Router.routeLinks(batch, links, "typ", "evt", "host") { (dest, slice) =>
      got(dest) = slice.select("id").collect().toSeq.map(_.getLong(0)).sorted
    }
    assert(got.toMap == Map("all" -> Seq(1L, 2L, 3L),
      "clicks" -> Seq(1L, 3L), "apex" -> Seq(1L)))
  }

  test("events log records ok and failed batches with counts (B7)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_el_").toString
    val log = EventsLog(s"$dir/log")
    log.post(spark, LoadState("s1", "t", 0L, "ok", 10L, "", 1000L))
    log.post(spark, LoadState("s1", "t", 1L, "failed", 5L, "boom", 2000L))
    val back = log.read(spark).get
    assert(canon(back.select("batchId", "status", "rows", "error")) == Seq(
      Seq("0", "ok", "10", "∅").map(_.replace("∅", "")),
      Seq("1", "failed", "5", "boom")))
  }

  test("the micro-batch runner posts per-batch states (B7 wiring)") {
    val base = java.nio.file.Files.createTempDirectory("graft_mb3_").toString
    val w = new java.io.File(s"$base/in"); w.mkdirs()
    val pw = new java.io.PrintWriter(new java.io.File(w, "001.json"))
    try pw.println("""{"id":1}""") finally pw.close()
    val pw2 = new java.io.PrintWriter(new java.io.File(w, "002.json"))
    try pw2.println("""{"id":666}""") finally pw2.close()
    val log = EventsLog(s"$base/log")
    MicroBatch.runFileStream(spark, s"$base/in",
      org.apache.spark.sql.types.StructType.fromDDL("id BIGINT"),
      s"$base/ckpt", RetryQueue(s"$base/retry", s"$base/dlq"),
      clock = () => 42L, eventsLog = Some(log), streamId = "s", table = "t") { dfIn =>
      if (dfIn.collect().exists(_.getLong(0) == 666L)) throw new RuntimeException("poison")
    }
    val states = log.read(spark).get
    assert(states.count() == 2)
    assert(canon(states.select("status")).flatten.sorted == Seq("failed", "ok"))
  }
}
