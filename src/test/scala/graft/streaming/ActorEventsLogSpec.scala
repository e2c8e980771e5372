package graft.streaming

import org.scalatest.funsuite.AnyFunSuite

/** Live JDBC events log on embedded Derby + the ClickHouse SQL-text twin
  * (eventslog/events_log.go GetEvents semantics). */
class ActorEventsLogSpec extends AnyFunSuite {

  private def log(db: String) =
    new JdbcEventsLog(s"jdbc:derby:memory:evlog_$db;create=true", flushEvery = 3)

  test("post buffers until flushEvery, then a batched flush lands every row") {
    val l = log("buf")
    l.post(ActorEvent("bulker_batch", "destA", "info", 1000L, """{"rows":10}"""))
    l.post(ActorEvent("bulker_batch", "destA", "info", 2000L, """{"rows":20}"""))
    // third post crosses flushEvery=3 → auto-flush
    l.post(ActorEvent("bulker_batch", "destA", "error", 3000L, """{"err":"x"}"""))
    val all = l.getEvents("bulker_batch", "destA")
    assert(all.length == 3)
    assert(all.map(_.timestampMs) == Seq(3000L, 2000L, 1000L)) // newest first
  }

  test("getEvents filters by type, actor, level, and time range; limit caps") {
    val l = log("filt")
    for (i <- 1 to 10)
      l.post(ActorEvent("bulker_batch", "destA",
        if (i % 3 == 0) "error" else "info", i * 1000L, s"""{"n":$i}"""))
    l.post(ActorEvent("incoming", "destA", "info", 99000L, "{}"))
    l.post(ActorEvent("bulker_batch", "destB", "info", 98000L, "{}"))
    assert(l.getEvents("bulker_batch", "destA").length == 10) // type+actor scoped
    assert(l.getEvents("bulker_batch", "destA", level = Some("error"))
      .map(_.timestampMs) == Seq(9000L, 6000L, 3000L))
    assert(l.getEvents("bulker_batch", "destA",
      startMs = Some(4000L), endMs = Some(7000L)).map(_.timestampMs) ==
      Seq(7000L, 6000L, 5000L, 4000L))
    assert(l.getEvents("bulker_batch", "destA", limit = 2)
      .map(_.timestampMs) == Seq(10000L, 9000L))
    assert(l.getEvents("incoming", "destB").isEmpty)
  }

  test("explicit flush is idempotent and read-your-writes holds") {
    val l = log("flush")
    l.post(ActorEvent("bulker_stream", "d", "info", 1L, "{}"))
    l.flush(); l.flush()
    assert(l.getEvents("bulker_stream", "d").length == 1)
  }

  test("StreamEventsLog: postEvent is ONE XADD to mapLevel[0]; only postAsync fans out") {
    var t = 1000L
    val l = new StreamEventsLog(maxSize = 10, clock = () => t)
    l.postEvent(ActorEvent("bulker_stream", "a1", "info", t, "{\"n\":1}"))
    t = 1001L
    // redis_events_log.go:132 — PostEvent XADDs to mapLevel(level)[0] only,
    // so an error posted synchronously never appears in the "all" stream
    l.postEvent(ActorEvent("bulker_stream", "a1", "error", t, "{\"n\":2}"))
    assert(l.getEvents("bulker_stream", "a1").map(_._2.content) ==
      Seq("{\"n\":1}"))
    assert(l.getEvents("bulker_stream", "a1", level = "error")
      .map(_._2.content) == Seq("{\"n\":2}"))
    // PostAsync (redis_events_log.go:112) is the fan-out path: error → both
    t = 1002L
    l.postAsync(ActorEvent("bulker_stream", "a1", "error", t, "{\"n\":3}"))
    assert(l.getEvents("bulker_stream", "a1").map(_._2.content) ==
      Seq("{\"n\":3}", "{\"n\":1}"))
    assert(l.getEvents("bulker_stream", "a1", level = "error")
      .map(_._2.content) == Seq("{\"n\":3}", "{\"n\":2}"))
  }

  test("StreamEventsLog: ids are <ms>-<seq>, monotone within one millisecond") {
    val l = new StreamEventsLog(maxSize = 10, clock = () => 5000L)
    val ids = (1 to 3).map(i =>
      l.postEvent(ActorEvent("t", "a", "info", 5000L, s"$i")))
    assert(ids == Seq("5000-0", "5000-1", "5000-2"))
  }

  test("StreamEventsLog: MAXLEN trim keeps the newest maxSize entries") {
    var t = 0L
    val l = new StreamEventsLog(maxSize = 3, clock = () => t)
    (1 to 5).foreach { i => t = i * 100L
      l.postEvent(ActorEvent("t", "a", "info", t, s"e$i")) }
    assert(l.getEvents("t", "a", limit = 100).map(_._2.content) ==
      Seq("e5", "e4", "e3"))
  }

  test("StreamEventsLog: postAsync buffers, sheds past maxSize, flush appends once") {
    var t = 0L
    val l = new StreamEventsLog(maxSize = 3, clock = () => t)
    (1 to 5).foreach { i => t = i * 100L
      l.postAsync(ActorEvent("t", "a", "info", t, s"e$i")) }
    assert(l.getEvents("t", "a").map(_._2.content) == Seq("e3", "e2", "e1"),
      "buffer sheds e4/e5 (best-effort telemetry), keeps the first three")
    l.flush() // second flush: nothing buffered, no duplicates
    assert(l.getEvents("t", "a").length == 3)
  }

  test("StreamEventsLog: time bounds are inclusive and limit caps the page") {
    var t = 0L
    val l = new StreamEventsLog(maxSize = 10, clock = () => t)
    (1 to 5).foreach { i => t = i * 100L
      l.postEvent(ActorEvent("t", "a", "info", t, s"e$i")) }
    assert(l.getEvents("t", "a", startMs = Some(200L), endMs = Some(400L))
      .map(_._2.content) == Seq("e4", "e3", "e2"))
    assert(l.getEvents("t", "a", limit = 2).map(_._2.content) == Seq("e5", "e4"))
    assert(l.getEvents("t", "other").isEmpty)
  }

  /** Execute the CH statement set LIVE: a mechanical dialect substitution
    * (CH types → Derby types, LIMIT → FETCH FIRST, async-insert settings and
    * MergeTree clauses dropped) leaves the statement SHAPE — column order,
    * filter predicates, bind slots, ORDER BY timestamp DESC, page cap —
    * untouched, and that shape must read back exactly what the native
    * JdbcEventsLog read returns on the same event set, across the whole
    * (level × start × end × limit) filter matrix. */
  test("ClickHouse twin executes live (Derby-ized) and agrees with the JDBC read matrix") {
    def derbyize(sql: String): String = sql
      .replace("IF NOT EXISTS ", "")
      .replace("DateTime64(3)", "TIMESTAMP")
      .replace("LowCardinality(String)", "VARCHAR(64)")
      .replace("String", "VARCHAR(4096)")
      .replaceAll("(?s)\\) ENGINE = MergeTree\\(\\).*", ")")
      .replaceAll(" SETTINGS [^ ]*=[0-9]+(, [^ ]*=[0-9]+)*", "")
      .replaceAll("LIMIT (\\d+)", "FETCH FIRST $1 ROWS ONLY")
    val url = "jdbc:derby:memory:evlog_chtwin;create=true"
    val c = java.sql.DriverManager.getConnection(url)
    // distinct timestamps: ORDER BY ts DESC must be a total order so the
    // two backends can be compared as SEQUENCES, not sets
    val events = (1 to 12).map(i => ActorEvent("bulker_batch", "destA",
      if (i % 3 == 0) "error" else "info", i * 1000L, s"""{"n":$i}"""))
    try {
      val st = c.createStatement()
      st.execute(derbyize(ChEventsLogSql.ddl)); st.close()
      val ins = c.prepareStatement(derbyize(ChEventsLogSql.insert))
      events.foreach { e =>
        ins.setTimestamp(1, new java.sql.Timestamp(e.timestampMs))
        ins.setString(2, e.actorId); ins.setString(3, e.eventType)
        ins.setString(4, e.level); ins.setString(5, e.content); ins.addBatch()
      }
      ins.executeBatch(); ins.close()

      def chRead(level: Option[String], startMs: Option[Long],
                 endMs: Option[Long], limit: Int): Seq[ActorEvent] = {
        val ps = c.prepareStatement(derbyize(ChEventsLogSql.select(
          level.isDefined, startMs.isDefined, endMs.isDefined, limit)))
        var i = 0
        def next = { i += 1; i }
        ps.setString(next, "bulker_batch"); ps.setString(next, "destA")
        level.foreach(ps.setString(next, _))
        startMs.foreach(m => ps.setTimestamp(next, new java.sql.Timestamp(m)))
        endMs.foreach(m => ps.setTimestamp(next, new java.sql.Timestamp(m)))
        val rs = ps.executeQuery()
        val out = Seq.newBuilder[ActorEvent]
        while (rs.next()) out += ActorEvent(rs.getString(3), rs.getString(2),
          rs.getString(4), rs.getTimestamp(1).getTime, rs.getString(5))
        ps.close(); out.result()
      }

      val native = log("chtwin_native")
      events.foreach(native.post); native.flush()
      for {
        level <- Seq(None, Some("error"), Some("info"))
        start <- Seq(None, Some(4000L))
        end <- Seq(None, Some(9000L))
        limit <- Seq(100, 2)
      } {
        val ch = chRead(level, start, end, limit)
        val jd = native.getEvents("bulker_batch", "destA", level, start, end, limit)
        assert(ch == jd, s"filter matrix diverged at level=$level start=$start end=$end limit=$limit")
      }
      assert(chRead(None, None, None, 100).map(_.timestampMs) ==
        events.map(_.timestampMs).sorted.reverse, "newest-first total order")
    } finally c.close()
  }

  test("ClickHouse twin: async-insert settings, filter-aligned ORDER BY, TTL") {
    assert(ChEventsLogSql.insert.contains("async_insert=1") &&
      ChEventsLogSql.insert.contains("wait_for_async_insert=0"))
    assert(ChEventsLogSql.ddl.contains("ORDER BY (event_type, actor_id, timestamp)"))
    assert(ChEventsLogSql.ddl.contains("TTL"))
    val s = ChEventsLogSql.select(withLevel = true, withStart = true,
      withEnd = false, limit = 50)
    assert(s.contains("level = ?") && s.contains("timestamp >= ?") &&
      !s.contains("timestamp <= ?") && s.contains("LIMIT 50"))
    assert(s.contains("ORDER BY timestamp DESC"))
  }

  test("StreamEventsLog: a bare-ms beforeId keeps that millisecond's earlier entries") {
    var t = 1000L
    val log = new StreamEventsLog(clock = () => t)
    import graft.streaming.{ActorEvent => AE}
    def ev(n: Int) = AE("incoming", "a", "info", t, s"""{"n":$n}""")
    log.postEvent(ev(1)) // 1000-0
    log.postEvent(ev(2)) // 1000-1
    log.postEvent(ev(3)) // 1000-2
    t = 1001L
    log.postEvent(ev(4)) // 1001-0
    // Redis end-bound semantics: an incomplete id resolves seq to MAX, so
    // the exclusive cursor "(1000" still admits 1000-0..1000-2
    val bare = log.page("incoming", "a", beforeId = Some("1000")).map(_._1)
    assert(bare == Seq("1000-2", "1000-1", "1000-0"))
    // a full id stays strictly exclusive on (ms, seq)
    val full = log.page("incoming", "a", beforeId = Some("1000-1")).map(_._1)
    assert(full == Seq("1000-0"))
  }
}
