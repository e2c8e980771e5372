package graft.streaming

import java.sql.DriverManager

/** The reference's actor-scoped events log (eventslog/events_log.go:43-59):
  * `ActorEvent(eventType, actorId, level, timestamp, content)` posted
  * asynchronously (buffered, flush on size/interval) and queried back by
  * (type, actor, level, time range, limit). Backends there are ClickHouse
  * (buffered async inserts, ch_events_log.go:95-150) and Redis streams;
  * here:
  *
  *   - [[JdbcEventsLog]] — a LIVE backend on any JDBC engine (tested on
  *     embedded Derby): real DDL, batched transactional flushes, filtered
  *     reads. The write path is driver-side control-plane traffic (one row
  *     per batch), so a plain connection is the right tool — no Spark job.
  *   - [[ChEventsLogSql]] — the ClickHouse statement set (async-insert
  *     settings, MergeTree layout keyed the way the reads filter), the
  *     spec-proven SQL-text twin for the backend this environment can't run.
  *
  * [[EventsLog]] (parquet) remains the analytics-facing log: queryable by
  * the same Spark engine that produced it.
  */
final case class ActorEvent(eventType: String, actorId: String, level: String,
                            timestampMs: Long, content: String)

final class JdbcEventsLog(url: String, flushEvery: Int = 100) {

  private val buffer = scala.collection.mutable.ArrayBuffer.empty[ActorEvent]

  locally {
    val c = DriverManager.getConnection(url)
    try {
      val st = c.createStatement()
      try st.execute(
        """CREATE TABLE events_log (
          |  ts_ms BIGINT NOT NULL,
          |  actor_id VARCHAR(256) NOT NULL,
          |  event_type VARCHAR(64) NOT NULL,
          |  level VARCHAR(16) NOT NULL,
          |  content VARCHAR(4096))""".stripMargin)
      catch { case _: java.sql.SQLException => () } // exists
      finally st.close()
    } finally c.close()
  }

  /** Buffered post (the reference's PostAsync): flushes when the buffer
    * reaches `flushEvery`. */
  def post(e: ActorEvent): Unit = synchronized {
    buffer += e
    if (buffer.length >= flushEvery) flush()
  }

  /** One transactional batched insert for everything buffered —
    * ch_events_log.go:95-117's flush, minus the async-insert settings the
    * JDBC engine doesn't need. */
  def flush(): Unit = synchronized {
    if (buffer.nonEmpty) {
      val c = DriverManager.getConnection(url)
      try {
        c.setAutoCommit(false)
        val ps = c.prepareStatement(
          "INSERT INTO events_log (ts_ms, actor_id, event_type, level, content) VALUES (?,?,?,?,?)")
        try {
          buffer.foreach { e =>
            ps.setLong(1, e.timestampMs); ps.setString(2, e.actorId)
            ps.setString(3, e.eventType); ps.setString(4, e.level)
            ps.setString(5, e.content); ps.addBatch()
          }
          ps.executeBatch()
          c.commit()
        } finally ps.close()
      } finally c.close()
      buffer.clear()
    }
  }

  /** Filtered read-back, newest first (events_log.go:59 GetEvents): `level`
    * and the time bounds are optional, `limit` caps the page. */
  def getEvents(eventType: String, actorId: String, level: Option[String] = None,
                startMs: Option[Long] = None, endMs: Option[Long] = None,
                limit: Int = 100): Seq[ActorEvent] = {
    flush()
    val conds = Seq("event_type = ?", "actor_id = ?") ++
      level.map(_ => "level = ?") ++ startMs.map(_ => "ts_ms >= ?") ++
      endMs.map(_ => "ts_ms <= ?")
    val c = DriverManager.getConnection(url)
    try {
      val ps = c.prepareStatement(
        s"""SELECT ts_ms, actor_id, event_type, level, content FROM events_log
           |WHERE ${conds.mkString(" AND ")}
           |ORDER BY ts_ms DESC FETCH FIRST $limit ROWS ONLY""".stripMargin)
      try {
        var i = 0
        def set(v: Any): Unit = { i += 1; v match {
          case s: String => ps.setString(i, s)
          case l: Long   => ps.setLong(i, l)
        } }
        set(eventType); set(actorId)
        level.foreach(set); startMs.foreach(set); endMs.foreach(set)
        val rs = ps.executeQuery()
        val out = Seq.newBuilder[ActorEvent]
        while (rs.next()) out += ActorEvent(rs.getString(3), rs.getString(2),
          rs.getString(4), rs.getLong(1), rs.getString(5))
        out.result()
      } finally ps.close()
    } finally c.close()
  }
}

/** In-memory sorted-stream twin of the reference's Redis events log
  * (redis_events_log.go) — same interface and semantics against a local
  * store, the backend this environment can't reach a Redis for:
  *
  *   - one stream per `(eventType, level, actorId)` key; an `error`-level
  *     event fans out to BOTH the `error` and `all` streams, everything
  *     else only to `all` (mapLevel, redis_events_log.go:150-155);
  *   - [[postAsync]] buffers per stream key and DROPS once the buffer holds
  *     `maxSize` (PostAsync:106-126 — back-pressure by shedding, not
  *     blocking); [[flush]] appends everything buffered and trims each
  *     stream to its newest `maxSize` entries (the `XADD MAXLEN ~` cap);
  *   - [[postEvent]] writes through immediately and returns the entry id —
  *     Redis stream id shape `<epochMs>-<seq>`, seq disambiguating entries
  *     in the same millisecond;
  *   - [[getEvents]] is XREVRANGE: newest first, optional id/time bounds
  *     INCLUSIVE on both ends, `limit` caps the page.
  *
  * The injected clock keeps ids reproducible in tests (the same frozen-
  * clock treatment the retry ladder gets). */
final class StreamEventsLog(maxSize: Int = 1000,
                            clock: () => Long = () => System.currentTimeMillis()) {
  require(maxSize > 0, "maxSize must be positive")

  private val streams =
    scala.collection.mutable.LinkedHashMap.empty[String, scala.collection.mutable.ArrayBuffer[(String, ActorEvent)]]
  private val buffer =
    scala.collection.mutable.LinkedHashMap.empty[String, scala.collection.mutable.ArrayBuffer[ActorEvent]]
  private var lastMs = -1L
  private var lastSeq = -1L

  private def levelsOf(level: String): Seq[String] =
    if (level == "error") Seq("error", "all") else Seq("all")

  private def key(eventType: String, level: String, actorId: String): String =
    s"eventsLog:$eventType#$level#$actorId"

  private def nextId(): String = synchronized {
    val now = clock()
    if (now == lastMs) lastSeq += 1 else { lastMs = now; lastSeq = 0 }
    s"$lastMs-$lastSeq"
  }

  private def append(k: String, e: ActorEvent): String = {
    val id = nextId()
    val st = streams.getOrElseUpdate(k,
      scala.collection.mutable.ArrayBuffer.empty[(String, ActorEvent)])
    st += (id -> e)
    if (st.length > maxSize) st.remove(0, st.length - maxSize) // MAXLEN trim
    id
  }

  /** Buffered post; a full per-key buffer SHEDS the event (reference
    * PostAsync semantics — the log is best-effort telemetry, not a queue). */
  def postAsync(e: ActorEvent): Unit = synchronized {
    levelsOf(e.level).foreach { lv =>
      val k = key(e.eventType, lv, e.actorId)
      val buf = buffer.getOrElseUpdate(k,
        scala.collection.mutable.ArrayBuffer.empty[ActorEvent])
      if (buf.length < maxSize) buf += e
    }
  }

  /** Append everything buffered, trimming each stream to `maxSize`. */
  def flush(): Unit = synchronized {
    buffer.foreach { case (k, events) => events.foreach(append(k, _)) }
    buffer.clear()
  }

  /** Write-through post; returns the new entry's stream id. ONE XADD to the
    * first mapped stream only (redis_events_log.go:126-132 —
    * `mapLevel(level)[0]`): an error-level event lands in the `error` stream
    * and NOT in `all`; only [[postAsync]] fans out. */
  def postEvent(e: ActorEvent): String = synchronized {
    append(key(e.eventType, levelsOf(e.level).head, e.actorId), e)
  }

  /** Newest-first filtered read (XREVRANGE shape): `level` picks the stream
    * (error → the error stream, anything else → all), bounds are inclusive
    * epoch-ms, `limit` caps the page (`<= 0` = empty page — [[page]] keeps
    * the HTTP endpoint's uncapped-at-0 rule; one filter implementation
    * serves both). */
  def getEvents(eventType: String, actorId: String, level: String = "",
                startMs: Option[Long] = None, endMs: Option[Long] = None,
                limit: Int = 100): Seq[(String, ActorEvent)] =
    if (limit <= 0) Nil
    else page(eventType, actorId, level, None, startMs, endMs, limit)

  /** The HTTP read-back page (`GetEvents` through an `EventsLogFilter`,
    * events_log.go:119-144): newest first, with the id-cursor —
    *
    *   - `beforeId` is an EXCLUSIVE upper bound on the `<ms>-<seq>` id
    *     (the XREVRANGE `(id` form); a malformed id (no leading digits)
    *     THROWS, the reference's parseTimestamp error;
    *   - an `endMs` that is TIGHTER than the cursor (endMs < beforeId's ms)
    *     REPLACES the id bound with an inclusive ms bound — the two never
    *     AND (GetStartAndEndIds keeps exactly one `end` value);
    *   - `startMs` is an inclusive lower ms bound;
    *   - `limit <= 0` means UNCAPPED (the reference adds the COUNT arg only
    *     when limit > 0). */
  def page(eventType: String, actorId: String, level: String = "",
           beforeId: Option[String] = None, startMs: Option[Long] = None,
           endMs: Option[Long] = None,
           limit: Int = 100): Seq[(String, ActorEvent)] = synchronized {
    flush()
    val lv = if (level == "error") "error" else "all"
    def parseId(id: String, defaultSeq: Long): (Long, Long) = {
      val ms = id.takeWhile(_.isDigit)
      if (ms.isEmpty) throw new IllegalArgumentException(
        s"failed to parse beforeId [$id] it is expected to start with timestamp")
      val rest = id.drop(ms.length)
      // Redis accepts exactly `<ms>` (seq defaulted) or `<ms>-<digits>`;
      // a malformed suffix ("1000-", "1000-x") is an XREVRANGE error, not
      // a silent bare-ms fallback that would re-admit that ms's entries
      val seq =
        if (rest.isEmpty) defaultSeq
        else if (rest.startsWith("-") && rest.length > 1 &&
                 rest.drop(1).forall(_.isDigit)) rest.drop(1).toLong
        else throw new IllegalArgumentException(
          s"failed to parse beforeId [$id]: malformed sequence suffix")
      (ms.toLong, seq)
    }
    // a bare-ms cursor's seq defaults to MAX — Redis resolves an incomplete
    // id in an END bound to <ms>-MAX, so the exclusive `(id` cursor still
    // admits that millisecond's earlier entries (XREVRANGE end semantics)
    val before = beforeId.map(parseId(_, Long.MaxValue))
    val useEnd = endMs.filter(e => before.forall(b => e < b._1))
    val idBound = if (useEnd.isDefined) None else before
    val it = streams.getOrElse(key(eventType, lv, actorId),
        scala.collection.mutable.ArrayBuffer.empty[(String, ActorEvent)])
      .reverseIterator
      .filter { case (id, _) =>
        val (ms, seq) = parseId(id, 0L) // stored ids always carry `-seq`
        idBound.forall { case (bm, bs) => ms < bm || (ms == bm && seq < bs) } &&
          useEnd.forall(ms <= _) && startMs.forall(ms >= _)
      }
    (if (limit > 0) it.take(limit) else it).toSeq
  }
}

/** ClickHouse statement set for the same log — the backend the reference
  * runs in production (ch_events_log.go); executes verbatim on a CH cluster,
  * spec-proven as text here (no CH in this environment, same treatment as
  * the K1-K6 warehouse dialects). */
object ChEventsLogSql {

  /** MergeTree keyed exactly how GetEvents filters (type, actor, time);
    * 90-day TTL mirrors the log's retention role. */
  val ddl: String =
    """CREATE TABLE IF NOT EXISTS events_log (
      |  timestamp DateTime64(3),
      |  actor_id String,
      |  event_type LowCardinality(String),
      |  level LowCardinality(String),
      |  content String
      |) ENGINE = MergeTree()
      |ORDER BY (event_type, actor_id, timestamp)
      |TTL toDateTime(timestamp) + INTERVAL 90 DAY""".stripMargin

  /** ch_events_log.go:147 — async insert, fire-and-forget. */
  val insert: String =
    "INSERT INTO events_log SETTINGS async_insert=1, wait_for_async_insert=0 VALUES (?,?,?,?,?)"

  def select(withLevel: Boolean, withStart: Boolean, withEnd: Boolean,
             limit: Int): String = {
    val conds = Seq("event_type = ?", "actor_id = ?") ++
      (if (withLevel) Seq("level = ?") else Nil) ++
      (if (withStart) Seq("timestamp >= ?") else Nil) ++
      (if (withEnd) Seq("timestamp <= ?") else Nil)
    s"""SELECT timestamp, actor_id, event_type, level, content FROM events_log
       |WHERE ${conds.mkString(" AND ")}
       |ORDER BY timestamp DESC LIMIT $limit""".stripMargin
  }
}
