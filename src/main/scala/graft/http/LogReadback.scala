package graft.http

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.databind.node.ObjectNode
import java.nio.charset.StandardCharsets.UTF_8

/** Events-log HTTP read-back semantics (`EventsLogHandler`,
  * bulkerapp/app/router.go:485-571): the query surface the reference UI's
  * event-status page drives —
  *
  *   - path `/log/:eventType.:level/:actorId` (the eventKey packs type and
  *     level around a dot, router.go:530-532);
  *   - `beforeId` id-cursor paging: an EXCLUSIVE upper bound on the
  *     `<epochMs>-<seq>` stream id (events_log.go:120-144 builds the
  *     XREVRANGE `(id` bound); an `end` date REPLACES the id bound when it
  *     is tighter (end < beforeId's ms), it never ANDs with it;
  *   - `start`/`end` accept a 13-digit unix-millis timestamp or a
  *     `2006-01-02` day (router.go:585-594), inclusive on both ends;
  *   - `limit` defaults to 100; a parsed value REPLACES it only when
  *     < 1000 (router.go:521-528 — `limit=0` therefore means UNCAPPED,
  *     because GetEvents adds the COUNT arg only when limit > 0);
  *   - `ndjson` truish → one record per line, else a JSON array;
  *   - `maxBytes` stops the body at the first record that would overflow;
  *   - `incoming` records get their `body` writeKey MASKED
  *     (router.go:573-584's WriteKeyPattern replacement).
  *
  * Record shape: `{"id":"<ms>-<seq>","date":"<ISO-8601>","content":...}` —
  * the reference's EventsLogRecord json tags. All of this is driver-side
  * control-plane shaping of an ops page; the log data itself stays bounded
  * (each stream is MAXLEN-trimmed at the source).
  */
object LogReadback {

  private val mapper = new ObjectMapper()

  /** The reference's WriteKeyPattern (router.go:35). Java's replaceAll
    * substitutes the empty string for a non-participating optional group,
    * matching Go's ReplaceAllString. */
  private val WriteKeyPattern =
    java.util.regex.Pattern.compile("\"writeKey\":\\s*\"([^:\"]+)?(:)?([^\"]+)?\"")

  private val TimestampPattern = java.util.regex.Pattern.compile("^\\d{13}$")

  /** GetEvents filter (eventslog.EventsLogFilter): `limit <= 0` = uncapped. */
  final case class Filter(beforeId: Option[String] = None,
                          startMs: Option[Long] = None,
                          endMs: Option[Long] = None,
                          limit: Int = 100)

  /** One log record: stream id, its epoch-ms, and the content as JSON text. */
  final case class Record(id: String, tsMs: Long, content: String)

  /** The injected backend: (eventType, level, actorId, filter) → newest-first
    * records. Throws on a backend failure (→ 500). */
  type Reader = (String, String, String, Filter) => Seq[Record]

  /** Adapter over the live [[graft.streaming.StreamEventsLog]] — the
    * repo's twin of the reference's Redis stream backend (the only
    * GetEvents implementation the reference ships that is not a stub). */
  def reader(log: graft.streaming.StreamEventsLog): Reader =
    (eventType, level, actorId, f) =>
      log.page(eventType, actorId, level, f.beforeId, f.startMs, f.endMs, f.limit)
        .map { case (id, e) => Record(id, e.timestampMs, e.content) }

  /** `utils.IsTruish` via strconv.ParseBool (router.go:536): only these
    * spellings are true; anything else (including parse errors) is false. */
  def truish(v: Option[String]): Boolean =
    v.exists(s => Set("1", "t", "T", "TRUE", "true", "True").contains(s))

  /** `parseDateQueryParam` (router.go:585-594): exactly-13-digit unix
    * millis, or a `2006-01-02` day at UTC midnight. Throws on anything
    * else (→ the handler's 400). */
  def parseDateParam(v: Option[String]): Option[Long] =
    v.filter(_.nonEmpty).map { s =>
      if (TimestampPattern.matcher(s).matches()) s.toLong
      else
        try java.time.LocalDate.parse(s)
          .atStartOfDay(java.time.ZoneOffset.UTC).toInstant.toEpochMilli
        catch { case _: java.time.format.DateTimeParseException =>
          throw new IllegalArgumentException(
            "must be either unix timestamp or date in '2006-01-02' format") }
    }

  /** Mask the secret tail of any writeKey occurrence in an incoming
    * record's raw body string (maskWriteKeyInObj, router.go:573-584). */
  def maskWriteKey(body: String): String =
    WriteKeyPattern.matcher(body).replaceAll("\"writeKey\": \"$1$2***\"")

  /** One serialized record. `incoming` content objects get their textual
    * `body` field masked before marshalling; content that does not parse
    * degrades to the reference's in-band EVENTS_LOG_ERROR row instead of
    * failing the whole page. */
  def recordJson(eventType: String, r: Record): String = {
    val content =
      try {
        val node = mapper.readTree(r.content)
        if (eventType == "incoming") node match {
          case o: ObjectNode if Option(o.get("body")).exists(_.isTextual) =>
            o.put("body", maskWriteKey(o.get("body").asText)); ()
          case _ => ()
        }
        node
      } catch { case e: Exception =>
        return s"""{"EVENTS_LOG_ERROR":${graft.Verify.jsonStr(
          s"Failed to parse event log record: ${Option(e.getMessage).getOrElse("bad JSON")}")},"OBJECT":${
          graft.Verify.jsonStr(r.content)}}"""
      }
    val root = mapper.createObjectNode()
    root.put("id", r.id)
    root.put("date", java.time.Instant.ofEpochMilli(r.tsMs).toString)
    root.set[com.fasterxml.jackson.databind.JsonNode]("content", content)
    root.toString
  }

  /** Frame the page (router.go:535-571): NDJSON lines or a JSON array;
    * `maxBytes > 0` stops at the first record that would overflow. Each
    * admitted record accounts `len + 1` — the reference's exact `written`
    * bookkeeping (it counts one separator byte per record in BOTH
    * framings, router.go:549,567). Returns (contentType, body). */
  def render(eventType: String, records: Seq[Record], ndjson: Boolean,
             maxBytes: Int): (String, Array[Byte]) = {
    val out = new java.io.ByteArrayOutputStream()
    var written = 0
    if (ndjson) {
      val it = records.iterator
      var stop = false
      while (it.hasNext && !stop) {
        val bytes = recordJson(eventType, it.next()).getBytes(UTF_8)
        if (maxBytes > 0 && written + bytes.length > maxBytes) stop = true
        else {
          out.write(bytes); out.write('\n')
          written += bytes.length + 1
        }
      }
      ("application/x-ndjson", out.toByteArray)
    } else {
      out.write('[')
      val it = records.iterator
      var stop = false
      while (it.hasNext && !stop) {
        val bytes = recordJson(eventType, it.next()).getBytes(UTF_8)
        if (maxBytes > 0 && written + bytes.length > maxBytes) stop = true
        else {
          if (written > 0) out.write(',')
          out.write(bytes)
          written += bytes.length + 1
        }
      }
      out.write(']')
      ("application/json", out.toByteArray)
    }
  }
}
