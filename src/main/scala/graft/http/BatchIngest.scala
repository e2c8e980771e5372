package graft.http

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}
import scala.jdk.CollectionConverters._

/** Segment batch-envelope ingest (`ingest/router_batch_handler.go`): parse
  * the `{"batch":[...],"context":{...},"writeKey":"...","eventsName":"..."}`
  * payload, collapse near-duplicate events inside the batch (gap dedup,
  * router_batch_handler.go:22-106), merge the batch-level `context` into
  * each event (router.go:334-345), and normalize each event's type/name
  * (patchEvent, router.go:291-321). Pure driver-side edge logic — a request
  * body is bounded by the HTTP payload limit, never data-plane scale; the
  * admitted events then flow through the same distributed spool→micro-batch
  * path as single-event ingest.
  */
object BatchIngest {

  private val mapper = new ObjectMapper()

  /** Parsed batch envelope (`BatchPayload`, ingest/router.go:241-246). */
  final case class Payload(batch: Seq[ObjectNode], context: Option[ObjectNode],
                           writeKey: Option[String], eventsName: Option[String])

  /** Parse the envelope; malformed JSON or a non-array `batch` throws. */
  def parse(body: String): Payload = {
    val root = mapper.readTree(body)
    require(root != null && root.isObject, "batch payload must be a JSON object")
    val batch = Option(root.get("batch")) match {
      case Some(a: ArrayNode) => a.elements().asScala.collect {
        case o: ObjectNode => o }.toSeq
      case Some(n) if n.isNull => Seq.empty
      case None => Seq.empty
      case Some(_) => throw new IllegalArgumentException("batch must be an array")
    }
    val ctx = Option(root.get("context")).collect { case o: ObjectNode => o }
    def str(f: String) = Option(root.get(f)).filter(_.isTextual).map(_.asText)
      .filter(_.nonEmpty)
    Payload(batch, ctx, str("writeKey"), str("eventsName"))
  }

  /** The identity of a batch event for dedup purposes
    * (`eventKey`, router_batch_handler.go:22-29): the JSON-encoded
    * `properties`/`traits` stand in for the reference's printed forms —
    * both compare the parsed value in field order. */
  private final case class EventKey(anonymousId: String, userId: String,
                                    tp: String, event: String,
                                    parameters: String, traits: String)

  private def textOf(ev: ObjectNode, f: String): String =
    Option(ev.get(f)).filter(_.isTextual).map(_.asText).getOrElse("")

  /** RFC3339Nano parse to epoch millis; None = missing/unparseable (the
    * reference then SKIPS dedup for that event). */
  def parseTs(ts: String): Option[Long] =
    if (ts.isEmpty) None
    else try Some(java.time.OffsetDateTime.parse(ts).toInstant.toEpochMilli)
    catch { case _: java.time.format.DateTimeParseException => None }

  /** Gap-based in-batch dedup (`deduplicateBatch`,
    * router_batch_handler.go:34-107): events with identical
    * anonymousId/userId/type/event/properties/traits whose timestamp lies
    * within `gapMs` of the LAST KEPT occurrence of that key are dropped;
    * a dropped duplicate does NOT advance the key's timestamp. Events with
    * a missing or unparseable timestamp always pass (and never register a
    * key). Order-preserving, single sequential scan — batch-local by
    * definition. */
  def deduplicateBatch(batch: Seq[ObjectNode], gapMs: Int): Seq[ObjectNode] = {
    if (batch.lengthCompare(1) <= 0) return batch
    val seen = scala.collection.mutable.HashMap.empty[EventKey, Long]
    batch.filter { ev =>
      parseTs(textOf(ev, "timestamp")) match {
        case None => true
        case Some(ts) =>
          val key = EventKey(textOf(ev, "anonymousId"), textOf(ev, "userId"),
            textOf(ev, "type"), textOf(ev, "event"),
            Option(ev.get("properties")).map(_.toString).getOrElse(""),
            Option(ev.get("traits")).map(_.toString).getOrElse(""))
          seen.get(key) match {
            case Some(prev) if math.abs(ts - prev) <= gapMs => false
            case _ => seen.update(key, ts); true
          }
      }
    }
  }

  private val EventTypes = Set("page", "identify", "track", "group", "alias", "screen")

  /** Per-event normalization for batch entries (`patchEvent` with
    * tp="event", router.go:291-321 + 334-345): resolve the event type
    * (forced to `track` when the envelope carries `eventsName`, else the
    * event's own `type`), validate it, default the track event name, and
    * merge the batch-level context UNDER the event's own context (the
    * event's fields win). Mutates and returns the node, or Left(error). */
  def patchBatchEvent(ev: ObjectNode, batchContext: Option[ObjectNode],
                      eventsName: Option[String]): Either[String, ObjectNode] = {
    val tp = eventsName match {
      case Some(_) => "track"
      case None => textOf(ev, "type")
    }
    if (tp.isEmpty) return Left("type property of event is required")
    if (!EventTypes.contains(tp)) return Left(s"Unknown event type: $tp")
    if (tp == "track") {
      val name = Option(textOf(ev, "event")).filter(_.nonEmpty)
        .orElse(eventsName).getOrElse("")
      if (name.isEmpty) return Left("'event' property is required for 'track' event")
      if (name.length > 128) return Left(s"Invalid track event name '$name'. Max length is 128 characters.")
      if (eventsName.isDefined && !ev.hasNonNull("event")) { ev.put("event", name); () }
    }
    batchContext.filter(_.size > 0).foreach { bc =>
      val merged = bc.deepCopy()
      Option(ev.get("context")).collect { case o: ObjectNode => o }
        .foreach(own => { merged.setAll(own); () })
      ev.set[JsonNode]("context", merged)
      ()
    }
    ev.put("type", tp)
    Right(ev)
  }
}
