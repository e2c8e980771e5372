package graft.sources

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.ObjectNode
import scala.jdk.CollectionConverters._
import graft.core.DataKind

/** Airbyte-protocol model: the connector-output line format and the
  * configured-catalog document the reference's sync sidecar consumes
  * (sync-sidecar/types.go, read.go:194-263, main.go:194-213). A connector
  * process writes one JSON message per line to stdout — RECORD / STATE /
  * LOG / TRACE / DEBUG / CONTROL during `read`; SPEC / CONNECTION_STATUS /
  * CATALOG during `spec|check|discover` — interleaved with bare non-JSON
  * log lines. This object is the pure parsing half; [[AirbyteRunner]] is
  * the stateful read loop that routes RECORDs into the engine.
  */
object Airbyte {

  val LogType = "LOG"
  val ConnectionStatusType = "CONNECTION_STATUS"
  val StateType = "STATE"
  val RecordType = "RECORD"
  val TraceType = "TRACE"
  val DebugType = "DEBUG"
  val CatalogType = "CATALOG"
  val ControlType = "CONTROL"
  val SpecType = "SPEC"

  private[sources] val mapper = new ObjectMapper()

  /** `joinStrings(namespace, name, ".")` (main.go:239-247): the key a
    * stream is addressed by everywhere in the protocol. */
  def streamKey(namespace: String, name: String): String =
    if (namespace == null || namespace.isEmpty) name
    else if (name == null || name.isEmpty) namespace
    else s"$namespace.$name"

  /** One configured stream of the catalog (types.go:120-218): the
    * `{"stream":{...meta...},"sync_mode":...,"cursor_field":[...]}` entry. */
  final case class Stream(
      name: String,
      namespace: String,
      tableName: Option[String],
      /** declared JSON-schema properties in document order, mapped to the
        * engine's type lattice (types.go:159-201) */
      schema: Seq[(String, DataKind)],
      /** flattened `source_defined_primary_key` (types.go:203-212) */
      primaryKeys: Seq[String],
      defaultCursorField: Seq[String],
      syncMode: String,
      cursorField: Seq[String]) {
    def key: String = streamKey(namespace, name)
  }

  /** JSON-schema property → engine type, per the reference's ladder
    * (types.go:159-201): `oneOf` → STRING; `type` may be a scalar or an
    * array with "null" excluded; string+date[-time] format → TIMESTAMP;
    * number with airbyte_type=integer → INT64; array/object → JSON. */
  def propertyKind(prop: JsonNode): DataKind = {
    if (prop.has("oneOf") && prop.get("oneOf").isArray && prop.get("oneOf").size() > 0)
      return DataKind.Str
    val tpNode = prop.get("type")
    val tp: String =
      if (tpNode == null) ""
      else if (tpNode.isTextual) tpNode.asText()
      else if (tpNode.isArray)
        tpNode.elements().asScala.map(_.asText()).find(_ != "null").getOrElse("")
      else ""
    def text(f: String) = Option(prop.get(f)).filter(_.isTextual).map(_.asText).getOrElse("")
    tp match {
      case "string" =>
        val f = text("format")
        if (f == "date-time" || f == "date") DataKind.Timestamp else DataKind.Str
      case "boolean" => DataKind.Bool
      case "integer" => DataKind.Int64
      case "number" =>
        if (text("airbyte_type") == "integer") DataKind.Int64 else DataKind.Float64
      case "array" | "object" => DataKind.Json
      case _ => DataKind.Str
    }
  }

  /** Parse a configured-catalog document `{"streams":[...]}` (read.go:678-700
    * + types.go:120-136). Streams keep catalog order — the final status map
    * is emitted in this order. */
  def parseCatalog(json: String): Seq[Stream] = {
    val root = mapper.readTree(json)
    val streams = Option(root.get("streams")).filter(_.isArray)
      .map(_.elements().asScala.toSeq).getOrElse(Seq.empty)
    streams.map { entry =>
      val meta = Option(entry.get("stream")).getOrElse(mapper.createObjectNode())
      def text(n: JsonNode, f: String) =
        Option(n.get(f)).filter(_.isTextual).map(_.asText).getOrElse("")
      def strArray(n: JsonNode, f: String): Seq[String] =
        Option(n.get(f)).filter(_.isArray)
          .map(_.elements().asScala.map(_.asText()).toSeq).getOrElse(Seq.empty)
      val props = Option(meta.get("json_schema")).flatMap(js => Option(js.get("properties")))
        .collect { case o: ObjectNode => o }
        .map(o => o.properties().asScala.toSeq.map(e => e.getKey -> propertyKind(e.getValue)))
        .getOrElse(Seq.empty)
      // source_defined_primary_key is [][]string — flattened (types.go:203-212)
      val pks = Option(meta.get("source_defined_primary_key")).filter(_.isArray)
        .map(_.elements().asScala.flatMap(inner =>
          inner.elements().asScala.map(_.asText())).toSeq).getOrElse(Seq.empty)
      Stream(
        name = text(meta, "name"),
        namespace = text(meta, "namespace"),
        tableName = Option(text(meta, "table_name")).filter(_.nonEmpty),
        schema = props,
        primaryKeys = pks,
        defaultCursorField = strArray(meta, "default_cursor_field"),
        syncMode = text(entry, "sync_mode"),
        cursorField = strArray(entry, "cursor_field"))
    }
  }

  /** A classified connector-output line. `Passthrough` is a non-JSON line
    * routed as a log with its first word as level (main.go:194-213);
    * `Malformed` looked like JSON but failed to parse (read.go:214-219 —
    * logged, never fatal). */
  sealed trait Line
  final case class JsonRow(node: ObjectNode, raw: String) extends Line
  final case class Passthrough(level: String, message: String) extends Line
  final case class Malformed(raw: String, error: String) extends Line

  private val LevelWords = Set("info", "error", "warn", "debug", "fatal", "trace")

  /** `checkJsonRow` (main.go:194-213): a trimmed line bounded by `{`…`}` is
    * a protocol row; anything else is a raw connector log whose first word
    * may name its level (unknown first words log at ERROR level — but via
    * `_log`, which does NOT register a run error). */
  def classify(line: String): Line = {
    val trimmed = line.trim
    if (trimmed.startsWith("{") && trimmed.endsWith("}")) {
      try Airbyte.mapper.readTree(trimmed) match {
        case o: ObjectNode => JsonRow(o, trimmed)
        case _ => Malformed(trimmed, "not a JSON object")
      } catch { case e: Exception => Malformed(trimmed, String.valueOf(e.getMessage)) }
    } else {
      val parts = trimmed.split(" ", 2)
      val first = parts(0)
      val rest = if (parts.length > 1) parts(1) else ""
      if (LevelWords.contains(first.toLowerCase)) Passthrough(first.toUpperCase, rest)
      else Passthrough("ERROR", trimmed)
    }
  }

  /** Log-level ordering for shouldLog (main.go:26-33, 235-237). */
  private val LogLevels = Map(
    "TRACE" -> -2, "DEBUG" -> -1, "INFO" -> 0, "WARN" -> 1, "ERROR" -> 2, "FATAL" -> 3)
  def shouldLog(level: String, enabled: String): Boolean =
    LogLevels.getOrElse(level, 0) >= LogLevels.getOrElse(enabled, 0)

  /** Result of a spec / check / discover run (spec_catalog.go): at most one
    * of the payloads, plus the rollup status. A payload row CLEARS any
    * earlier soft error (spec_catalog.go:111-113, 122-124, 133-135). */
  final case class DiscoverResult(
      spec: Option[String],
      connectionStatus: Option[(String, String)], // (status, message)
      catalog: Option[String],
      status: String, // SUCCESS | FAILED
      error: String)

  /** The spec/check/discover sidecar loop (spec_catalog.go:68-141): SPEC /
    * CONNECTION_STATUS / CATALOG land in the result; LOG lines at
    * ERROR/FATAL register a soft error that a later payload clears;
    * `SUCCEEDED` normalizes to `SUCCESS` (spec_catalog.go:125). */
  def runDiscover(lines: Iterator[String]): DiscoverResult = {
    var spec: Option[String] = None
    var connection: Option[(String, String)] = None
    var catalog: Option[String] = None
    var firstErr: String = ""
    def registerErr(e: String): Unit = if (firstErr.isEmpty) firstErr = e
    lines.foreach { raw =>
      classify(raw) match {
        // bare lines route through _log, which never registers a run error
        // (main.go:208-211) — only structured LOG rows at ERROR/FATAL do
        case Passthrough(_, _) => ()
        case Malformed(_, _) => ()
        case JsonRow(node, _) =>
          Option(node.get("type")).map(_.asText("")).getOrElse("") match {
            case LogType =>
              val log = Option(node.get("log")).getOrElse(mapper.createObjectNode())
              val level = Option(log.get("level")).map(_.asText("")).getOrElse("")
              if (level == "ERROR" || level == "FATAL")
                registerErr(Option(log.get("message")).map(_.asText("")).getOrElse(""))
            case SpecType =>
              firstErr = ""
              spec = Option(node.get("spec")).map(_.toString)
            case ConnectionStatusType =>
              firstErr = ""
              val cs = Option(node.get("connectionStatus")).getOrElse(mapper.createObjectNode())
              val st = Option(cs.get("status")).map(_.asText("")).getOrElse("")
                .replace("SUCCEEDED", "SUCCESS")
              val msg = Option(cs.get("message")).map(_.asText("")).getOrElse("")
              connection = Some((st, msg))
            case CatalogType =>
              firstErr = ""
              catalog = Option(node.get("catalog")).map(_.toString)
            case ControlType | TraceType => ()
            case other =>
              registerErr(s"not supported type: $other")
          }
      }
    }
    val failed = firstErr.nonEmpty
    DiscoverResult(spec, connection, catalog,
      if (failed) "FAILED" else "SUCCESS", firstErr)
  }
}
