package graft.sources

import com.fasterxml.jackson.databind.JsonNode
import com.fasterxml.jackson.databind.node.ObjectNode
import scala.collection.mutable
import graft.{BulkerStream, Engine, StreamConfig}
import graft.core.DataKind

/** The Airbyte `read`-command data plane (sync-sidecar/read.go): consume the
  * connector's NDJSON protocol output line by line, route RECORDs per stream
  * into [[graft.Engine]] load sessions, commit chunks on STATE checkpoints,
  * honor the reference's state-saving error gates, and roll per-stream
  * STARTED/COMPLETE/INCOMPLETE/ERROR signals into the final status map.
  *
  * Scale posture: the protocol is an inherently SEQUENTIAL pipe from a
  * connector process — the reference consumes it row-at-a-time on one
  * goroutine, and so does this runner on the driver. The data plane never
  * accumulates past one chunk: a checkpoint (incremental mode, or the
  * 500k-event cap — read.go:369) hands the chunk to the engine, whose
  * shape→dedup→evolve→load pipeline is fully distributed. Bulk sources that
  * are NOT protocol pipes should feed `BulkerStream.consumeDataset` directly.
  */
final class AirbyteRunner(
    engine: Engine,
    catalog: Seq[Airbyte.Stream],
    cfg: AirbyteRunner.Config = AirbyteRunner.Config()) {

  import AirbyteRunner._
  import Airbyte._

  private val catalogMap: mutable.LinkedHashMap[String, Airbyte.Stream] = {
    val m = mutable.LinkedHashMap.empty[String, Airbyte.Stream]
    catalog.foreach(s => m.update(s.key, s))
    m
  }
  private val processed = mutable.LinkedHashMap.empty[String, Active]
  private val savedStates = mutable.LinkedHashMap.empty[String, String]
  private val logLines = mutable.ArrayBuffer.empty[(String, String, String)]
  private var lastStream: Active = null
  private var lastStateMessage = ""
  private var firstErr = ""
  // a blank or "{}" prior state counts as NO state (read.go:670-672)
  private val initialState: String = {
    val st = cfg.initialState.trim
    if (st.isEmpty || st == "{}") "" else st
  }

  /** One in-flight stream (read.go:735-862 ActiveStream): accounting plus
    * the current engine load session, if any. */
  private final class Active(val name: String, val syncMode: String) {
    var status = "RUNNING"
    var error = ""
    var errorFromLogs = ""
    var noTrustworthyError = false
    var eventsCount = 0L
    var bytesProcessed = 0L
    var buffered = 0L
    var bufferedBytes = 0L
    var unsavedState: Option[String] = None
    var closed = false
    var lastMode: String = Engine.ReplaceTable
    var bulkerStream: Option[BulkerStream] = None

    def isActive: Boolean = bulkerStream.isDefined && error.isEmpty

    /** read.go:856-862: first error wins, except an untrustworthy
      * interrupt placeholder yields to a real one; registering an error
      * voids the uncommitted buffer. */
    def registerError(err: String): Unit =
      if (err.nonEmpty && (error.isEmpty || noTrustworthyError)) {
        error = err
        noTrustworthyError = false
        buffered = 0
        bufferedBytes = 0
      }

    def consume(dataJson: String, originalSize: Int): Unit =
      if (error.isEmpty) bulkerStream.foreach { bs =>
        bs.consume(dataJson)
        buffered += 1
        bufferedBytes += originalSize
      }

    /** read.go:782-807 Commit: abort on stream error (or, under strict
      * close, on an attributed connector log error); otherwise hand the
      * chunk to the engine and fold the load result into the stats. */
    def commit(strict: Boolean): Unit = {
      bulkerStream.foreach { bs =>
        if (error.nonEmpty) bs.abort()
        else if (strict && errorFromLogs.nonEmpty) { error = errorFromLogs; bs.abort() }
        else if (buffered == 0 && lastMode != Engine.ReplaceTable) {
          // nothing buffered and nothing to swap: an empty batch commit is
          // a no-op load (the reference's Complete returns 0 processed rows)
          bs.abort()
        } else {
          val state = bs.complete()
          if (state.status != "ok")
            error = if (state.error.nonEmpty) state.error else "load failed"
          else { eventsCount += buffered; bytesProcessed += bufferedBytes }
        }
      }
      buffered = 0; bufferedBytes = 0; bulkerStream = None
    }

    def abort(): Unit = { bulkerStream.foreach(_.abort()); bulkerStream = None }

    /** read.go:809-837 Close: status resolution — an errored stream is
      * PARTIAL if any chunk committed, else FAILED; an interrupted stream
      * takes the attributed log error or the generic interrupt text. */
    def close(complete: Boolean, strict: Boolean): Unit = {
      if (complete) commit(strict)
      else {
        abort()
        if (error.isEmpty) {
          error = if (errorFromLogs.nonEmpty) errorFromLogs else InterruptError
          noTrustworthyError = true
        }
      }
      if (error.nonEmpty) status = if (eventsCount > 0) "PARTIAL" else "FAILED"
      else if (status == "RUNNING") status = "SUCCESS"
      closed = true
    }
  }

  private def log(logger: String, level: String, message: String): Unit = {
    if (Airbyte.shouldLog(level, cfg.logLevel)) logLines += ((logger, level, message))
    ()
  }
  private def errprint(message: String): Unit = log("jitsu", "ERROR", message)
  private def registerErr(err: String): Unit = if (firstErr.isEmpty) firstErr = err

  /** sourceLog (main.go:157-169): connector-attributed log; ERROR/FATAL
    * levels register the run's first error. */
  private def sourceLog(level: String, message: String): Unit = {
    if (level == "ERROR" || level == "FATAL") registerErr(message)
    log(cfg.packageName, level, message)
  }

  /** read.go:722-726: a run error fails unfinished streams — unless the
    * connector package is on the reference's lenient list. */
  private def isCriticalError: Boolean =
    firstErr.nonEmpty && !LenientPackages.contains(cfg.packageName)

  /** read.go:267-279: attribute a connector ERROR log to a stream only
    * when exactly one is running. */
  private def solelyRunningStream: Option[Active] = {
    val running = processed.values.filter(_.status == "RUNNING").take(2).toSeq
    if (running.size == 1) Some(running.head) else None
  }

  def run(lines: Iterator[String]): RunResult = run(lines, () => false)

  /** Cancellable run (the sync-controller pod leg): `cancelled` is the
    * sidecar's SIGTERM flag (main.go:214-221 / read.go:75-95) — when it
    * trips, the connector pipe ends and the rollup takes the CANCELLED
    * branches instead of completing still-open streams. */
  def run(lines: Iterator[String], cancelled: () => Boolean): RunResult = {
    try lines.takeWhile(_ => !cancelled()).foreach(processLine)
    catch { case e: Exception =>
      // the reference's recover() path (read.go:77-79): register and fall
      // through to the close, which fails still-running streams
      registerErr(String.valueOf(e.getMessage))
      if (lastStream != null) lastStream.registerError(String.valueOf(e.getMessage))
    }
    finish(cancelled())
  }

  def processLine(raw: String): Unit = classify(raw) match {
    case Passthrough(level, message) => log(cfg.packageName, level, message)
    case Malformed(line, err) =>
      log("jitsu", "ERROR", s"error parsing airbyte line $line: $err")
      log(cfg.packageName, "INFO", line)
    case JsonRow(node, line) =>
      Option(node.get("type")).map(_.asText("")).getOrElse("") match {
        case LogType =>
          val logNode = obj(node, "log")
          val level = text(logNode, "level").toUpperCase
          val message = text(logNode, "message")
          if (level == "ERROR" || level == "FATAL")
            solelyRunningStream.foreach(_.errorFromLogs = message)
          sourceLog(level, message)
        case DebugType =>
          log(cfg.packageName, "DEBUG", text(node, "message"))
        case StateType =>
          // consecutive identical STATE lines collapse (read.go:246-249)
          if (lastStateMessage != line) {
            processState(obj(node, "state"))
            lastStateMessage = line
          }
        case RecordType => processRecord(node, line.length)
        case TraceType => processTrace(obj(node, "trace"), line)
        case ControlType =>
          log(cfg.packageName, "WARN",
            s"Control messages are not supported and ignored: $line")
        case other =>
          throw new IllegalStateException(
            s"not supported Airbyte message type: $other: $line")
      }
  }

  /** read.go:281-299: STATE dispatch — STREAM states attach to their stream
    * and checkpoint it; GLOBAL/LEGACY checkpoint the last-OPENED stream and
    * save under the sentinel keys. NOTE "last-opened", not "last-touched":
    * the reference sets `lastStream` only on the create/reopen path of
    * openStream (read.go:469), AFTER the already-active early returns — so
    * records interleaving into an older stream do NOT move the pointer, and
    * a GLOBAL state checkpoints the most recently OPENED stream. Replicated
    * faithfully, quirk included. */
  private def processState(state: ObjectNode): Unit = text(state, "type") match {
    case "GLOBAL" =>
      checkpointIfNecessary(Option(lastStream))
      saveState(GlobalStateKey, jsonOf(state, "global"))
    case "STREAM" =>
      val ss = obj(state, "stream")
      val desc = obj(ss, "stream_descriptor")
      val key = streamKey(text(desc, "namespace"), text(desc, "name"))
      processed.get(key).foreach { stream =>
        stream.unsavedState = jsonOf(ss, "stream_state")
        checkpointIfNecessary(Some(stream))
      }
    case "LEGACY" | "" =>
      checkpointIfNecessary(Option(lastStream))
      saveState(LegacyStateKey, jsonOf(state, "data"))
    case other =>
      log("jitsu", "WARN", s"unknown state type: $other")
  }

  /** read.go:301-327: the state-saving gates — a stream state needs its
    * stream processed AND error-free; the sentinel states need the whole
    * run error-free. */
  private def saveState(stream: String, data: Option[String]): Unit = data match {
    case None => ()
    case Some(json) =>
      if (stream != LegacyStateKey && stream != GlobalStateKey) {
        processed.get(stream) match {
          case None =>
            errprint(s"STATE: cannot save state for stream '$stream' because it was not processed")
          case Some(p) if p.error.nonEmpty =>
            errprint(s"STATE: not saving state for stream '$stream' because of previous errors")
          case Some(_) =>
            log("jitsu", "INFO", s"SAVING STATE for '$stream': $json")
            savedStates.update(stream, json)
        }
      } else {
        if (isCriticalError)
          errprint(s"STATE: not saving '$stream' state because of previous errors")
        else {
          log("jitsu", "INFO", s"SAVING STATE for '$stream': $json")
          savedStates.update(stream, json)
        }
      }
  }

  /** read.go:355-387: commit the running chunk when a state message lands —
    * always for incremental streams (unless FULL_SYNC), or past the buffered
    * cap; a SUCCESS-closed stream just flushes its pending state. */
  private def checkpointIfNecessary(streamOpt: Option[Active]): Unit =
    streamOpt.foreach { stream =>
      if (stream.status == "SUCCESS") {
        saveState(stream.name, stream.unsavedState)
        stream.unsavedState = None
      } else if (stream.isActive &&
          (stream.buffered >= cfg.chunkEvents ||
           (stream.syncMode == "incremental" && !cfg.fullSync))) {
        stream.commit(strict = false)
        if (stream.error.nonEmpty)
          errprint(s"Stream '${stream.name}' bulker commit failed: ${stream.error}")
        else {
          saveState(stream.name, stream.unsavedState)
          stream.unsavedState = None
          log("jitsu", "INFO",
            s"Stream '${stream.name}' bulker commit: rows: ${stream.eventsCount}")
        }
      }
    }

  /** read.go:439-531 openStream: resolve the catalog entry, pick the bulk
    * mode (ReplaceTable by default; Batch for incremental-with-initial-state
    * and for post-checkpoint reopens), derive table name / namespace from
    * the prefix templates, and start an engine load session carrying pk /
    * dedup / cursor-discriminator / declared-schema options. */
  private def openStream(key: String): Either[String, Active] = {
    catalogMap.get(key) match {
      case None => Left(s"stream '$key' is not in catalog")
      case Some(str) =>
        val existing = processed.get(key)
        existing match {
          // incremental streams swallow all messages after a committed-chunk
          // error: the source can't be told to skip ahead (read.go:447-451)
          case Some(st) if st.error.nonEmpty => Right(st)
          case Some(st) if st.isActive => Right(st)
          case _ =>
            var mode = Engine.ReplaceTable
            if (str.syncMode == "incremental" && initialState.nonEmpty)
              mode = Engine.Batch
            else if (existing.exists(_.eventsCount > 0))
              mode = Engine.Batch // checkpointed already: keep appending (read.go:460-464)
            val stream = existing.getOrElse {
              val a = new Active(key, str.syncMode)
              processed.update(key, a)
              a
            }
            lastStream = stream
            val prefix = cfg.tableNamePrefix.replace(NamespaceVar, str.namespace)
            var namespace = ""
            var tableName = str.tableName.getOrElse(prefix + str.name)
            if (cfg.namespace == LegacyNamespace)
              tableName = str.tableName.getOrElse(prefix + key)
            else
              namespace = cfg.namespace.replace(NamespaceVar, str.namespace).trim
            val discriminator =
              if (str.cursorField.nonEmpty) str.cursorField else str.defaultCursorField
            val withPk = cfg.deduplicate && str.primaryKeys.nonEmpty
            val sc = StreamConfig(
              mode = mode,
              pk = if (withPk) str.primaryKeys else Nil,
              deduplicate = withPk,
              discriminator = if (withPk) discriminator else Nil,
              columnTypes = str.schema.toMap,
              declaredFields = str.schema.map(_._1),
              toSameCase = cfg.toSameCase,
              namespace = Option(namespace).filter(_.nonEmpty))
            try {
              stream.bulkerStream = Some(engine.createStream(tableName, sc))
              stream.lastMode = mode
              log("jitsu", "INFO",
                s"Stream '$key' created bulker. table: $tableName mode: $mode primary keys: ${str.primaryKeys.mkString(",")}")
              Right(stream)
            } catch {
              case e: Exception =>
                Left(s"error creating bulker stream: ${e.getMessage}")
            }
        }
    }
  }

  /** read.go:584-600: route one RECORD into its stream's running session. */
  private def processRecord(node: ObjectNode, size: Int): Unit = {
    val rec = obj(node, "record")
    val key = streamKey(text(rec, "namespace"), text(rec, "stream"))
    openStream(key) match {
      case Left(err) =>
        processed.get(key).foreach(_.registerError(s"error opening stream: $err"))
        log("jitsu", "ERROR", s"error opening stream: $err")
      case Right(stream) =>
        Option(rec.get("data")).collect { case o: ObjectNode => o }.foreach { data =>
          if (cfg.addMeta) {
            data.put("_jitsu_timestamp",
              java.time.Instant.ofEpochMilli(cfg.nowMs()).toString)
            ()
          }
          stream.consume(data.toString, size)
        }
    }
  }

  /** read.go:533-581: STREAM_STATUS lifecycle + ERROR traces. A stream-
    * scoped ERROR registers on the stream (with the reference's generic-
    * message fallback chain); an unscoped one becomes the run error. */
  private def processTrace(trace: ObjectNode, line: String): Unit =
    text(trace, "type") match {
      case "STREAM_STATUS" =>
        val ss = obj(trace, "stream_status")
        val desc = obj(ss, "stream_descriptor")
        val key = streamKey(text(desc, "namespace"), text(desc, "name"))
        val status = text(ss, "status")
        log("jitsu", "INFO", s"Stream '$key' received status: $status")
        status match {
          case "STARTED" =>
            openStream(key) match {
              case Left(err) =>
                processed.get(key).foreach(_.registerError(s"error opening stream: $err"))
                log("jitsu", "ERROR", s"error opening stream: $err")
              case Right(_) => ()
            }
          case "COMPLETE" | "INCOMPLETE" =>
            processed.get(key) match {
              case None => errprint(s"Stream '$key' is not in processed streams")
              case Some(stream) => closeOne(stream, complete = status == "COMPLETE", strict = false)
            }
          case _ => ()
        }
      case "ERROR" =>
        val er = obj(trace, "error")
        val desc = obj(er, "stream_descriptor")
        val key = streamKey(text(desc, "namespace"), text(desc, "name"))
        val message = text(er, "message")
        val internal = text(er, "internal_message")
        var errMsg = message
        if ((errMsg == SomethingWentWrongError || errMsg.isEmpty) && internal.nonEmpty)
          errMsg = internal
        if (key.nonEmpty) {
          errprint(s"TRACE ERROR '$key': $message")
          processed.get(key).foreach { stream =>
            var streamErr = errMsg
            if ((streamErr == SomethingWentWrongError || streamErr.isEmpty) &&
                stream.errorFromLogs.nonEmpty)
              streamErr = stream.errorFromLogs
            stream.registerError(streamErr)
          }
        } else {
          errprint(s"TRACE ERROR: $message")
          if (errMsg != SomethingWentWrongError && errMsg.nonEmpty) firstErr = errMsg
          else registerErr(errMsg)
        }
      case _ => log("jitsu", "INFO", s"TRACE: $line")
    }

  private def closeOne(stream: Active, complete: Boolean, strict: Boolean): Unit = {
    stream.close(complete, strict)
    if (stream.error.nonEmpty)
      errprint(s"Stream '${stream.name}' bulker commit failed: ${stream.error}")
    if (complete) {
      saveState(stream.name, stream.unsavedState)
      stream.unsavedState = None
    }
    log("jitsu", "INFO",
      s"Stream '${stream.name}' closed: status: ${stream.status} rows: ${stream.eventsCount}")
  }

  /** The deferred rollup (read.go:74-141): close still-running streams
    * (complete only if the run had no critical error — and NEVER on a
    * cancel, read.go:79-83), then emit the catalog-ordered status map and
    * the SUCCESS/PARTIAL/FAILED/CANCELLED verdict. A cancelled run maps
    * unprocessed catalog streams to a bare CANCELLED stat (read.go:90-92)
    * and, unless everything already succeeded or everything failed, rolls
    * up CANCELLED with "The task was cancelled" (read.go:110-119). */
  def finish(): RunResult = finish(cancelled = false)

  def finish(cancelled: Boolean): RunResult = {
    processed.values.filter(_.status == "RUNNING")
      .foreach(closeOne(_, complete = !cancelled && !isCriticalError, strict = true))
    val streams = catalogMap.keysIterator.map { key =>
      processed.get(key) match {
        case Some(st) =>
          StreamResult(key, st.status, st.eventsCount, st.error, st.bytesProcessed)
        case None if cancelled => StreamResult(key, "CANCELLED", 0L, "")
        case None => StreamResult(key, "FAILED", 0L,
          "Stream was not processed. Check logs for errors.")
      }
    }.toSeq
    val allSuccess = streams.nonEmpty && streams.forall(_.status == "SUCCESS")
    val allFailed = streams.nonEmpty && streams.forall(_.status == "FAILED")
    val status =
      if (streams.isEmpty) {
        if (cancelled) "CANCELLED" else if (firstErr.nonEmpty) "FAILED" else "SUCCESS"
      }
      else if (allSuccess) "SUCCESS"
      else if (allFailed) "FAILED"
      else if (cancelled) "CANCELLED"
      else "PARTIAL"
    val errorText =
      if (status == "SUCCESS") ""
      else if (status == "CANCELLED") "The task was cancelled"
      else if (firstErr.nonEmpty) s"ERROR: $firstErr"
      else ""
    RunResult(status, errorText, streams, savedStates.toSeq, logLines.toSeq,
      processedAny = processed.nonEmpty, firstError = firstErr)
  }

  // --- tiny jackson navigation helpers ---
  private def obj(n: JsonNode, f: String): ObjectNode =
    Option(n).flatMap(p => Option(p.get(f))).collect { case o: ObjectNode => o }
      .getOrElse(Airbyte.mapper.createObjectNode())
  private def text(n: JsonNode, f: String): String =
    Option(n).flatMap(p => Option(p.get(f))).filter(_.isTextual).map(_.asText).getOrElse("")
  private def jsonOf(n: JsonNode, f: String): Option[String] =
    Option(n).flatMap(p => Option(p.get(f))).filterNot(_.isNull).map(_.toString)
}

object AirbyteRunner {

  /** Sidecar configuration (main.go:123-131 env surface). */
  final case class Config(
      namespace: String = "",
      tableNamePrefix: String = "",
      toSameCase: Boolean = false,
      addMeta: Boolean = false,
      deduplicate: Boolean = true,
      fullSync: Boolean = false,
      /** the whole-run state loaded before the sync (read.go:660-676);
        * non-empty flips first-run incremental streams to Batch mode */
      initialState: String = "",
      packageName: String = "",
      logLevel: String = "INFO",
      /** checkpoint cap (read.go:369) — chunk commits bound driver memory */
      chunkEvents: Long = 500000L,
      nowMs: () => Long = () => System.currentTimeMillis())

  final case class StreamResult(stream: String, status: String, events: Long,
                                error: String, bytes: Long = 0L)

  final case class RunResult(
      status: String,
      error: String,
      streams: Seq[StreamResult],
      states: Seq[(String, String)],
      logs: Seq[(String, String, String)],
      /** read.go:85 — whether ANY stream was ever opened; the sidecar's
        * deferred rollup takes the bare bad-status path when none was */
      processedAny: Boolean = true,
      /** the run's first registered error, raw (read.go firstErr) */
      firstError: String = "")

  val GlobalStateKey = "_GLOBAL_STATE"
  val LegacyStateKey = "_LEGACY_STATE"
  val NamespaceVar = "${SOURCE_NAMESPACE}"
  val LegacyNamespace = "${LEGACY}"
  val InterruptError = "Stream was interrupted. Check logs for errors."
  val SomethingWentWrongError =
    "Something went wrong in the connector. See the logs for more details."
  /** read.go:725: connectors whose spurious error logs must not fail the run */
  val LenientPackages: Set[String] = Set("airbyte/source-netsuite")
}
