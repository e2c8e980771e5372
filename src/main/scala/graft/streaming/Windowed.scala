package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

/** Event-time aggregation primitives for the streaming layer — the
  * Structured Streaming surface a loader grows once it computes anything
  * beyond pass-through: watermarked tumbling windows (bounded state — the
  * analog of the reference's merge window, D3, applied to stream state
  * instead of a MERGE scan) and keyed running state via
  * `mapGroupsWithState` (B7-style accounting that survives across
  * micro-batches).
  */
object Windowed {

  /** Tumbling event-time window counts with a watermark: state for windows
    * older than the watermark is dropped, so long-running streams hold
    * bounded state no matter the key universe. Works on streaming AND batch
    * frames (batch ignores the watermark). */
  def windowedCounts(events: DataFrame, tsCol: String, keyCol: String,
                     windowDur: String, watermarkDelay: String): DataFrame =
    events
      .withWatermark(tsCol, watermarkDelay)
      .groupBy(window(col(tsCol), windowDur).as("w"), col(keyCol))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").as("window_start"), col(keyCol), col("n"))

  /** Watermarked stream-stream interval join: left events match right
    * events with the same key whose timestamp falls in
    * `[left.ts - boundMs, left.ts]` — the enrichment join both sides of
    * which are streams (Spark buffers each side's state and the time bound
    * + watermarks let it EVICT: without them stream-stream state grows
    * forever). Right columns are prefixed to avoid collisions. */
  def intervalJoin(left: DataFrame, right: DataFrame, keyCol: String,
                   tsCol: String, boundMs: Long, watermarkDelay: String,
                   rightPrefix: String = "r_"): DataFrame = {
    val l = left.withWatermark(tsCol, watermarkDelay).as("l")
    // rename BEFORE the watermark so it attaches to the surviving attribute
    val r = right.columns
      .foldLeft(right)((df, c) => df.withColumnRenamed(c, s"$rightPrefix$c"))
      .withWatermark(s"$rightPrefix$tsCol", watermarkDelay).as("r")
    l.join(r,
      col(s"l.$keyCol") === col(s"r.$rightPrefix$keyCol") &&
        col(s"r.$rightPrefix$tsCol") >= col(s"l.$tsCol") - expr(s"INTERVAL $boundMs MILLISECONDS") &&
        col(s"r.$rightPrefix$tsCol") <= col(s"l.$tsCol"))
  }

  /** Per-key running event count — keyed state that persists across
    * micro-batches (checkpointed with the query). The minimal shape of
    * every `mapGroupsWithState` accumulator: read state, fold the batch's
    * rows, write state, emit. */
  def runningCounts(events: Dataset[(Long, Long)]): Dataset[(Long, Long)] = {
    import events.sparkSession.implicits._
    events.groupByKey(_._1)
      .mapGroupsWithState[Long, (Long, Long)](GroupStateTimeout.NoTimeout) {
        (key: Long, rows: Iterator[(Long, Long)], state: GroupState[Long]) =>
          val n = state.getOption.getOrElse(0L) + rows.size
          state.update(n)
          (key, n)
      }
  }

  /** Session assembly with an inactivity gap, on a per-key event stream:
    * events within `gapMs` of the previous one extend the session; a
    * larger gap closes it and starts the next. Emits CLOSED sessions plus
    * the still-open tail per key (flatMapGroupsWithState shape — the
    * custom-state operator the built-in windows can't express). */
  final case class Session(key: Long, n: Long, startMs: Long, endMs: Long)

  /** `emitOpenTail`: in streaming mode the still-open session stays in
    * state (it may extend in a later micro-batch — production flushes it
    * via a state timeout); in BATCH mode each key's rows all arrive in one
    * call, so emitting the tail yields the COMPLETE session set — the form
    * the correctness oracle compares. */
  def sessionize(events: Dataset[(Long, Long)], gapMs: Long,
                 emitOpenTail: Boolean = false): Dataset[Session] = {
    import events.sparkSession.implicits._
    events.groupByKey(_._1)
      .flatMapGroupsWithState[Session, Session](
        org.apache.spark.sql.streaming.OutputMode.Append(),
        GroupStateTimeout.NoTimeout) {
        (key: Long, rows: Iterator[(Long, Long)], state: GroupState[Session]) =>
          val sorted = rows.map(_._2).toSeq.sorted
          var open = state.getOption
          val closed = scala.collection.mutable.ArrayBuffer.empty[Session]
          sorted.foreach { ts =>
            open match {
              case Some(s) if ts - s.endMs <= gapMs =>
                open = Some(s.copy(n = s.n + 1, endMs = ts))
              case Some(s) =>
                closed += s
                open = Some(Session(key, 1, ts, ts))
              case None =>
                open = Some(Session(key, 1, ts, ts))
            }
          }
          open.foreach(state.update)
          if (emitOpenTail) (closed ++ open).iterator else closed.iterator
      }
  }
}
