package graft.streaming

import org.apache.spark.sql.{DataFrame, Row}
import graft.SparkSuite

/** Retry/DLQ semantics (B4/S5): backoff ladder, due-filtering, per-batch
  * drain isolation, dead-letter after the retry budget
  * (abstract_consumer.go:84-87, retry_consumer.go:86-233, app_config.go:65). */
class RetrySpec extends SparkSuite {

  private def tmpQueue(): RetryQueue = {
    val base = java.nio.file.Files.createTempDirectory("graft_rq_").toString
    RetryQueue(s"$base/retry", s"$base/dlq")
  }

  private def batch(ids: Long*) =
    df("id BIGINT", ids.toSeq.map(Row(_)))

  test("backoff is min(5^n, 1440) minutes") {
    val p = RetryPolicy()
    assert((1 to 6).map(p.backoffMinutes) == Seq(5L, 25L, 125L, 625L, 1440L, 1440L))
  }

  test("a parked batch is not due before its retry_time") {
    val q = tmpQueue()
    val t0 = 1000000L
    q.enqueue(batch(1L), batchId = 7L, error = "boom", nowMs = t0)
    var loaded = 0
    q.drain(spark, t0 + 1000L)(_ => loaded += 1) // 1s later: backoff is 5min
    assert(loaded == 0)
    q.drain(spark, t0 + 5 * 60000L + 1)(_ => loaded += 1)
    assert(loaded == 1)
    // successful drain empties the queue
    q.drain(spark, t0 + 10 * 60000L)(_ => loaded += 1)
    assert(loaded == 1)
  }

  test("failing drains escalate retries and dead-letter at the budget") {
    val q = tmpQueue()
    val t0 = 0L
    q.enqueue(batch(1L, 2L), batchId = 1L, error = "constraint", nowMs = t0)
    val always = (_: DataFrame) => throw new RuntimeException("still broken")
    val end = MicroBatch.drainAll(spark, q, t0)(always)
    val dlq = q.dlq(spark).get
    assert(dlq.count() == 2)
    assert(canon(dlq.select("__retries", "__error")) ==
      Seq(Seq("5", "constraint"), Seq("5", "constraint")))
    // queue is empty after dead-lettering
    q.drain(spark, end + 100000L)(always)
    assert(q.dlq(spark).get.count() == 2)
  }

  test("mixed drain: a failing due batch requeues while a not-yet-due batch stays parked untouched") {
    // the r18 drain decides survivors per batch ID from one aggregate —
    // this pins the mixed case: requeueIds and notDueIds non-empty at once
    val q = tmpQueue()
    val t0 = 0L
    q.enqueue(batch(1L, 2L), batchId = 1L, error = "flaky", nowMs = t0)            // due at t0+5min
    q.enqueue(batch(9L), batchId = 2L, error = "later", nowMs = t0 + 20 * 60000L)  // due at t0+25min
    q.drain(spark, t0 + 5 * 60000L + 1)(_ => throw new RuntimeException("still broken"))
    val parked = q.queued(spark).get
    // batch 1 re-parked at depth 2 with a recomputed retry_time; batch 2
    // untouched (original depth AND original retry_time)
    assert(canon(parked.select("__batch_id", "__retries", "__retry_time")) == Seq(
      Seq("1", "2", (t0 + 5 * 60000L + 1 + 25 * 60000L).toString),
      Seq("1", "2", (t0 + 5 * 60000L + 1 + 25 * 60000L).toString),
      Seq("2", "1", (t0 + 20 * 60000L + 5 * 60000L).toString)))
    assert(q.dlq(spark).isEmpty)
  }

  test("per-batch isolation: one poisoned batch cannot fail another") {
    val q = tmpQueue()
    val t0 = 0L
    q.enqueue(batch(1L), batchId = 1L, error = "transient", nowMs = t0)
    q.enqueue(batch(666L), batchId = 2L, error = "poison", nowMs = t0)
    val loadedIds = scala.collection.mutable.Set.empty[Long]
    def load(dfIn: DataFrame): Unit = {
      val ids = dfIn.collect().toSeq.map(_.getLong(0))
      if (ids.contains(666L)) throw new RuntimeException("poison")
      loadedIds ++= ids
    }
    q.drain(spark, t0 + 5 * 60000L + 1)(load)
    assert(loadedIds == Set(1L)) // batch 1 loaded despite batch 2 failing
    // batch 2 is re-parked with retries=2, not dead-lettered yet
    assert(q.dlq(spark).isEmpty || q.dlq(spark).get.isEmpty)
    val parked = q.queued(spark).get
    assert(canon(parked.select("id", "__retries")) == Seq(Seq("666", "2")))
  }

  test("replayDlq: fixed batches drain out of the DLQ, still-broken batches stay dead") {
    val q = tmpQueue()
    // two batches dead-letter at exhausted depth through the real drain
    q.enqueue(batch(1L, 2L), batchId = 1L, error = "poison", nowMs = 0L, attempt = 5)
    q.enqueue(batch(666L), batchId = 2L, error = "poison", nowMs = 0L, attempt = 5)
    q.drain(spark, 1441L * 60000L)(_ => throw new RuntimeException("poison"))
    assert(q.dlq(spark).get.count() == 3)
    // the fix covers batch 1 only: one batch replays, 666 stays dead
    val loaded = scala.collection.mutable.Set.empty[Long]
    val n = q.replayDlq(spark) { rows =>
      val ids = rows.collect().toSeq.map(_.getLong(0))
      if (ids.contains(666L)) throw new RuntimeException("still broken")
      loaded ++= ids
    }
    assert(n == 1 && loaded == Set(1L, 2L))
    assert(canon(q.dlq(spark).get.select("id")) == Seq(Seq("666")))
    // replayed rows arrive WITHOUT bookkeeping columns
    q.replayDlq(spark) { rows =>
      assert(!rows.columns.exists(_.startsWith("__"))); ()
    }
    // the second replay fixed 666 too: the DLQ directory is gone
    assert(q.dlq(spark).isEmpty)
    assert(q.replayDlq(spark)(_ => fail("nothing left to replay")) == 0)
  }

  test("re-dead-letter after a partial replay does not duplicate the batch (r20: per-batch rewrite layout)") {
    val q = tmpQueue()
    q.enqueue(batch(1L), batchId = 1L, error = "poison", nowMs = 0L, attempt = 5)
    q.enqueue(batch(666L), batchId = 2L, error = "poison", nowMs = 0L, attempt = 5)
    q.drain(spark, 1441L * 60000L)(_ => throw new RuntimeException("poison"))
    // partial replay: batch 1 fixed, batch 2 still broken — the rewrite must
    // keep batch 2 in its per-batch b2 subfolder (a FLAT rewrite left it at
    // the root, where the re-dead-letter's b2 OVERWRITE could never replace
    // it and the recursive read returned both copies)
    assert(q.replayDlq(spark) { rows =>
      if (rows.collect().exists(_.getLong(0) == 666L))
        throw new RuntimeException("still broken")
    } == 1)
    assert(canon(q.dlq(spark).get.select("id")) == Seq(Seq("666")))
    // the operator re-drives batch 2 through the pipeline and it exhausts
    // its budget AGAIN: the per-batch OVERWRITE must REPLACE the copy that
    // survived the partial replay, not append beside it
    q.enqueue(batch(666L), batchId = 2L, error = "poison again", nowMs = 0L, attempt = 5)
    q.drain(spark, 1441L * 60000L)(_ => throw new RuntimeException("poison"))
    val dead = q.dlq(spark).get
    assert(dead.count() == 1, s"duplicate DLQ rows: ${dead.collect().toSeq}")
    assert(canon(dead.select("id", "__error")) == Seq(Seq("666", "poison again")))
  }

  test("interrupted staged swap: rows stranded in __next are recovered by readers") {
    val q = tmpQueue()
    q.enqueue(batch(1L), batchId = 1L, error = "poison", nowMs = 0L, attempt = 5)
    q.enqueue(batch(666L), batchId = 2L, error = "poison", nowMs = 0L, attempt = 5)
    q.drain(spark, 1441L * 60000L)(_ => throw new RuntimeException("poison"))
    assert(q.dlq(spark).get.count() == 2)
    // simulate the crash window between commitSwap's delete and rename: the
    // surviving rows exist ONLY at dlq__next, the main dir is gone
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(q.dlqDir), spark.sparkContext.hadoopConfiguration)
    val main = new org.apache.hadoop.fs.Path(q.dlqDir)
    val next = new org.apache.hadoop.fs.Path(q.dlqDir + "__next")
    q.dlq(spark).get.filter(org.apache.spark.sql.functions.col("id") === 666L)
      .write.parquet(next.toString)
    fs.delete(main, true)
    // every reader sees the stranded rows (the swap is finished on read) …
    assert(canon(q.dlq(spark).get.select("id")) == Seq(Seq("666")))
    assert(!fs.exists(next) && fs.exists(main))
    // … and replay drains them like a normally-committed DLQ
    val loaded = scala.collection.mutable.Set.empty[Long]
    assert(q.replayDlq(spark) { rows =>
      loaded ++= rows.collect().toSeq.map(_.getLong(0))
    } == 1 && loaded == Set(666L))
    assert(q.dlq(spark).isEmpty)
  }

  test("a stale __next from an interrupted partial replay is not resurrected by a later full replay") {
    val q = tmpQueue()
    q.enqueue(batch(1L), batchId = 1L, error = "poison", nowMs = 0L, attempt = 5)
    q.enqueue(batch(666L), batchId = 2L, error = "poison", nowMs = 0L, attempt = 5)
    q.drain(spark, 1441L * 60000L)(_ => throw new RuntimeException("poison"))
    // an earlier partial replay crashed AFTER staging __next but BEFORE the
    // swap: main dir intact, __next holds the then-remaining set
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(q.dlqDir), spark.sparkContext.hadoopConfiguration)
    q.dlq(spark).get.filter(org.apache.spark.sql.functions.col("id") === 666L)
      .write.parquet(q.dlqDir + "__next")
    // now a FULL replay succeeds for every batch → DLQ must end EMPTY, and
    // the stale staging dir must not be recoverable into phantom dead rows
    assert(q.replayDlq(spark)(_ => ()) == 2)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(q.dlqDir + "__next")))
    assert(q.dlq(spark).isEmpty)
  }

  test("a stale __next is dropped by a nothing-survives drain, not resurrected") {
    val q = tmpQueue()
    val t0 = 0L
    q.enqueue(batch(1L), batchId = 1L, error = "transient", nowMs = t0)
    // an earlier interrupted rewrite left a stale staging dir holding rows
    // that were since dead-lettered/loaded
    q.queued(spark).get.write.parquet(q.dir + "__next")
    var loads = 0
    q.drain(spark, t0 + 5 * 60000L + 1)(_ => loads += 1) // succeeds → queue empties
    assert(loads == 1)
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(q.dir), spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(q.dir)))
    assert(!fs.exists(new org.apache.hadoop.fs.Path(q.dir + "__next")))
    // nothing phantom comes back on the next drain
    q.drain(spark, t0 + 60 * 60000L)(_ => fail("phantom rows resurrected"))
  }

  test("replayed enqueue with an IDENTICAL stamp overwrites its own rows, never duplicates") {
    // the at-least-once case stamp normalization CANNOT see (hi == lo):
    // enqueue must be idempotent by layout — per-(batch, attempt) OVERWRITE
    val q = tmpQueue()
    val t0 = 0L
    q.enqueue(batch(1L, 2L), batchId = 1L, error = "flaky", nowMs = t0)
    q.enqueue(batch(1L, 2L), batchId = 1L, error = "flaky", nowMs = t0) // exact replay
    assert(q.queued(spark).get.count() == 2L)
    var rowsSeen = -1L
    q.drain(spark, t0 + 5 * 60000L + 1)(rows => rowsSeen = rows.count())
    assert(rowsSeen == 2L)
    assert(q.queued(spark).isEmpty && q.dlq(spark).isEmpty)
  }

  test("a replayed final drain overwrites the batch's DLQ rows, never appends a second copy") {
    val q = tmpQueue()
    q.enqueue(batch(1L, 2L), batchId = 1L, error = "poison", nowMs = 0L, attempt = 5)
    q.drain(spark, 1441L * 60000L)(_ => throw new RuntimeException("poison"))
    assert(q.dlq(spark).get.count() == 2)
    // at-least-once resurrection: the same exhausted batch is re-enqueued
    // and re-drained — its DLQ subfolder is overwritten, not appended
    q.enqueue(batch(1L, 2L), batchId = 1L, error = "poison", nowMs = 0L, attempt = 5)
    q.drain(spark, 1441L * 60000L)(_ => throw new RuntimeException("poison"))
    assert(q.dlq(spark).get.count() == 2)
  }

  test("replayed enqueue with a newer stamp: drain decides off the latest copy only") {
    // at-least-once foreachBatch can re-enqueue the same batch id with a
    // different attempt/now — the drain must normalize to the latest stamp,
    // not mix max(__retries) with stale rows
    val q = tmpQueue()
    val t0 = 0L
    q.enqueue(batch(1L, 2L), batchId = 1L, error = "flaky", nowMs = t0, attempt = 1)
    q.enqueue(batch(1L, 2L), batchId = 1L, error = "flaky", nowMs = t0 + 60000L, attempt = 2)
    var rowsSeen = -1L
    // due per the LATEST stamp (t0+60s + 25min); drain succeeds
    q.drain(spark, t0 + 60000L + 25 * 60000L + 1)(rows => rowsSeen = rows.count())
    assert(rowsSeen == 2L) // the stale duplicate copy was dropped, not loaded
    assert(q.queued(spark).isEmpty && q.dlq(spark).isEmpty)
  }

  test("replayed enqueue: dead-letter carries the latest retry depth, no duplicate rows") {
    val q = tmpQueue()
    q.enqueue(batch(1L, 2L), batchId = 1L, error = "poison", nowMs = 0L, attempt = 4)
    q.enqueue(batch(1L, 2L), batchId = 1L, error = "poison", nowMs = 0L, attempt = 5)
    q.drain(spark, 1441L * 60000L)(_ => throw new RuntimeException("poison"))
    val dlq = q.dlq(spark).get
    assert(canon(dlq.select("id", "__retries")) == Seq(Seq("1", "5"), Seq("2", "5")))
  }

  test("replayed enqueue before due time: the parked queue is scrubbed to one copy") {
    val q = tmpQueue()
    val t0 = 0L
    q.enqueue(batch(7L), batchId = 3L, error = "flaky", nowMs = t0, attempt = 1)
    q.enqueue(batch(7L), batchId = 3L, error = "flaky", nowMs = t0 + 60000L, attempt = 2)
    q.drain(spark, t0 + 1000L)(_ => fail("nothing is due yet"))
    val parked = q.queued(spark).get
    assert(canon(parked.select("id", "__retries", "__retry_time")) ==
      Seq(Seq("7", "2", (t0 + 60000L + 25 * 60000L).toString)))
  }

  test("transient failure: retry succeeds and nothing dead-letters") {
    val q = tmpQueue()
    q.enqueue(batch(1L), batchId = 1L, error = "transient", nowMs = 0L)
    val tripped = new java.util.concurrent.atomic.AtomicBoolean(false)
    var loads = 0
    def load(dfIn: DataFrame): Unit = {
      if (tripped.compareAndSet(false, true)) throw new RuntimeException("once")
      loads += 1
    }
    MicroBatch.drainAll(spark, q, 0L)(load)
    assert(loads == 1)
    assert(q.dlq(spark).isEmpty || q.dlq(spark).get.isEmpty)
  }
}
