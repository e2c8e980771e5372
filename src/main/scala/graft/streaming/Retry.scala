package graft.streaming

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Retry policy (B4): `retry_time = now + min(base^attempt, cap)` minutes —
  * exponential backoff base 5 min capped at 24 h, 5 attempts then
  * dead-letter (abstract_consumer.go:84-87, app_config.go:65,69-71). */
final case class RetryPolicy(maxRetries: Int = 5, baseMin: Int = 5, capMin: Int = 1440) {
  def backoffMinutes(attempt: Int): Long =
    math.min(math.pow(baseMin.toDouble, attempt.toDouble).toLong, capMin.toLong)
  def backoffMs(attempt: Int): Long = backoffMinutes(attempt) * 60000L
}

/** Durable retry queue + dead-letter queue as parquet folders — the Spark
  * rendering of the reference's per-destination `retry.<dest>` topic and
  * `dead.<dest>` topic (bulkerapp/app/retry_consumer.go:86-233,
  * batch_consumer.go:269-401).
  *
  * Queue rows are the failed batch's rows plus bookkeeping columns
  * (`__batch_id`, `__retries`, `__retry_time`, `__error`) — the parquet twin
  * of the reference's Kafka headers `retries`/`retry_time`/`error`. Rows are
  * drained per ORIGINAL batch (the reference retries whole message groups
  * against the same destination), so one permanently-poisoned batch cannot
  * drag unrelated batches' retry counts up.
  *
  * Scale posture: the queue holds FAILURES, not the firehose — the
  * per-batch-id drain loop on the driver is control-plane work over a
  * handful of ids, while each batch's rows load through the distributed
  * writer. All clock reads are injected (`nowMs`) so tests and replays are
  * deterministic.
  */
final case class RetryQueue(dir: String, dlqDir: String,
                            policy: RetryPolicy = RetryPolicy()) {

  val MetaCols = Seq("__batch_id", "__retries", "__retry_time", "__error")

  /** Park a failed batch for retry `attempt` (1-based). IDEMPOTENT under
    * at-least-once replay: the batch lands in a per-(batch, attempt)
    * subfolder with OVERWRITE — a replayed foreachBatch that re-enqueues
    * the same batch with the SAME stamp replaces its own rows instead of
    * blindly appending a duplicate copy (the per-batchId-partition
    * OVERWRITE rule for file-sink state); a replay with a DIFFERENT stamp
    * lands beside it and [[drain]]'s stamp normalization keeps only the
    * latest copy. */
  def enqueue(batch: DataFrame, batchId: Long, error: String,
              nowMs: Long, attempt: Int = 1): Unit =
    batch
      .withColumn("__batch_id", lit(batchId))
      .withColumn("__retries", lit(attempt))
      .withColumn("__retry_time", lit(nowMs + policy.backoffMs(attempt)))
      .withColumn("__error", lit(error.take(500)))
      // failure batches are micro-batch sized — don't scatter them into one
      // tiny parquet object per core
      .coalesce(8)
      .write.mode(SaveMode.Overwrite).parquet(s"$dir/b${batchId}_a$attempt")

  private def fsOf(spark: SparkSession, path: String): org.apache.hadoop.fs.FileSystem =
    org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(path), spark.sparkContext.hadoopConfiguration)

  /** Commit a staged queue rewrite: the new queue is fully materialized at
    * `path__next` BEFORE the old dir drops, and the rename's result is
    * CHECKED — a false return would otherwise strand the queue in `__next`
    * silently. A crash between the delete and the rename is recovered by
    * [[readOrEmpty]]'s fallback. */
  private def commitSwap(fs: org.apache.hadoop.fs.FileSystem,
                         next: org.apache.hadoop.fs.Path,
                         main: org.apache.hadoop.fs.Path): Unit = {
    fs.delete(main, true)
    if (!fs.rename(next, main)) {
      // a concurrent reader may have RECOVERED the swap between our delete
      // and rename (readOrEmpty's crash-recovery path) — then the rename
      // fails but the swap is already complete; only an actually-stranded
      // staging dir is an error
      if (!(fs.exists(main) && !fs.exists(next)))
        throw new java.io.IOException(
          s"queue swap failed: could not rename $next to $main — staged rows remain at $next")
    }
  }

  private def readOrEmpty(spark: SparkSession, path: String): Option[DataFrame] = {
    // recover an interrupted staged swap FIRST (crash between delete and
    // rename left the rows only in __next): finish the rename before
    // reading, so no reader ever sees the queue as spuriously empty. A
    // failed recovery rename must THROW, not read-as-empty — silence here
    // is exactly the bookkeeping loss the staged swap exists to prevent.
    val fs = fsOf(spark, path)
    val main = new org.apache.hadoop.fs.Path(path)
    val next = new org.apache.hadoop.fs.Path(path + "__next")
    if (!fs.exists(main) && fs.exists(next) && !fs.rename(next, main) &&
        !fs.exists(main)) // a racing commitSwap/reader may have finished it
      throw new java.io.IOException(s"could not recover interrupted queue swap at $next")
    if (fs.exists(main))
      // recursive: live queues mix flat rewrite files with per-(batch,
      // attempt) enqueue subfolders (no k=v partition dirs anywhere here)
      try Some(spark.read.option("recursiveFileLookup", "true").parquet(path))
      catch { case _: Throwable => None }
    else None
  }

  /** Staged queue rewrite: fan-out sized to the surviving rows, fully
    * materialized at `__next`, committed via [[commitSwap]] — ONE protocol
    * for every rewrite site. */
  private def rewriteQueue(spark: SparkSession, frame: DataFrame, rows: Long): Unit = {
    val files = math.max(1L, math.min(8L, rows / 500000L + 1)).toInt
    val nextPath = new org.apache.hadoop.fs.Path(dir + "__next")
    frame.coalesce(files).write.mode(SaveMode.Overwrite).parquet(nextPath.toString)
    commitSwap(fsOf(spark, dir), nextPath, new org.apache.hadoop.fs.Path(dir))
  }

  /** Drain every batch whose `__retry_time` has come: re-attempt `load` per
    * original batch id; still-failing rows re-enqueue with `__retries`+1, or
    * move to the DLQ once `maxRetries` is exhausted
    * (retry_consumer.go:86-233). Not-yet-due rows stay parked untouched —
    * the reference re-queues them transactionally; the parquet form rewrites
    * the queue folder via a staged swap. */
  def drain(spark: SparkSession, nowMs: Long)(load: DataFrame => Unit): Unit = {
    val qOpt = readOrEmpty(spark, dir)
    if (qOpt.isEmpty) return
    val qRaw = qOpt.get.persist()
    var qNorm: Option[DataFrame] = None
    try {
      // control-plane: ONE aggregate yields every batch's retry depth, due
      // time, and row count — due-ness, survivors, dead-letters, and the
      // rewrite's file fan-out are all decided driver-side from it, bounded
      // by #failed batches, never by row volume. enqueue stamps
      // `__retries`/`__retry_time` as whole-batch literals, so min==max per
      // batch id — EXCEPT when an at-least-once replayed enqueue appended
      // the same batch twice with a different attempt/now; the aggregate
      // detects that (hi != lo) so the drain never decides off mixed stamps.
      def stats(f: DataFrame): Array[(Long, Int, Long, Long, Boolean)] =
        f.groupBy("__batch_id").agg(
            max(struct(col("__retries"), col("__retry_time"))).as("__hi"),
            min(struct(col("__retries"), col("__retry_time"))).as("__lo"),
            count(lit(1)).as("__n"))
          .collect().map { r =>
            val hi = r.getStruct(1); val lo = r.getStruct(2)
            (r.getLong(0), hi.getInt(0), hi.getLong(1), r.getLong(3),
             hi.getInt(0) != lo.getInt(0) || hi.getLong(1) != lo.getLong(1))
          }.sortBy(_._1)
      val raw = stats(qRaw)
      val mixed = raw.filter(_._5)
      val (q, info) =
        if (mixed.isEmpty) (qRaw, raw)
        else {
          // the stamp is a whole-batch literal, so it discriminates the
          // duplicate copies: keep only the LATEST attempt's rows (max
          // (__retries, __retry_time)), dropping the stale replay copy
          // outright, and re-derive the bookkeeping from the normalized
          // frame — otherwise max()-based decisions would dead-letter rows
          // below the retry budget or requeue not-yet-due rows early.
          val stale = mixed.map { case (id, r, t, _, _) =>
            col("__batch_id") === id &&
              (col("__retries") =!= r || col("__retry_time") =!= t)
          }.reduce(_ || _)
          val qn = qRaw.filter(!stale).persist()
          qNorm = Some(qn)
          (qn, stats(qn))
        }
      val due = info.filter(_._3 <= nowMs)
      if (due.isEmpty) {
        // nothing to drain — but if normalization dropped stale duplicate
        // rows, scrub them from the parked queue now so `queued()`
        // read-backs and future drains see one copy per batch
        if (mixed.nonEmpty) rewriteQueue(spark, q, info.map(_._4).sum)
        return
      }
      val failedIds = due.map(_._1).filterNot { id =>
        val rows = q.filter(col("__batch_id") === id)
        try { load(rows.drop(MetaCols: _*)); true }
        catch { case _: Throwable => false }
      }.toSet
      // exhausted batches dead-letter WITH their bookkeeping (error, count)
      // — into per-batch OVERWRITE subfolders, so a replayed drain that
      // dead-letters the same batch again replaces its rows instead of
      // appending a duplicate copy (same idempotence rule as enqueue; the
      // loop is control-plane, bounded by #dead batches)
      val deadIds = due.collect {
        case (id, r, _, _, _) if failedIds.contains(id) && r >= policy.maxRetries => id }
      deadIds.foreach { id =>
        q.filter(col("__batch_id") === id)
          .coalesce(8).write.mode(SaveMode.Overwrite).parquet(s"$dlqDir/b$id")
      }
      val requeueIds = due.collect {
        case (id, r, _, _, _) if failedIds.contains(id) && r < policy.maxRetries => id }
      val notDueIds = info.filter(_._3 > nowMs).map(_._1)
      val fs = fsOf(spark, dir)
      if (requeueIds.isEmpty && notDueIds.isEmpty) {
        // nothing survives: the queue ends EMPTY — drop the folder instead
        // of staging an empty rewrite (one less Spark job per final round).
        // A stale __next from an earlier interrupted swap must go too, and
        // must go FIRST: a crash between the two deletes must never leave
        // only __next behind, or readOrEmpty's crash-recovery rename would
        // resurrect already-dead-lettered/loaded rows as a live queue.
        fs.delete(new org.apache.hadoop.fs.Path(dir + "__next"), true)
        fs.delete(new org.apache.hadoop.fs.Path(dir), true)
        ()
      } else {
        val requeued = q.filter(col("__batch_id").isInCollection(
            if (requeueIds.isEmpty) Seq(-1L) else requeueIds.toSeq))
          .withColumn("__retries", col("__retries") + 1)
          .withColumn("__retry_time",
            lit(nowMs) + expr(s"least(pow(${policy.baseMin}, __retries), ${policy.capMin})").cast("long") * 60000L)
        val notDue = q.filter(col("__batch_id").isInCollection(
            if (notDueIds.isEmpty) Seq(-1L) else notDueIds.toSeq))
        // surviving rows are already counted: size the rewrite's fan-out to
        // the data instead of a fixed 8 tiny files per round
        val keep = (requeueIds ++ notDueIds).toSet
        val keepRows = info.collect { case (id, _, _, n, _) if keep(id) => n }.sum
        rewriteQueue(spark, notDue.unionByName(requeued), keepRows)
      }
    } finally { qRaw.unpersist(); qNorm.foreach(_.unpersist()); () }
  }

  /** Dead-lettered rows (empty frame with no rows if nothing ever died). */
  def dlq(spark: SparkSession): Option[DataFrame] = readOrEmpty(spark, dlqDir)

  /** Currently-parked retry rows (due or not), with bookkeeping — the
    * read-back surface behind `/failed/:dest?status=retry`. */
  def queued(spark: SparkSession): Option[DataFrame] = readOrEmpty(spark, dir)

  /** Re-drive dead-lettered batches through `load` after an operator fixed
    * the underlying fault — the ops flow the reference serves as
    * `/failed/:dest?status=dead` read-back (router.go:370-433) followed by
    * a re-submit through the ingest path; here it is one call, idempotent
    * when `load` is a pk merge. Replay goes per ORIGINAL batch (like
    * [[drain]]); batches that load are REMOVED from the DLQ via a staged
    * swap, batches that still fail stay dead. Returns the number of
    * batches successfully replayed. The per-batch-id loop is control-plane
    * (bounded by #dead batches); each batch's rows load distributed. */
  def replayDlq(spark: SparkSession)(load: DataFrame => Unit): Int = {
    val dOpt = readOrEmpty(spark, dlqDir)
    if (dOpt.isEmpty) return 0
    val dead = dOpt.get.persist()
    try {
      val ids = dead.select("__batch_id").distinct()
        .collect().map(_.getLong(0)).sorted
      val replayed = ids.filter { id =>
        val rows = dead.filter(col("__batch_id") === id)
        try { load(rows.drop(MetaCols: _*)); true }
        catch { case _: Throwable => false }
      }
      if (replayed.nonEmpty) {
        val fs = fsOf(spark, dlqDir)
        if (replayed.length == ids.length) {
          // drop any STALE staging dir from an earlier interrupted partial
          // replay FIRST, then the main dir — a crash between the deletes
          // must never leave only __next behind, or readOrEmpty's recovery
          // would resurrect already-replayed batches from it
          fs.delete(new org.apache.hadoop.fs.Path(dlqDir + "__next"), true)
          fs.delete(new org.apache.hadoop.fs.Path(dlqDir), true)
          ()
        } else {
          // preserve the per-batch `b$id` subfolder layout in the rewrite
          // (r19 ADVICE): a FLAT rewrite would strand root-level copies
          // that a later re-dead-letter of the same batch — which writes
          // into its `b$id` subfolder with OVERWRITE — could never
          // replace, duplicating the batch on the recursive read. Stale
          // staged content must go first so an interrupted earlier swap
          // cannot leak foreign batches into this commit; the per-batch
          // loop stays control-plane (bounded by #still-dead batches).
          val nextPath = new org.apache.hadoop.fs.Path(dlqDir + "__next")
          fs.delete(nextPath, true)
          ids.filterNot(replayed.contains).foreach { id =>
            dead.filter(col("__batch_id") === id)
              .coalesce(8).write.mode(SaveMode.Overwrite)
              .parquet(s"$nextPath/b$id")
          }
          commitSwap(fs, nextPath, new org.apache.hadoop.fs.Path(dlqDir))
        }
      }
      replayed.length
    } finally { dead.unpersist(); () }
  }
}
