package graft.streaming

import java.nio.charset.StandardCharsets.UTF_8

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.sink.JdbcSink

/** The failover-reprocessing data plane
  * (admin/failover_reprocessor.go:114-260, reprocessing-worker/main.go,
  * admin/reprocessing_db.go / reprocessing_db_schema.go): when the ingest
  * edge spools events to timestamped NDJSON failover files, a reprocessing
  * job lists them, fans them out over workers, replays each line through
  * the message filters and stream→connection resolution, produces the
  * surviving messages, and keeps job/worker bookkeeping — with a
  * (current_file, current_line) cursor a later job can resume from via the
  * config's `start_file`/`start_line` (the reference carries those fields
  * end-to-end, failover_reprocessor.go:43-44, and its UI offers them;
  * this engine implements the resume they exist for).
  *
  * Spark-first shape: the reference runs one POD per worker scanning its
  * files sequentially (main.go:144-196). Here the unit of parallelism is
  * the same — ONE TASK PER FILE (failover files are bounded rotation
  * chunks, kafkabase/failover_logger.go:421-423, and gzip members are
  * unsplittable anyway), so a 10k-file spool becomes a 10k-task scan on
  * any cluster — but everything after the line reader is declarative
  * DataFrame work: JSON parse, filter matrix, broadcast stream-map
  * resolution, and ONE map-side-combined aggregate for the worker
  * counters. The per-file reader is the legitimate per-partition
  * imperative case (exact 1-based line numbers per file are the cursor
  * unit; no splittable-format line numbering exists).
  *
  * Reference accounting semantics preserved (main.go:379-428,501-569):
  * every scanned line counts `total_lines`; a JSON parse failure counts
  * `error` and moves on; filtered-out messages count `skipped`; admitted
  * messages batch up and each sent batch adds its WHOLE length to
  * `success` while per-message resolution failures (unknown stream, no
  * destinations) ALSO count `error` — so success counts admissions, not
  * deliveries, exactly like the reference. The job aggregate is the SUM
  * over worker rows (reprocessing_db.go:82-89); completion derives from
  * worker statuses (failover_reprocessor.go:373-437).
  */
object FailoverReprocessor {

  final case class FileItem(path: String, size: Long, modified: Long)

  final case class StreamDef(id: String, slug: String, destinations: Seq[String])

  /** ReprocessingJobConfig (failover_reprocessor.go:36-50) minus the
    * env-bound members (S3 paths; local spool paths serve both here). */
  final case class JobConfig(
      path: String,
      streamIds: Seq[String] = Nil,
      connectionIds: Seq[String] = Nil,
      files: Seq[String] = Nil,
      dryRun: Boolean = false,
      startFile: String = "",
      startLine: Long = 0L,
      batchSize: Int = 1000,
      dateFrom: Option[java.time.Instant] = None,
      dateTo: Option[java.time.Instant] = None,
      // accepted and recorded like the reference (failover_reprocessor
      // .go:46,49) whose worker never reads them either (main.go)
      retryAttempts: Int = 0,
      limit: Long = 0L)

  final case class Job(id: String, totalFiles: Int, totalWorkers: Int,
                       files: Seq[FileItem])

  /** Mid-flight cancellation point for a run: `worker`'s scan of `cutFile`
    * stops after `cutLine` (its last periodic status write), its later
    * files never start, every other worker finishes — the state a
    * CancelJob leaves behind (failover_reprocessor.go:491-530 deletes the
    * K8s job; worker rows keep their last written status). */
  final case class CancelAt(worker: Int, cutFile: String, cutLine: Long)

  // K8s Indexed-Job worker cap (failover_reprocessor.go:150-156)
  val MaxWorkers = 100

  def workerCount(nFiles: Int): Int = math.max(1, math.min(nFiles, MaxWorkers))

  private val TsRe = raw"(\d{4}_\d{2}_\d{2}T\d{2}_\d{2}_\d{2})".r

  /** Timestamp from a failover filename (failover_reprocessor.go:622-640;
    * pattern YYYY_MM_DDTHH_MM_SS anywhere in the basename), as epoch ms. */
  def parseFilenameTimestamp(path: String): Option[Long] = {
    val base = path.substring(path.lastIndexOf('/') + 1)
    TsRe.findFirstIn(base).map { s =>
      val f = java.time.format.DateTimeFormatter.ofPattern("yyyy_MM_dd'T'HH_mm_ss")
      java.time.LocalDateTime.parse(s, f).toInstant(java.time.ZoneOffset.UTC)
        .toEpochMilli
    }
  }

  /** Recursive spool listing: `.ndjson` / `.ndjson.gz` only, sorted by
    * path for a deterministic processing order
    * (failover_reprocessor.go:584-620). */
  def listFiles(spark: SparkSession, dir: String): Seq[FileItem] = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = Seq.newBuilder[FileItem]
    val it = fs.listFiles(p, true)
    while (it.hasNext) {
      val st = it.next()
      val s = st.getPath.toUri.getPath
      if (s.endsWith(".ndjson") || s.endsWith(".ndjson.gz"))
        out += FileItem(s, st.getLen, st.getModificationTime)
    }
    // CODE-POINT order, not String's UTF-16 order: worker assignment
    // (file_idx % nW) and the resume cut must agree with any SQL replay
    // of ORDER BY path on supplementary-char filenames (see Bpe.cpCompare)
    out.result().sortWith((a, b) => graft.llm.Bpe.cpCompare(a.path, b.path) < 0)
  }

  /** Date-range overlap filter (failover_reprocessor.go:642-673): a file
    * is dropped when its filename-creation time minus 24h is after
    * `dateTo` (later batches may still carry period events — the
    * reference's slack), when its fs mtime is before `dateFrom`, or when
    * its filename carries no parseable timestamp. */
  def filterByDateRange(files: Seq[FileItem],
                        from: Option[java.time.Instant],
                        to: Option[java.time.Instant]): Seq[FileItem] =
    if (from.isEmpty && to.isEmpty) files
    else files.filter { f =>
      parseFilenameTimestamp(f.path) match {
        case None => false // unparseable filename: skipped with a warning
        case Some(created) =>
          to.forall(t => created - 86400000L <= t.toEpochMilli) &&
            from.forall(fr => f.modified >= fr.toEpochMilli)
      }
    }

  /** Explicit file-list filter: full path or basename matches
    * (failover_reprocessor.go:677-705). */
  def filterByList(files: Seq[FileItem], list: Seq[String]): Seq[FileItem] =
    if (list.isEmpty) files
    else {
      val keys = list.iterator.map(_.trim).filter(_.nonEmpty)
        .flatMap(f => Seq(f, f.substring(f.lastIndexOf('/') + 1))).toSet
      files.filter(f =>
        keys.contains(f.path) ||
          keys.contains(f.path.substring(f.path.lastIndexOf('/') + 1)))
    }

  /** List + date filter + file-list filter + resume cut: files strictly
    * before `startFile` are already done per the recorded cursor
    * (failover_reprocessor.go:228-259; the `start_file` leg is the resume
    * those config fields exist for). */
  def prepareFiles(spark: SparkSession, cfg: JobConfig): Seq[FileItem] = {
    var fs = listFiles(spark, cfg.path)
    fs = filterByDateRange(fs, cfg.dateFrom, cfg.dateTo)
    fs = filterByList(fs, cfg.files)
    if (cfg.startFile.nonEmpty)
      fs = fs.filter(f => graft.llm.Bpe.cpCompare(f.path, cfg.startFile) >= 0)
    fs
  }

  // ---- bookkeeping (reprocessing_db.go over the Derby stand-in) ---------

  object Db {
    val JobsTable = "REPROCESSING_JOBS"
    val WorkersTable = "REPROCESSING_WORKERS"

    /** reprocessing_db_schema.go:12-59, Derby dialect (no JSONB/TZ). */
    def init(sink: JdbcSink): Unit = sink.withConnection { c =>
      def ensure(ddl: String): Unit =
        try sink.exec(c, ddl)
        catch { case e: java.sql.SQLException if e.getSQLState == "X0Y32" => () }
      ensure(s"""CREATE TABLE "$JobsTable" (
        id VARCHAR(64) PRIMARY KEY, config VARCHAR(32672) NOT NULL,
        status VARCHAR(32) NOT NULL, created_at TIMESTAMP NOT NULL,
        started_at TIMESTAMP, completed_at TIMESTAMP,
        total_files INT DEFAULT 0, total_workers INT DEFAULT 0,
        error VARCHAR(2048))""")
      // ensure swallows X0Y32, so a jobs table created by an OLDER build
      // (config was VARCHAR(4096) before r16) keeps its narrow column while
      // insertJob's require claims 32672 is fine — widen in place on every
      // init; Derby allows growing a VARCHAR via ALTER COLUMN SET DATA TYPE
      // and the statement is a no-op at the current width
      try sink.exec(c, s"""ALTER TABLE "$JobsTable" ALTER COLUMN config
        SET DATA TYPE VARCHAR(32672)""")
      catch { case _: java.sql.SQLException => () } // pre-DDL-support Derby: leave as created
      ensure(s"""CREATE TABLE "$WorkersTable" (
        job_id VARCHAR(64) NOT NULL, worker_index INT NOT NULL,
        status VARCHAR(32) NOT NULL, updated_at TIMESTAMP NOT NULL,
        completed_at TIMESTAMP, current_file VARCHAR(512),
        current_line BIGINT DEFAULT 0, assigned_files INT DEFAULT 0,
        processed_files INT DEFAULT 0, total_lines BIGINT DEFAULT 0,
        success_count BIGINT DEFAULT 0, error_count BIGINT DEFAULT 0,
        skipped_count BIGINT DEFAULT 0, processed_bytes BIGINT DEFAULT 0,
        error VARCHAR(2048), PRIMARY KEY (job_id, worker_index))""")
    }

    def insertJob(sink: JdbcSink, id: String, config: String, totalFiles: Int,
                  totalWorkers: Int): Unit = sink.withConnection { c =>
      // the column is Derby's VARCHAR ceiling (the read-back GROUP BYs it,
      // which a CLOB can't); diagnose an oversize explicit-file-list config
      // instead of surfacing Derby's opaque 22001 truncation error
      require(config.length <= 32672,
        s"job config JSON is ${config.length} chars (max 32672) — " +
          "trim the explicit files list or use start_file/date filters")
      val ps = c.prepareStatement(s"""INSERT INTO "$JobsTable"
        (id, config, status, created_at, total_files, total_workers)
        VALUES (?, ?, 'pending', CURRENT_TIMESTAMP, ?, ?)""")
      try {
        ps.setString(1, id); ps.setString(2, config)
        ps.setInt(3, totalFiles); ps.setInt(4, totalWorkers)
        ps.executeUpdate(); ()
      } finally ps.close()
    }

    def updateJobStatus(sink: JdbcSink, id: String, status: String,
                        error: String = ""): Unit = sink.withConnection { c =>
      val terminal = Set("completed", "failed", "cancelled").contains(status)
      val ps = c.prepareStatement(s"""UPDATE "$JobsTable" SET status = ?,
        error = ?, started_at = COALESCE(started_at, CURRENT_TIMESTAMP),
        completed_at = ${if (terminal) "CURRENT_TIMESTAMP" else "completed_at"}
        WHERE id = ?""")
      try { ps.setString(1, status); ps.setString(2, error); ps.setString(3, id)
        ps.executeUpdate(); () } finally ps.close()
    }

    /** Terminal completed/failed write that only lands while the job is
      * still active — the reference's completion monitor only processes
      * running jobs (failover_reprocessor.go:373-437), so a run() that
      * finishes AFTER a CancelJob must not overwrite 'cancelled'. (Cancel
      * itself stays an unconditional write: the reference allows
      * cancelling a failed job, CancelJob:500-503.) */
    def finishJob(sink: JdbcSink, id: String, status: String,
                  error: String = ""): Unit = sink.withConnection { c =>
      val ps = c.prepareStatement(s"""UPDATE "$JobsTable" SET status = ?,
        error = ?, started_at = COALESCE(started_at, CURRENT_TIMESTAMP),
        completed_at = CURRENT_TIMESTAMP
        WHERE id = ? AND status IN ('pending', 'running')""")
      try { ps.setString(1, status); ps.setString(2, error); ps.setString(3, id)
        ps.executeUpdate(); () } finally ps.close()
    }

    /** One pending row per worker with its assigned-file count
      * (reprocessing_db.go:210-235). */
    def initializeWorkers(sink: JdbcSink, jobId: String,
                          filesPerWorker: Seq[Int]): Unit = sink.inTx { c =>
      val ps = c.prepareStatement(s"""INSERT INTO "$WorkersTable"
        (job_id, worker_index, status, updated_at, assigned_files)
        VALUES (?, ?, 'pending', CURRENT_TIMESTAMP, ?)""")
      try filesPerWorker.zipWithIndex.foreach { case (n, i) =>
        ps.setString(1, jobId); ps.setInt(2, i); ps.setInt(3, n)
        ps.executeUpdate()
      } finally ps.close()
    }

    final case class WorkerRow(workerIndex: Int, status: String,
        currentFile: String, currentLine: Long, processedFiles: Int,
        totalLines: Long, success: Long, error: Long, skipped: Long,
        processedBytes: Long, lastError: String, assignedFiles: Int = 0)

    /** The worker's self-reported upsert (main.go:571-599). */
    def upsertWorker(sink: JdbcSink, jobId: String, w: WorkerRow): Unit =
      sink.withConnection { c =>
        val up = c.prepareStatement(s"""UPDATE "$WorkersTable" SET status = ?,
          updated_at = CURRENT_TIMESTAMP, current_file = ?, current_line = ?,
          processed_files = ?, total_lines = ?, success_count = ?,
          error_count = ?, skipped_count = ?, processed_bytes = ?, error = ?,
          completed_at = CASE WHEN ? IN ('completed', 'failed', 'cancelled')
            THEN CURRENT_TIMESTAMP ELSE completed_at END
          WHERE job_id = ? AND worker_index = ?""")
        try {
          up.setString(1, w.status); up.setString(2, w.currentFile)
          up.setLong(3, w.currentLine); up.setInt(4, w.processedFiles)
          up.setLong(5, w.totalLines); up.setLong(6, w.success)
          up.setLong(7, w.error); up.setLong(8, w.skipped)
          up.setLong(9, w.processedBytes); up.setString(10, w.lastError)
          up.setString(11, w.status)
          up.setString(12, jobId); up.setInt(13, w.workerIndex)
          up.executeUpdate(); ()
        } finally up.close()
      }

    /** All worker rows for a job (reprocessing_db.go:294-357). */
    def workers(sink: JdbcSink, jobId: String): Seq[WorkerRow] =
      sink.withConnection { c =>
        val ps = c.prepareStatement(s"""SELECT worker_index, status,
          current_file, current_line, processed_files, total_lines,
          success_count, error_count, skipped_count, processed_bytes, error,
          assigned_files
          FROM "$WorkersTable" WHERE job_id = ? ORDER BY worker_index""")
        try {
          ps.setString(1, jobId)
          val rs = ps.executeQuery()
          val out = Seq.newBuilder[WorkerRow]
          while (rs.next()) out += WorkerRow(rs.getInt(1), rs.getString(2),
            Option(rs.getString(3)).getOrElse(""), rs.getLong(4), rs.getInt(5),
            rs.getLong(6), rs.getLong(7), rs.getLong(8), rs.getLong(9),
            rs.getLong(10), Option(rs.getString(11)).getOrElse(""),
            rs.getInt(12))
          out.result()
        } finally ps.close()
      }

    final case class JobRow(id: String, status: String, totalFiles: Int,
        totalWorkers: Int, processedFiles: Long, totalLines: Long,
        success: Long, error: Long, skipped: Long, processedBytes: Long)

    /** Everything the admin HTTP surface renders for one job: the job row
      * (config JSON, lifecycle timestamps, error), the SUM-over-workers
      * aggregates, and the cursor of the most recently updated RUNNING
      * worker (reprocessing_db.go:51-121). */
    final case class FullJob(id: String, status: String, config: String,
        createdAt: java.sql.Timestamp, startedAt: Option[java.sql.Timestamp],
        completedAt: Option[java.sql.Timestamp], error: String,
        totalFiles: Int, totalWorkers: Int, processedFiles: Long,
        totalLines: Long, success: Long, errorCount: Long, skipped: Long,
        processedBytes: Long, currentFile: String, currentLine: Long)

    def fullJob(sink: JdbcSink, jobId: String): Option[FullJob] =
      sink.withConnection { c =>
        val ps = c.prepareStatement(s"""SELECT j.id, j.status, j.config,
          j.created_at, j.started_at, j.completed_at, j.error,
          j.total_files, j.total_workers,
          COALESCE(SUM(w.processed_files), 0), COALESCE(SUM(w.total_lines), 0),
          COALESCE(SUM(w.success_count), 0), COALESCE(SUM(w.error_count), 0),
          COALESCE(SUM(w.skipped_count), 0), COALESCE(SUM(w.processed_bytes), 0)
          FROM "$JobsTable" j LEFT JOIN "$WorkersTable" w ON w.job_id = j.id
          WHERE j.id = ?
          GROUP BY j.id, j.status, j.config, j.created_at, j.started_at,
                   j.completed_at, j.error, j.total_files, j.total_workers""")
        val cur = c.prepareStatement(s"""SELECT current_file, current_line
          FROM "$WorkersTable" WHERE job_id = ? AND status = 'running'
          ORDER BY updated_at DESC FETCH FIRST 1 ROWS ONLY""")
        try {
          ps.setString(1, jobId)
          val rs = ps.executeQuery()
          if (!rs.next()) None
          else {
            cur.setString(1, jobId)
            val cs = cur.executeQuery()
            val (cf, cl) =
              if (cs.next()) (Option(cs.getString(1)).getOrElse(""), cs.getLong(2))
              else ("", 0L)
            Some(FullJob(rs.getString(1), rs.getString(2),
              Option(rs.getString(3)).getOrElse("{}"), rs.getTimestamp(4),
              Option(rs.getTimestamp(5)), Option(rs.getTimestamp(6)),
              Option(rs.getString(7)).getOrElse(""), rs.getInt(8), rs.getInt(9),
              rs.getLong(10), rs.getLong(11), rs.getLong(12), rs.getLong(13),
              rs.getLong(14), rs.getLong(15), cf, cl))
          }
        } finally { ps.close(); cur.close() }
      }

    /** All jobs, newest first (reprocessing_jobs_created_at_idx order;
      * id DESC breaks same-tick ties deterministically). */
    def listJobIds(sink: JdbcSink): Seq[String] = sink.withConnection { c =>
      val ps = c.prepareStatement(
        s"""SELECT id FROM "$JobsTable" ORDER BY created_at DESC, id DESC""")
      try {
        val rs = ps.executeQuery()
        val out = Seq.newBuilder[String]
        while (rs.next()) out += rs.getString(1)
        out.result()
      } finally ps.close()
    }

    /** Job read-back with the aggregated worker stats
      * (reprocessing_db.go:51-121: COALESCE(SUM(...), 0) over workers). */
    def getJob(sink: JdbcSink, jobId: String): JobRow = sink.withConnection { c =>
      val ps = c.prepareStatement(s"""SELECT j.id, j.status, j.total_files,
        j.total_workers,
        COALESCE(SUM(w.processed_files), 0), COALESCE(SUM(w.total_lines), 0),
        COALESCE(SUM(w.success_count), 0), COALESCE(SUM(w.error_count), 0),
        COALESCE(SUM(w.skipped_count), 0), COALESCE(SUM(w.processed_bytes), 0)
        FROM "$JobsTable" j LEFT JOIN "$WorkersTable" w ON w.job_id = j.id
        WHERE j.id = ?
        GROUP BY j.id, j.status, j.total_files, j.total_workers""")
      try {
        ps.setString(1, jobId)
        val rs = ps.executeQuery()
        require(rs.next(), s"reprocessing job $jobId not found")
        JobRow(rs.getString(1), rs.getString(2), rs.getInt(3), rs.getInt(4),
          rs.getLong(5), rs.getLong(6), rs.getLong(7), rs.getLong(8),
          rs.getLong(9), rs.getLong(10))
      } finally ps.close()
    }
  }

  // ---- job lifecycle ----------------------------------------------------

  /** StartJob (failover_reprocessor.go:114-225, minus the K8s submission):
    * prepare the file list, cap the worker count, round-robin files across
    * workers, insert the job + pending worker rows, mark running. */
  def startJob(spark: SparkSession, sink: JdbcSink, id: String,
               cfg: JobConfig): Job = {
    require(cfg.path.nonEmpty, "path must be provided")
    val batch = if (cfg.batchSize <= 0) 1000 else cfg.batchSize
    val files = prepareFiles(spark, cfg)
    require(files.nonEmpty, "no files found to process")
    val nW = workerCount(files.size)
    val perWorker = new Array[Int](nW)
    files.indices.foreach(i => perWorker(i % nW) += 1)
    Db.init(sink)
    Db.insertJob(sink, id, configJson(cfg.copy(batchSize = batch)),
      files.size, nW)
    Db.initializeWorkers(sink, id, perWorker.toSeq)
    Db.updateJobStatus(sink, id, "running")
    Job(id, files.size, nW, files)
  }

  // every string goes through the JSON escaper: paths/ids/files arrive from
  // the HTTP surface, and one raw quote would corrupt the stored config that
  // jobJson re-embeds verbatim into every /jobs response
  private def configJson(cfg: JobConfig): String = {
    def js(s: String) = graft.Verify.jsonStr(s)
    def arr(xs: Seq[String]) = xs.map(js).mkString("[", ",", "]")
    s"""{"local_path":${js(cfg.path)},"stream_ids":${arr(cfg.streamIds)},""" +
      s""""connection_ids":${arr(cfg.connectionIds)},"files":${arr(cfg.files)},""" +
      s""""dry_run":${cfg.dryRun},"start_file":${js(cfg.startFile)},""" +
      s""""start_line":${cfg.startLine},"batch_size":${cfg.batchSize},""" +
      s""""retry_attempts":${cfg.retryAttempts},"limit":${cfg.limit}}"""
  }

  // PERMISSIVE from_json yields a null-FIELDED struct on malformed input,
  // not a null struct — the corrupt-record column is the parse-error signal
  private val MsgSchema = StructType(Seq(
    StructField("messageCreated", StringType),
    StructField("origin", StructType(Seq(
      StructField("sourceId", StringType), StructField("slug", StringType)))),
    StructField("event", StructType(Seq(
      StructField("event_id", LongType)))),
    StructField("_corrupt", StringType)))

  private val LineSchema = StructType(Seq(
    StructField("file_idx", IntegerType, nullable = false),
    StructField("path", StringType, nullable = false),
    StructField("line_no", LongType, nullable = false),
    StructField("line", StringType, nullable = false)))

  // sentinel line_no for a file that could not be opened/decoded at all:
  // the reference's "failed to process file after N attempts" outcome
  // (main.go:180-184) — one error, no line counts, file still "processed"
  private[streaming] val FileFailLine = -1L

  /** One task per file: sequential line scan with exact 1-based numbering
    * (the cursor unit), gzip-aware, reader closed on exhaustion. An
    * unopenable/undecodable file (missing, corrupt gzip header) yields ONE
    * sentinel row instead of failing the job — the reference logs, counts
    * one error, and moves to the next file (main.go:144-191); mid-file
    * faults stay task failures, which Spark retries from the top of the
    * file exactly like the reference's retry loop rolls back counts and
    * rescans (main.go:149-177 — the final successful pass is the only one
    * that counts, by construction here). */
  private def readLines(spark: SparkSession,
                        files: Seq[FileItem]): DataFrame = {
    val items = files.zipWithIndex.map { case (f, i) => (i, f.path) }
    val rdd = spark.sparkContext
      .parallelize(items, math.max(items.size, 1))
      .flatMap { case (idx, path) =>
        def sentinel(e: Throwable) = Iterator.single(Row(idx, path,
          FileFailLine, Option(e.getMessage).getOrElse(e.toString)))
        val opened =
          try {
            val hp = new org.apache.hadoop.fs.Path(path)
            val fs = hp.getFileSystem(new org.apache.hadoop.conf.Configuration())
            Right(fs.open(hp): java.io.InputStream)
          } catch { case e: java.io.IOException => Left(e) }
        opened match {
          case Left(e) => sentinel(e)
          case Right(raw) =>
            try {
              val in = if (path.endsWith(".gz"))
                new java.util.zip.GZIPInputStream(raw) else raw
              val br = new java.io.BufferedReader(
                new java.io.InputStreamReader(in, UTF_8))
              // a task killed mid-file must not leak the stream (close() is
              // idempotent, so the exhaustion-path close below stays)
              Option(org.apache.spark.TaskContext.get())
                .foreach(_.addTaskCompletionListener[Unit](_ => br.close()))
              var n = 0L
              new Iterator[Row] {
                private var nextLine = br.readLine()
                override def hasNext: Boolean = {
                  if (nextLine == null) br.close()
                  nextLine != null
                }
                override def next(): Row = {
                  val l = nextLine
                  nextLine = br.readLine()
                  n += 1
                  Row(idx, path, n, l)
                }
              }
            } catch {
              // a corrupt header (bad gzip magic) must not leak the raw
              // stream that already opened
              case e: java.io.IOException =>
                try raw.close() catch { case _: java.io.IOException => () }
                sentinel(e)
            }
        }
      }
    spark.createDataFrame(rdd, LineSchema)
  }

  final case class RunResult(delivered: DataFrame, workers: Seq[Db.WorkerRow],
                             job: Db.JobRow)

  /** The data plane for one job: scan → parse → filter → resolve →
    * account → bookkeeping. `delivered` carries one row per produced
    * message: (path, worker_index, line_no, event_id, connection_ids,
    * batch_idx) — batch_idx is the admitted-rank within the file divided
    * by batch_size, the reference's send unit (main.go:400-410).
    * `cancelAt` simulates the CancelJob kill point (see [[CancelAt]]). */
  def run(spark: SparkSession, sink: JdbcSink, job: Job, cfg: JobConfig,
          streams: Seq[StreamDef],
          cancelAt: Option[CancelAt] = None): RunResult = {
    val nW = job.totalWorkers
    val batch = if (cfg.batchSize <= 0) 1000 else cfg.batchSize
    val cutFileIdx = cancelAt.map(c => job.files.indexWhere(_.path == c.cutFile))
    cutFileIdx.foreach(i => require(i >= 0, "cancelAt.cutFile not in job"))

    var lines = readLines(spark, job.files)
      .withColumn("worker", pmod(col("file_idx"), lit(nW)).cast(IntegerType))
    // resume: within start_file only lines past the recorded cursor run
    // (earlier files were cut in prepareFiles); skipped-by-cursor lines
    // are not scanned at all, so no counter sees them. The file-fail
    // sentinel (line_no = -1) must survive the cut: a start file that is
    // unreadable NOW still owes its one error
    if (cfg.startFile.nonEmpty)
      lines = lines.filter(col("path") =!= cfg.startFile ||
        col("line_no") > cfg.startLine ||
        col("line_no") === lit(FileFailLine))
    // cancellation: the cut worker's cut file stops after cutLine and its
    // later files never start; every other worker is unaffected
    cancelAt.foreach { c =>
      val ci = cutFileIdx.get
      lines = lines.filter(col("worker") =!= c.worker ||
        col("file_idx") < ci ||
        (col("file_idx") === ci && col("line_no") <= c.cutLine))
    }

    // the resolution map: the reference worker keys streams by id
    // (repository.go:50) and looks up sourceId-else-slug (main.go:519-523);
    // this engine also keys the slug so slug-only messages resolve. Map
    // semantics preserved: one entry per key, a stream whose id equals its
    // slug contributes ONE key (never a join-duplicating pair), and a
    // cross-stream key collision resolves LAST-Wins like Go map insertion
    val byKey = scala.collection.mutable.LinkedHashMap
      .empty[String, (String, String, Boolean)]
    streams.foreach { s =>
      val dests = s.destinations.mkString(",")
      val hasDest = s.destinations.nonEmpty
      Seq(s.id, s.slug).filter(_.nonEmpty).distinct
        .foreach(k => byKey(k) = (k, dests, hasDest))
    }
    val streamRows = byKey.values.toSeq
    import spark.implicits._
    val streamDf = streamRows.toDF("stream_key", "dests", "has_dest")

    val fromS = cfg.dateFrom.map(i => java.sql.Timestamp.from(i))
    val toS = cfg.dateTo.map(i => java.sql.Timestamp.from(i))
    val explicitConns = cfg.connectionIds.mkString(",")
    val idFilter = cfg.streamIds

    val parsed = lines
      // an unreadable FILE contributes one sentinel row: one error, no
      // line/cursor counts (the retry-exhausted outcome, main.go:180-184)
      .withColumn("file_fail", col("line_no") === lit(FileFailLine))
      .withColumn("msg", from_json(col("line"), MsgSchema,
        Map("mode" -> "PERMISSIVE", "columnNameOfCorruptRecord" -> "_corrupt")))
      .withColumn("parse_err", !col("file_fail") &&
        (col("msg").isNull || col("msg._corrupt").isNotNull))
      .withColumn("stream_key",
        when(length(col("msg.origin.sourceId")) > 0, col("msg.origin.sourceId"))
          .otherwise(col("msg.origin.slug")))
      // RFC3339 messageCreated; an unparseable/absent one passes the date
      // filters (main.go:473-497 ignores parse failures)
      .withColumn("mc", to_timestamp(col("msg.messageCreated"),
        "yyyy-MM-dd'T'HH:mm:ssXXX"))
    // stream_ids filter (main.go:451-471): matches sourceId OR slug; a
    // message with no origin — or one whose present field misses while the
    // other field is absent (isin(NULL) is NULL, not false) — fails the
    // filter when one is configured, landing in `skipped` like the
    // reference, never in a three-valued-logic hole that no counter sees
    val streamPass =
      if (idFilter.isEmpty) lit(true)
      else coalesce(
        (col("msg.origin.sourceId").isin(idFilter: _*) ||
          col("msg.origin.slug").isin(idFilter: _*)) &&
          col("msg.origin").isNotNull, lit(false))
    val datePass =
      fromS.map(f => col("mc").isNull || col("mc") >= lit(f)).getOrElse(lit(true)) &&
        toS.map(t => col("mc").isNull || col("mc") <= lit(t)).getOrElse(lit(true))

    val flagged = parsed
      .withColumn("admitted",
        !col("file_fail") && !col("parse_err") && streamPass && datePass)
      .withColumn("skipped",
        !col("file_fail") && !col("parse_err") && !(streamPass && datePass))
      // resolution (main.go:501-547): explicit connection_ids win; else the
      // broadcast stream map; unknown stream / no destinations → error
      .join(broadcast(streamDf), Seq("stream_key"), "left")
      .withColumn("conn_ids",
        if (explicitConns.nonEmpty) when(col("admitted"), lit(explicitConns))
        else when(col("admitted") && col("has_dest"), col("dests")))
      .withColumn("resolve_err",
        if (explicitConns.nonEmpty) lit(false)
        else col("admitted") && !coalesce(col("has_dest"), lit(false)))
      .persist() // two consumers: the counters aggregate and the delivery

    // one map-side-combined aggregate → ≤100 worker rows of control plane
    val statRows = flagged.groupBy("worker").agg(
      sum(when(!col("file_fail"), 1L).otherwise(0L)).as("total_lines"),
      sum(when(col("file_fail") || col("parse_err") || col("resolve_err"),
        1L).otherwise(0L)).as("errs"),
      sum(when(col("skipped"), 1L).otherwise(0L)).as("skips"),
      sum(when(col("admitted"), 1L).otherwise(0L)).as("succ"),
      max(struct(col("path"), greatest(col("line_no"), lit(0L)))).as("cursor"),
      max(when(col("file_fail"),
        concat(lit("failed to process file "), col("path"), lit(": "),
          col("line")))).as("last_err"))
      .collect().map { r =>
        (r.getInt(0), (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getStruct(5).getString(0), r.getStruct(5).getLong(1),
          Option(r.getString(6)).getOrElse("")))
      }.toMap

    // delivered = admitted ∧ resolved, with the reference's batch index —
    // the rank among the file's ADMITTED lines / batch_size (resolve
    // failures sit inside batches too, main.go:501-547 `continue`s them)
    val delivered = flagged
      // dry run: messages process and COUNT but never produce
      // (main.go:555-560 skips only the Kafka send)
      .filter(col("admitted") && lit(!cfg.dryRun))
      .withColumn("batch_idx",
        ((row_number().over(org.apache.spark.sql.expressions.Window
          .partitionBy("path").orderBy("line_no")) - 1) / batch)
          .cast(LongType))
      .filter(col("conn_ids").isNotNull)
      .select(col("path"), col("worker"), col("line_no"),
        col("msg.event.event_id").as("event_id"), col("conn_ids"),
        col("batch_idx"))
      .localCheckpoint(true)
    flagged.unpersist()

    // per-worker bookkeeping: completed files/bytes come from the file
    // list (a cancelled worker's in-flight file is NOT counted —
    // main.go:186-190 increments after the file finishes)
    val rows = (0 until nW).map { w =>
      val assigned = job.files.zipWithIndex.filter(_._2 % nW == w)
      val isCut = cancelAt.exists(_.worker == w)
      val done = cutFileIdx match {
        case Some(ci) if isCut => assigned.filter(_._2 < ci)
        case _ => assigned
      }
      val (tl, er, sk, su, cf, cl, le) = statRows.getOrElse(w,
        (0L, 0L, 0L, 0L, "", 0L, ""))
      Db.WorkerRow(w,
        status = if (isCut) "running" else "completed",
        currentFile = cf, currentLine = cl,
        processedFiles = done.size,
        totalLines = tl, success = su, error = er, skipped = sk,
        processedBytes = done.map(_._1.size).sum,
        lastError = le)
    }
    rows.foreach(Db.upsertWorker(sink, job.id, _))

    // completion from worker statuses (failover_reprocessor.go:373-437);
    // a cancel marks the JOB cancelled and leaves worker rows as written
    // (failover_reprocessor.go:491-530). The completed write is guarded:
    // it must not undo a cancellation that raced this run
    if (cancelAt.isDefined) Db.updateJobStatus(sink, job.id, "cancelled")
    else Db.finishJob(sink, job.id, "completed")

    RunResult(delivered, Db.workers(sink, job.id), Db.getJob(sink, job.id))
  }
}
