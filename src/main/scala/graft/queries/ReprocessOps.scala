package graft.queries

import java.nio.charset.StandardCharsets.UTF_8

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.core.Tables
import graft.sink.JdbcSink
import graft.sql.DerbyDialect
import graft.streaming.FailoverReprocessor

/** P13 — the failover-reprocessing data plane end-to-end
  * (admin/failover_reprocessor.go + reprocessing-worker/main.go +
  * reprocessing_db.go), driven over a REAL spool: a deterministic
  * failover-file fixture is written from the events table (six timestamped
  * NDJSON rotation chunks, one gzipped, malformed lines interleaved,
  * deterministic mtimes), then
  *
  *  1. job j1 runs with the full filter matrix — stream_ids matching
  *     sourceId OR slug, an RFC3339 date window on messageCreated,
  *     unknown-stream and no-destination resolution errors, batch
  *     accounting — and is CANCELLED mid-flight with worker 3 parked
  *     mid-file at its last written cursor;
  *  2. job j2 resumes exactly from that recorded (current_file,
  *     current_line) cursor via the config's files + start_file/start_line
  *     fields — the flow those fields exist for — so the union of both
  *     jobs' deliveries covers the cut file exactly once;
  *
  * and the output unions the delivered messages of both jobs (file, line,
  * batch index, resolved connection ids) with the Derby worker/job
  * bookkeeping read back through the reference's aggregate query. The
  * ORACLE recomputes every row from the events table alone — line
  * numbering incl. malformed interleaving, the filter matrix, resolution,
  * batch ranks, the cut point (ceil(n/2) of the cut file), cursors, and
  * both jobs' counter rollups.
  *
  * Scale shape: the scan is one task per rotation file (bounded chunks,
  * gzip-unsplittable anyway) feeding declarative filters, one broadcast
  * stream-map join, and ONE map-side aggregate for worker counters; the
  * fixture writer and the ≤100-row bookkeeping are control plane. */
object ReprocessOps {

  private val Root = "/tmp/graft_p13"
  private val Spool = s"$Root/spool"
  private val JdbcUrl = "jdbc:derby:memory:graft_p13;create=true"

  private val Root14 = "/tmp/graft_p14"
  private val Spool14 = s"$Root14/spool"
  private val JdbcUrl14 = "jdbc:derby:memory:graft_p14;create=true"

  private val StreamFilter = Seq("src0", "slug1", "ghost", "src2")
  private val From = java.time.Instant.parse("2024-01-02T00:00:00Z")
  private val To = java.time.Instant.parse("2024-01-12T00:00:00Z")
  private val BatchSize = 50

  private val Streams = Seq(
    FailoverReprocessor.StreamDef("src0", "slug0", Seq("c-a", "c-b")),
    FailoverReprocessor.StreamDef("src1", "slug1", Seq("c-one")),
    FailoverReprocessor.StreamDef("src2", "slug2", Nil), // no destinations
    FailoverReprocessor.StreamDef("src3", "slug3", Seq("c-three")))

  private def base(p: String): String = p.substring(p.lastIndexOf('/') + 1)

  /** Write the deterministic spool: 600 sampled events across six files
    * keyed by event_id % 6, sorted by event_id, a malformed line after
    * every event_id % 97 == 0 event, file 4 gzipped, mtime = filename
    * timestamp + 2 days. Control-plane apparatus (like b11's spool). */
  private def writeSpool(s: SparkSession, d: String,
                         root: String = Root): Map[Int, (String, Long)] = {
    val spool = s"$root/spool"
    val fsys = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(spool), s.sparkContext.hadoopConfiguration)
    fsys.delete(new org.apache.hadoop.fs.Path(root), true)
    fsys.mkdirs(new org.apache.hadoop.fs.Path(spool))
    val sample = Tables.events(s, d)
      .filter(col("event_id") % 7 === 0)
      .select(col("event_id"), col("user_id"),
        date_format(col("ts"), "yyyy-MM-dd'T'HH:mm:ss'Z'").as("mc"))
      .orderBy("event_id").limit(600)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    val byFile = sample.groupBy(_._1 % 6)
    require(byFile.size == 6 && byFile.values.forall(_.length >= 8),
      s"$root fixture: event_id %6 cells missing/thin (${byFile.view.mapValues(_.length).toMap})")
    (0 to 5).map { k =>
      val name = s"kafka_failover_2024_01_0${k + 1}T05_00_00.ndjson" +
        (if (k == 4) ".gz" else "")
      val path = s"$spool/$name"
      val hp = new org.apache.hadoop.fs.Path(path)
      val rawOut: java.io.OutputStream = fsys.create(hp, true)
      val out = if (k == 4) new java.util.zip.GZIPOutputStream(rawOut) else rawOut
      val w = new java.io.BufferedWriter(new java.io.OutputStreamWriter(out, UTF_8))
      var n = 0L
      byFile(k.toLong).sortBy(_._1).foreach { case (eid, uid, mc) =>
        val sk = uid % 4
        val ghost = eid % 31 == 0
        val sid = if (eid % 5 == 0) "" else if (ghost) "ghost" else s"src$sk"
        val slug = if (ghost) "ghost-slug" else s"slug$sk"
        w.write(s"""{"messageCreated":"$mc","origin":{"sourceId":"$sid",""" +
          s""""slug":"$slug"},"event":{"event_id":$eid}}""")
        w.newLine(); n += 1
        if (eid % 97 == 0) { w.write("not json {"); w.newLine(); n += 1 }
      }
      w.close()
      val created = FailoverReprocessor.parseFilenameTimestamp(path).get
      fsys.setTimes(hp, created + 2L * 86400000L, -1L)
      k -> (path, n)
    }.toMap
  }

  def p13FailoverReprocess(s: SparkSession, d: String): DataFrame = {
    val files = writeSpool(s, d)
    val (cutPath, n3) = files(3)
    val cutLine = (n3 + 1) / 2
    require(cutLine < n3, s"p13 fixture: cut file too thin ($n3 lines)")
    val sink = JdbcSink(JdbcUrl, DerbyDialect, maxWriteConnections = 4)
    sink.withConnection { c =>
      Seq(FailoverReprocessor.Db.WorkersTable,
          FailoverReprocessor.Db.JobsTable).foreach { t =>
        try sink.exec(c, s"""DROP TABLE "$t"""")
        catch { case _: java.sql.SQLException => () }
      }
    }

    val cfg1 = FailoverReprocessor.JobConfig(path = Spool,
      streamIds = StreamFilter, batchSize = BatchSize,
      dateFrom = Some(From), dateTo = Some(To))
    val job1 = FailoverReprocessor.startJob(s, sink, "p13j1", cfg1)
    val r1 = FailoverReprocessor.run(s, sink, job1, cfg1, Streams,
      cancelAt = Some(FailoverReprocessor.CancelAt(3, cutPath, cutLine)))

    // resume: the cancelled worker's recorded cursor becomes the config
    val cfg2 = cfg1.copy(files = Seq(base(cutPath)),
      startFile = cutPath, startLine = cutLine)
    val job2 = FailoverReprocessor.startJob(s, sink, "p13j2", cfg2)
    val r2 = FailoverReprocessor.run(s, sink, job2, cfg2, Streams)

    def msgs(r: FailoverReprocessor.RunResult, tag: String): DataFrame = r.delivered
      .select(lit("msg").as("kind"), lit(tag).as("job"),
        col("worker").cast(LongType).as("w"), col("event_id").as("k"),
        concat(
          element_at(split(col("path"), "/"), -1), lit(":"), col("line_no"),
          lit("@"), col("batch_idx"), lit(">"), col("conn_ids")).as("tag"))

    val metaSchema = StructType(Seq(
      StructField("kind", StringType), StructField("job", StringType),
      StructField("w", LongType), StructField("k", LongType),
      StructField("tag", StringType)))
    def workerRows(r: FailoverReprocessor.RunResult, tag: String): Seq[Row] =
      r.workers.map { w =>
        Row("worker", tag, w.workerIndex.toLong, w.totalLines,
          s"${w.status}|${w.processedFiles}|${w.success}|${w.error}|" +
            s"${w.skipped}|${base(w.currentFile)}:${w.currentLine}")
      }
    def jobRow(r: FailoverReprocessor.RunResult, tag: String): Row = {
      val j = r.job
      Row("job", tag, j.totalWorkers.toLong, j.totalLines,
        s"${j.status}|${j.totalFiles}|${j.processedFiles}|${j.success}|" +
          s"${j.error}|${j.skipped}")
    }
    import scala.jdk.CollectionConverters._
    val meta = s.createDataFrame(
      (workerRows(r1, "j1") ++ workerRows(r2, "j2") :+
        jobRow(r1, "j1") :+ jobRow(r2, "j2")).asJava, metaSchema)
    msgs(r1, "j1").unionByName(msgs(r2, "j2")).unionByName(meta)
  }

  /** The fixture-replay CTE prefix shared by the p13 and p14 oracles:
    * sample → line numbering (malformed interleave) → filenames → the
    * admitted/resolution matrix. */
  private val FixtureCtes = s"""smp AS MATERIALIZED (
      SELECT event_id, user_id, date_trunc('second', ts) AS mc
      FROM events WHERE event_id % 7 = 0 ORDER BY event_id LIMIT 600),
    ln AS MATERIALIZED (
      SELECT *, row_number() OVER (PARTITION BY fk ORDER BY event_id, sub)
               AS line_no
      FROM (
        SELECT event_id % 6 AS fk, event_id, user_id % 4 AS sk,
               (event_id % 31 = 0) AS ghost, (event_id % 5 = 0) AS slugonly,
               mc, 0 AS sub, FALSE AS mal
        FROM smp
        UNION ALL
        SELECT event_id % 6, event_id, user_id % 4, FALSE, FALSE,
               NULL, 1, TRUE
        FROM smp WHERE event_id % 97 = 0) u),
    names AS (
      SELECT fk, 'kafka_failover_2024_01_0' || (fk + 1) || 'T05_00_00.ndjson'
             || CASE WHEN fk = 4 THEN '.gz' ELSE '' END AS fname
      FROM (SELECT DISTINCT fk FROM ln) f),
    res AS MATERIALIZED (
      SELECT c.*, CASE c.stream_key
          WHEN 'src0' THEN 'c-a,c-b' WHEN 'slug0' THEN 'c-a,c-b'
          WHEN 'src1' THEN 'c-one'   WHEN 'slug1' THEN 'c-one'
          WHEN 'src3' THEN 'c-three' WHEN 'slug3' THEN 'c-three'
          ELSE NULL END AS conn_ids
      FROM (
        SELECT l.*, n.fname,
          (NOT l.mal)
            AND (l.source_id IN ('src0', 'slug1', 'ghost', 'src2')
                 OR l.slug IN ('src0', 'slug1', 'ghost', 'src2'))
            AND l.mc >= TIMESTAMP '2024-01-02 00:00:00'
            AND l.mc <= TIMESTAMP '2024-01-12 00:00:00' AS admitted,
          CASE WHEN l.slugonly THEN l.slug ELSE l.source_id END AS stream_key
        FROM (
          SELECT *,
            CASE WHEN mal THEN NULL WHEN slugonly THEN ''
                 WHEN ghost THEN 'ghost' ELSE 'src' || sk END AS source_id,
            CASE WHEN mal THEN NULL
                 WHEN ghost THEN 'ghost-slug' ELSE 'slug' || sk END AS slug
          FROM ln) l
        JOIN names n USING (fk)) c)"""

  /** Exact replay from the events table: fixture derivations (file key,
    * stream identity, malformed interleave, line numbering), the j1/j2
    * scan legs split at the cut line, the filter/resolution matrix, batch
    * ranks over admitted lines, and both rollups. */
  private val p13Oracle = s"""
    WITH $FixtureCtes,
    cut AS (SELECT CAST((max(line_no) + 1) // 2 AS BIGINT) AS cl
            FROM ln WHERE fk = 3),
    j1 AS MATERIALIZED (
      SELECT r.*, fk AS wrk FROM res r
      WHERE fk <> 3 OR line_no <= (SELECT cl FROM cut)),
    j2 AS MATERIALIZED (
      SELECT r.*, 0 AS wrk FROM res r
      WHERE fk = 3 AND line_no > (SELECT cl FROM cut)),
    m1 AS (
      SELECT 'msg' AS kind, 'j1' AS job, CAST(wrk AS BIGINT) AS w,
             event_id AS k,
             fname || ':' || line_no || '@'
               || CAST((rn - 1) // $BatchSize AS BIGINT)
               || '>' || conn_ids AS tag
      FROM (SELECT *, row_number() OVER (PARTITION BY fk ORDER BY line_no)
                     AS rn FROM j1 WHERE admitted) a
      WHERE conn_ids IS NOT NULL),
    m2 AS (
      SELECT 'msg' AS kind, 'j2' AS job, CAST(wrk AS BIGINT) AS w,
             event_id AS k,
             fname || ':' || line_no || '@'
               || CAST((rn - 1) // $BatchSize AS BIGINT)
               || '>' || conn_ids AS tag
      FROM (SELECT *, row_number() OVER (PARTITION BY fk ORDER BY line_no)
                     AS rn FROM j2 WHERE admitted) a
      WHERE conn_ids IS NOT NULL),
    w1 AS (
      SELECT 'worker' AS kind, 'j1' AS job, CAST(fk AS BIGINT) AS w,
             CAST(count(*) AS BIGINT) AS k,
             CASE WHEN fk = 3 THEN 'running' ELSE 'completed' END || '|'
               || CASE WHEN fk = 3 THEN 0 ELSE 1 END || '|'
               || CAST(count(*) FILTER (WHERE admitted) AS BIGINT) || '|'
               || CAST(count(*) FILTER (WHERE mal OR (admitted AND conn_ids IS NULL)) AS BIGINT) || '|'
               || CAST(count(*) FILTER (WHERE NOT mal AND NOT admitted) AS BIGINT) || '|'
               || fname || ':' || max(line_no) AS tag
      FROM j1 GROUP BY fk, fname),
    w2 AS (
      SELECT 'worker' AS kind, 'j2' AS job, CAST(0 AS BIGINT) AS w,
             CAST(count(*) AS BIGINT) AS k,
             'completed|1|'
               || CAST(count(*) FILTER (WHERE admitted) AS BIGINT) || '|'
               || CAST(count(*) FILTER (WHERE mal OR (admitted AND conn_ids IS NULL)) AS BIGINT) || '|'
               || CAST(count(*) FILTER (WHERE NOT mal AND NOT admitted) AS BIGINT) || '|'
               || fname || ':' || max(line_no) AS tag
      FROM j2 GROUP BY fname),
    jr1 AS (
      SELECT 'job' AS kind, 'j1' AS job, CAST(6 AS BIGINT) AS w,
             CAST(count(*) AS BIGINT) AS k,
             'cancelled|6|5|'
               || CAST(count(*) FILTER (WHERE admitted) AS BIGINT) || '|'
               || CAST(count(*) FILTER (WHERE mal OR (admitted AND conn_ids IS NULL)) AS BIGINT) || '|'
               || CAST(count(*) FILTER (WHERE NOT mal AND NOT admitted) AS BIGINT) AS tag
      FROM j1),
    jr2 AS (
      SELECT 'job' AS kind, 'j2' AS job, CAST(1 AS BIGINT) AS w,
             CAST(count(*) AS BIGINT) AS k,
             'completed|1|1|'
               || CAST(count(*) FILTER (WHERE admitted) AS BIGINT) || '|'
               || CAST(count(*) FILTER (WHERE mal OR (admitted AND conn_ids IS NULL)) AS BIGINT) || '|'
               || CAST(count(*) FILTER (WHERE NOT mal AND NOT admitted) AS BIGINT) AS tag
      FROM j2)
    SELECT * FROM m1 UNION ALL SELECT * FROM m2
    UNION ALL SELECT * FROM w1 UNION ALL SELECT * FROM w2
    UNION ALL SELECT * FROM jr1 UNION ALL SELECT * FROM jr2"""

  // ---- P14: the admin HTTP surface over a live job ------------------------

  private lazy val om = new com.fasterxml.jackson.databind.ObjectMapper()

  /** Driver-as-client HTTP with the drained Connection:close discipline —
    * the ONE shared implementation ([[StreamOps.httpCall]], where the
    * measured keep-alive-stall rationale lives). */
  private def http(method: String, url: String, body: Option[String] = None,
                   headers: Map[String, String] = Map.empty): (Int, String) =
    StreamOps.httpCall(method, url, body, headers)

  /** P14 — the reprocessing ADMIN surface promoted to a live oracle gate
    * (the b12–b16 pattern): everything this query emits is parsed from
    * HTTP responses of [[graft.http.ReprocessingAdmin]], never read from
    * Derby directly. One real job runs the data plane end-to-end (started
    * by POST /jobs with an OFFSET-form RFC3339 date_from, completion
    * polled over the wire); a second job is cancelled before its pod
    * starts (the runner stand-in for the reference deleting the K8s job)
    * and must STAY cancelled; the listing order, the per-worker rows, the
    * config round-trip (retry_attempts/limit recorded verbatim), and both
    * jobs' counter rollups are all oracle-recomputed from the events table
    * alone. Scale note: the HTTP layer is control plane — the data plane
    * behind POST is the same one-task-per-file scan p13 proves. */
  def p14ReprocessAdmin(s: SparkSession, d: String): DataFrame = {
    writeSpool(s, d, Root14)
    val sink = JdbcSink(JdbcUrl14, DerbyDialect, maxWriteConnections = 4)
    sink.withConnection { c =>
      Seq(FailoverReprocessor.Db.WorkersTable,
          FailoverReprocessor.Db.JobsTable).foreach { t =>
        try sink.exec(c, s"""DROP TABLE "$t"""")
        catch { case _: java.sql.SQLException => () }
      }
    }
    var ids = List("p14a", "p14b")
    val admin = new graft.http.ReprocessingAdmin(s, sink, Streams,
      authToken = Some("p14-token"),
      newId = () => { val h = ids.head; ids = ids.tail; h },
      runner = Some((job, cfg) =>
        if (job.id == "p14a") {
          FailoverReprocessor.run(s, sink, job, cfg, Streams); ()
        } else ())).start() // p14b: cancelled before its pod ever starts
    try {
      val api = s"http://127.0.0.1:${admin.port}/api/admin/reprocessing/jobs"
      val tok = Map("Authorization" -> "Bearer p14-token")
      require(http("GET", api)._1 == 401, "p14: unauthenticated GET must 401")

      // date_from in offset form (+02:00 of the same instant as From):
      // the wire accepts any RFC3339 offset like Go's time.Time
      val startBody =
        s"""{"local_path":"$Spool14","stream_ids":[${
          StreamFilter.map(x => s""""$x"""").mkString(",")}],""" +
          s""""batch_size":$BatchSize,"date_from":"2024-01-02T02:00:00+02:00",""" +
          s""""date_to":"2024-01-12T00:00:00Z","retry_attempts":2,"limit":5}"""
      val (pc, pb) = http("POST", api, Some(startBody), tok)
      require(pc == 200, s"p14 POST /jobs: HTTP $pc $pb")
      val post = om.readTree(pb)
      require(post.get("id").asText == "p14a", "p14: unexpected job id")

      // second job, cancelled while 'running' — must stick
      require(http("POST", api,
        Some(s"""{"local_path":"$Spool14"}"""), tok)._1 == 200)
      require(http("POST", s"$api/p14b/cancel", Some(""), tok)._1 == 200)

      // completion over the wire
      var ja = om.readTree(http("GET", s"$api/p14a", headers = tok)._2)
      val deadline = System.nanoTime() + 120L * 1000 * 1000 * 1000
      while (ja.get("status").asText == "running" && System.nanoTime() < deadline) {
        // 15 ms tick: the job's own wall time is a few hundred ms, so a
        // 100 ms poll quantized up to a fifth of the measured query away
        // (r19 profile); each poll is one ~1 ms local HTTP GET
        Thread.sleep(15)
        ja = om.readTree(http("GET", s"$api/p14a", headers = tok)._2)
      }
      if (ja.get("status").asText == "running") {
        // fail LOUDLY and stop the data plane: a silent fall-through would
        // emit mid-flight rows (a phantom oracle mismatch) and leak the
        // runner's Spark jobs into the next query's measurement
        http("POST", s"$api/p14a/cancel", Some(""), tok)
        throw new IllegalStateException(
          "p14: job p14a still running after 120s — host stall; cancelled")
      }
      val workers = om.readTree(
        http("GET", s"$api/p14a/workers", headers = tok)._2).get("workers")
      val jc = om.readTree(http("GET", s"$api/p14b", headers = tok)._2)
      val cworkers = om.readTree(
        http("GET", s"$api/p14b/workers", headers = tok)._2).get("workers")
      val list = om.readTree(http("GET", api, headers = tok)._2).get("jobs")

      def jobTag(j: com.fasterxml.jackson.databind.JsonNode): String =
        s"${j.get("status").asText}|${j.get("total_files").asLong}|" +
          s"${j.get("total_workers").asLong}|${j.get("processed_files").asLong}|" +
          s"${j.get("success_count").asLong}|${j.get("error_count").asLong}|" +
          s"${j.get("skipped_count").asLong}|ts=${
            if (j.has("started_at") && j.has("completed_at")) 1 else 0}"
      import scala.jdk.CollectionConverters._
      val wRows = workers.elements().asScala.map { w =>
        Row("worker", "a", w.get("worker_index").asLong,
          w.get("total_lines").asLong,
          s"${w.get("status").asText}|${w.get("assigned_files").asLong}|" +
            s"${w.get("processed_files").asLong}|${w.get("success_count").asLong}|" +
            s"${w.get("error_count").asLong}|${w.get("skipped_count").asLong}|" +
            // workerJson omits current_file for a zero-progress cursor —
            // read it through Option so an empty worker parses, not NPEs
            s"${base(Option(w.get("current_file")).fold("")(_.asText))}:${
              w.get("current_line").asLong}")
      }.toSeq
      val cfgEcho = post.get("config")
      val postRow = Row("post", "a", post.get("total_workers").asLong,
        post.get("total_files").asLong,
        s"rt=${cfgEcho.get("retry_attempts").asLong}|" +
          s"lim=${cfgEcho.get("limit").asLong}|" +
          s"bs=${cfgEcho.get("batch_size").asLong}|" +
          s"dry=${cfgEcho.get("dry_run").asBoolean}")
      val cStatuses = cworkers.elements().asScala.map(_.get("status").asText)
        .toSeq.distinct.sorted.mkString(",")
      val cAssigned = cworkers.elements().asScala
        .map(_.get("assigned_files").asLong).sum
      val rows = wRows ++ Seq(
        postRow,
        Row("job", "a", ja.get("total_workers").asLong,
          ja.get("total_lines").asLong, jobTag(ja)),
        Row("job", "c", jc.get("total_workers").asLong,
          jc.get("total_lines").asLong, jobTag(jc)),
        Row("cworkers", "c", cworkers.size.toLong, cAssigned, cStatuses),
        Row("list", "l", 0L, list.size.toLong,
          list.elements().asScala.map(_.get("id").asText).mkString(",")))
      val schema = StructType(Seq(
        StructField("kind", StringType), StructField("job", StringType),
        StructField("w", LongType), StructField("k", LongType),
        StructField("tag", StringType)))
      s.createDataFrame(rows.asJava, schema)
    } finally admin.stop()
  }

  /** Wire-shape replay: worker/job rollups from the fixture CTEs (full
    * scan, no cut — six files, one worker each), plus the constant rows
    * the admin contract pins (config echo, cancelled job, listing order). */
  private val p14Oracle = s"""
    WITH $FixtureCtes,
    wa AS (
      SELECT 'worker' AS kind, 'a' AS job, CAST(fk AS BIGINT) AS w,
             CAST(count(*) AS BIGINT) AS k,
             'completed|1|1|'
               || CAST(count(*) FILTER (WHERE admitted) AS BIGINT) || '|'
               || CAST(count(*) FILTER (WHERE mal OR (admitted AND conn_ids IS NULL)) AS BIGINT) || '|'
               || CAST(count(*) FILTER (WHERE NOT mal AND NOT admitted) AS BIGINT) || '|'
               || fname || ':' || max(line_no) AS tag
      FROM res GROUP BY fk, fname),
    jra AS (
      SELECT 'job' AS kind, 'a' AS job, CAST(6 AS BIGINT) AS w,
             CAST(count(*) AS BIGINT) AS k,
             'completed|6|6|6|'
               || CAST(count(*) FILTER (WHERE admitted) AS BIGINT) || '|'
               || CAST(count(*) FILTER (WHERE mal OR (admitted AND conn_ids IS NULL)) AS BIGINT) || '|'
               || CAST(count(*) FILTER (WHERE NOT mal AND NOT admitted) AS BIGINT)
               || '|ts=1' AS tag
      FROM res)
    SELECT * FROM wa
    UNION ALL SELECT * FROM jra
    UNION ALL SELECT 'post', 'a', CAST(6 AS BIGINT), CAST(6 AS BIGINT),
                     'rt=2|lim=5|bs=$BatchSize|dry=false'
    UNION ALL SELECT 'job', 'c', CAST(6 AS BIGINT), CAST(0 AS BIGINT),
                     'cancelled|6|6|0|0|0|0|ts=1'
    UNION ALL SELECT 'cworkers', 'c', CAST(6 AS BIGINT), CAST(6 AS BIGINT),
                     'pending'
    UNION ALL SELECT 'list', 'l', CAST(0 AS BIGINT), CAST(2 AS BIGINT),
                     'p14b,p14a'"""

  val qs: Map[String, Q] = Map(
    "p13_failover_reprocess" -> Q(p13FailoverReprocess, Some(p13Oracle)),
    "p14_reprocess_admin" -> Q(p14ReprocessAdmin, Some(p14Oracle)))
}
