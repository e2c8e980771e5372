package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Raw-event archive + reprocessing replay — the disaster-recovery loop the
  * reference runs at the ingest edge: every raw event is spooled to a
  * rolling gzip NDJSON archive BEFORE any parsing or warehouse write
  * (`ingest/backup_logger.go:22–69`), and a reprocessing job can later
  * re-drive a date range of that archive through the ordinary batch path
  * (`reprocessing-worker/main.go` — workers stream gzip NDJSON files back
  * into the pipeline), with pk-merge idempotency absorbing whatever already
  * landed.
  *
  * Layout: `dir/<dest>/dt=YYYY-MM-DD/events-NNNNN.ndjson.gz` — hive-style
  * date partitions of plain gzip NDJSON, so the replay side is nothing
  * special: Spark's text source reads it natively, partition discovery
  * yields `dt`, and a date-range filter prunes at the DIRECTORY level — a
  * 100 TB archive replays one lost week without listing the other years. */
object RawArchive {

  private val DtFmt = java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd")
    .withZone(java.time.ZoneOffset.UTC)

  /** Edge-side rolling writer (`backup_logger.go:22–69` semantics, one
    * writer per destination spool): appends raw NDJSON lines under
    * `dir/<dest>/dt=<event date>/`, sealing the open segment and rolling to
    * the next numbered file once `maxBytes` of raw payload accumulate
    * (lumberjack's MaxSize). Bytes stream through gzip as they arrive;
    * like the reference's rotate-then-compress, a hard crash loses only
    * the unsealed tail — the warehouse, not the archive, is the unique
    * copy of nothing. Thread-safe like the reference's mutexed logger map. */
  final class Writer(dir: String, maxBytes: Long = 1L << 20) {
    private final class Seg(val out: java.io.OutputStream, var bytes: Long, val n: Int)
    private val segs = scala.collection.mutable.Map[(String, String), Seg]()

    def log(dest: String, tsMs: Long, rawLine: String): Unit = synchronized {
      val dt = DtFmt.format(java.time.Instant.ofEpochMilli(tsMs))
      val seg = segs.getOrElseUpdate((dest, dt), open(dest, dt, 0))
      val b = (rawLine + "\n").getBytes("UTF-8")
      seg.out.write(b)
      seg.bytes += b.length
      if (seg.bytes >= maxBytes) {
        seg.out.close()
        segs((dest, dt)) = open(dest, dt, seg.n + 1)
      }
    }

    private def open(dest: String, dt: String, hint: Int): Seg = {
      val d = new java.io.File(s"$dir/$dest/dt=$dt")
      require(d.isDirectory || d.mkdirs(), s"cannot create archive dir $d")
      // NEVER truncate a sealed segment: a restarted edge (new Writer over
      // the same spool — the backup-logger crash/restart path) must resume
      // AFTER whatever earlier segments exist, or the archive would lose
      // the very events it exists to make recoverable
      var n = hint
      var f = new java.io.File(d, f"events-$n%05d.ndjson.gz")
      while (f.exists()) { n += 1; f = new java.io.File(d, f"events-$n%05d.ndjson.gz") }
      new Seg(new java.util.zip.GZIPOutputStream(new java.io.FileOutputStream(f)), 0L, n)
    }

    def close(): Unit = synchronized {
      segs.values.foreach(_.out.close())
      segs.clear()
    }
  }

  /** Distributed archive write for a batch edge: `df` carries the raw line
    * in `raw` and its date in `dt`; one partitioned gzip text pass — the
    * shape the edge writer's output converges to at scale (same layout,
    * same readers). */
  def archive(df: DataFrame, destDir: String): Unit =
    df.select(col("raw").as("value"), col("dt"))
      .write.mode("append").partitionBy("dt")
      .option("compression", "gzip").text(destDir)

  /** Retention (the reference's `BackupLogTTL` / lumberjack `MaxAge` days):
    * drop whole `dt=` partitions strictly OLDER than `ttlDays` before
    * `today`. Deleting by partition directory is the point of the layout —
    * expiry is a rename-free O(|expired dirs|) metadata operation, never a
    * scan; comparisons are on the lexicographically ordered date strings.
    * Returns the expired partition dates. */
  def vacuum(dir: String, dest: String, ttlDays: Int,
             todayMs: () => Long = () => System.currentTimeMillis()): Seq[String] = {
    require(ttlDays > 0, "ttlDays must be positive")
    val cutoff = DtFmt.format(java.time.Instant.ofEpochMilli(
      todayMs() - ttlDays.toLong * 86400000L))
    val root = new java.io.File(s"$dir/$dest")
    val parts = Option(root.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName.startsWith("dt="))
    val expired = parts.filter(_.getName.stripPrefix("dt=") < cutoff)
    expired.foreach { d =>
      Option(d.listFiles()).getOrElse(Array.empty).foreach(_.delete())
      d.delete()
    }
    expired.map(_.getName.stripPrefix("dt=")).toSeq.sorted
  }

  /** Replay read of `[fromDt, toDt]` (inclusive; `toDt` open-ended when
    * None): raw lines + their `dt`. The range lands on the hive partition
    * column, so pruning happens in the file listing — files outside the
    * range are never opened (ArchiveSpec proves it via input_file_name). */
  def readRange(spark: SparkSession, destDir: String,
                fromDt: String, toDt: Option[String] = None): DataFrame = {
    val raw = spark.read.option("basePath", destDir).text(destDir)
      .withColumn("dt", col("dt").cast("string"))
      .filter(col("dt") >= fromDt)
    toDt.fold(raw)(t => raw.filter(col("dt") <= t))
  }
}
