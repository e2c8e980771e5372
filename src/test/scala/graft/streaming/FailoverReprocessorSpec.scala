package graft.streaming

import graft.SparkSuite

/** Failover-reprocessing manager semantics the p13 query doesn't reach:
  * filename-timestamp parsing, the date-range overlap filter (24h slack on
  * the filename leg, fs-mtime leg, unparseable-name skip), the explicit
  * file-list filter, and the worker fan-out cap. */
class FailoverReprocessorSpec extends SparkSuite {
  import FailoverReprocessor._

  test("filename timestamp: YYYY_MM_DDTHH_MM_SS anywhere in the basename") {
    val t = parseFilenameTimestamp("/x/kafka_failover_2024_01_05T06_07_08.ndjson")
    assert(t.contains(java.time.Instant.parse("2024-01-05T06:07:08Z").toEpochMilli))
    // prefix/suffix noise is fine; a dir component timestamp is NOT used
    assert(parseFilenameTimestamp("/a/pre_2023_12_31T23_59_59_post.ndjson.gz").isDefined)
    assert(parseFilenameTimestamp("/2024_01_01T00_00_00/plain.ndjson").isEmpty)
  }

  test("date-range filter: 24h slack, mtime leg, unparseable names skipped") {
    def f(name: String, mtime: String) =
      FileItem(s"/spool/$name", 10L,
        java.time.Instant.parse(mtime).toEpochMilli)
    val files = Seq(
      f("kafka_failover_2024_01_10T00_00_00.ndjson", "2024-01-12T00:00:00Z"),
      // created Jan 13 but -24h slack keeps it for dateTo Jan 12
      f("kafka_failover_2024_01_13T00_00_00.ndjson", "2024-01-14T00:00:00Z"),
      // created Jan 14: -24h still after Jan 12 → dropped
      f("kafka_failover_2024_01_14T00_00_01.ndjson", "2024-01-15T00:00:00Z"),
      // mtime before dateFrom → dropped
      f("kafka_failover_2024_01_10T00_00_00b.ndjson", "2024-01-01T00:00:00Z"),
      // no parseable timestamp → dropped (reference warns and skips)
      FileItem("/spool/noname.ndjson", 10L,
        java.time.Instant.parse("2024-01-12T00:00:00Z").toEpochMilli))
    val kept = filterByDateRange(files,
      Some(java.time.Instant.parse("2024-01-05T00:00:00Z")),
      Some(java.time.Instant.parse("2024-01-12T00:00:00Z")))
    assert(kept.map(_.path.split('/').last) == Seq(
      "kafka_failover_2024_01_10T00_00_00.ndjson",
      "kafka_failover_2024_01_13T00_00_00.ndjson"))
    // no range configured → untouched (even unparseable names survive)
    assert(filterByDateRange(files, None, None) == files)
  }

  test("corrupt file → one error + lastError, others unaffected; dry run counts but never delivers") {
    import graft.sink.JdbcSink
    import graft.sql.DerbyDialect
    val dir = java.nio.file.Files.createTempDirectory("graft_fr_").toString
    def w(name: String, bytes: Array[Byte]): Unit =
      java.nio.file.Files.write(java.nio.file.Paths.get(dir, name), bytes)
    val good = (1 to 5).map(i =>
      s"""{"messageCreated":"2024-01-05T00:00:00Z","origin":{"sourceId":"sA","slug":"sA"},"event":{"event_id":$i}}""")
    w("kafka_failover_2024_01_05T00_00_00.ndjson",
      good.mkString("", "\n", "\n").getBytes("UTF-8"))
    w("kafka_failover_2024_01_06T00_00_00.ndjson.gz",
      "definitely not gzip".getBytes("UTF-8")) // corrupt header: open fails
    val sink = JdbcSink("jdbc:derby:memory:graft_frspec;create=true",
      DerbyDialect, maxWriteConnections = 2)
    val streams = Seq(StreamDef("sA", "sA", Seq("c-x")))
    def runJob(id: String, dry: Boolean) = {
      val cfg = JobConfig(path = dir, dryRun = dry)
      FailoverReprocessor.run(spark, sink,
        FailoverReprocessor.startJob(spark, sink, id, cfg), cfg, streams)
    }
    val r = runJob("frspec1", dry = false)
    assert(r.job.status == "completed")
    assert(r.job.totalLines == 5L && r.job.success == 5L)
    assert(r.job.error == 1L && r.job.skipped == 0L) // the corrupt FILE
    val failed = r.workers.find(_.lastError.nonEmpty).get
    assert(failed.lastError.contains("failed to process file"))
    assert(failed.totalLines == 0L && failed.error == 1L)
    assert(r.delivered.count() == 5L)
    // dry run: identical accounting, empty delivery (main.go:555-560)
    val d = runJob("frspec2", dry = true)
    assert(d.job.totalLines == 5L && d.job.success == 5L && d.job.error == 1L)
    assert(d.delivered.count() == 0L)
  }

  test("file-list filter matches full path or basename; worker cap is 100") {
    val files = Seq(
      FileItem("/spool/a/f1.ndjson", 1L, 0L),
      FileItem("/spool/b/f2.ndjson", 1L, 0L),
      FileItem("/spool/b/f3.ndjson", 1L, 0L))
    assert(filterByList(files, Seq("f2.ndjson", "/spool/a/f1.ndjson"))
      .map(_.path) == Seq("/spool/a/f1.ndjson", "/spool/b/f2.ndjson"))
    assert(filterByList(files, Nil) == files)
    assert(workerCount(0) == 1 && workerCount(7) == 7 && workerCount(5000) == 100)
  }
}
