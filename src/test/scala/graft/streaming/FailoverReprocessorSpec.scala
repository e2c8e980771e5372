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
