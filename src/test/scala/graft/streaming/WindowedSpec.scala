package graft.streaming

import org.apache.spark.sql.Row
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.SparkSuite

/** Watermarked windows + keyed state across real micro-batches (driven
  * through MemoryStream so batch boundaries are explicit). */
class WindowedSpec extends SparkSuite {
  import spark.implicits._

  test("windowed counts: 5-minute tumbling windows on event time") {
    val events = df("ts TIMESTAMP, k STRING", Seq(
      Row(java.sql.Timestamp.valueOf("2024-01-01 10:01:00"), "a"),
      Row(java.sql.Timestamp.valueOf("2024-01-01 10:03:00"), "a"),
      Row(java.sql.Timestamp.valueOf("2024-01-01 10:07:00"), "a"),
      Row(java.sql.Timestamp.valueOf("2024-01-01 10:02:00"), "b")))
    val out = Windowed.windowedCounts(events, "ts", "k", "5 minutes", "10 minutes")
    assert(canon(out.select(col("window_start").cast("string"), col("k"), col("n"))) == Seq(
      Seq("2024-01-01 10:00:00", "a", "2"),
      Seq("2024-01-01 10:00:00", "b", "1"),
      Seq("2024-01-01 10:05:00", "a", "1")))
  }

  test("watermark drops data later than the delay (bounded streaming state)") {
    implicit val sqlCtx = spark.sqlContext
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val input = MemoryStream[(java.sql.Timestamp, String)]
    val query = Windowed.windowedCounts(
        input.toDS().toDF("ts", "k"), "ts", "k", "5 minutes", "10 minutes")
      .writeStream.format("memory").queryName("wm").outputMode("update").start()
    try {
      // batch 1 advances the watermark to 10:30 − 10 min = 10:20
      input.addData((ts("2024-01-01 10:30:00"), "a"))
      query.processAllAvailable()
      // batch 2: one row far behind the watermark (dropped), one ahead (kept)
      input.addData((ts("2024-01-01 09:00:00"), "late"), (ts("2024-01-01 10:26:00"), "ok"))
      query.processAllAvailable()
      val keys = spark.table("wm").collect().map(_.getString(1)).toSet
      assert(keys.contains("ok"))
      assert(!keys.contains("late")) // state for 09:00 windows is GONE
    } finally query.stop()
  }

  test("stream-stream interval join matches across micro-batches, within the bound") {
    implicit val sqlCtx = spark.sqlContext
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val lIn = MemoryStream[(java.sql.Timestamp, String, Long)]
    val rIn = MemoryStream[(java.sql.Timestamp, String, Double)]
    val joined = Windowed.intervalJoin(
      lIn.toDS().toDF("ts", "k", "ev"), rIn.toDS().toDF("ts", "k", "v"),
      keyCol = "k", tsCol = "ts", boundMs = 5L * 60 * 1000,
      watermarkDelay = "10 minutes")
    val query = joined.writeStream.format("memory").queryName("ssj")
      .outputMode("append").start()
    try {
      // right side arrives in an EARLIER micro-batch than its left match:
      // the join must buffer it in state
      rIn.addData((ts("2024-01-01 10:00:00"), "a", 1.0))
      query.processAllAvailable()
      lIn.addData(
        (ts("2024-01-01 10:03:00"), "a", 1L),  // within 5 min of the update
        (ts("2024-01-01 10:09:00"), "a", 2L),  // outside the bound — no match
        (ts("2024-01-01 10:03:00"), "b", 3L))  // wrong key — no match
      query.processAllAvailable()
      val rows = spark.table("ssj").select("ev", "r_v").collect()
        .map(r => r.getLong(0) -> r.getDouble(1)).toSeq
      assert(rows == Seq(1L -> 1.0)) // inner join: only the in-bound pair
    } finally query.stop()
  }

  test("mapGroupsWithState carries keyed counts across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Long)]
    val query = Windowed.runningCounts(input.toDS())
      .writeStream.format("memory").queryName("running")
      .outputMode("update").start()
    try {
      input.addData((1L, 10L), (1L, 20L), (2L, 10L))
      query.processAllAvailable()
      val after1 = spark.table("running").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(after1 == Set((1L, 2L), (2L, 1L)))
      input.addData((1L, 30L)) // state must survive the batch boundary
      query.processAllAvailable()
      val after2 = spark.table("running").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(after2.contains((1L, 3L)))
    } finally query.stop()
  }

  test("sessionize: gap closes a session, state holds the open tail") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Long)]
    val query = Windowed.sessionize(input.toDS(), gapMs = 1000L)
      .writeStream.format("memory").queryName("sessions")
      .outputMode("append").start()
    try {
      // batch 1: two events 500ms apart (one session, stays OPEN in state)
      input.addData((7L, 1000L), (7L, 1500L))
      query.processAllAvailable()
      assert(spark.table("sessions").count() == 0) // nothing closed yet
      // batch 2: an event 10s later closes the first session
      input.addData((7L, 11500L))
      query.processAllAvailable()
      val closed = spark.table("sessions").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      assert(closed.toSeq == Seq((7L, 2L, 1000L, 1500L)))
    } finally query.stop()
  }
}
