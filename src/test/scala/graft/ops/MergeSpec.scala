package graft.ops

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.SparkSuite

/** Cross-batch upsert with a merge window (D2/D3): only in-window target
  * rows are replaceable; NULL window predicates mean "keep"
  * (transactional_stream.go:91-100, mergewindow_test.go semantics). */
class MergeSpec extends SparkSuite {

  private def target = df("pk STRING, ts BIGINT, v STRING", Seq(
    Row("a", 100L, "old-in-window"),
    Row("b", 10L, "old-out-of-window"),
    Row("c", 100L, "untouched"),
    Row("d", null, "null-ts")))

  private def source = df("pk STRING, ts BIGINT, v STRING", Seq(
    Row("a", 200L, "new-a"),
    Row("b", 200L, "new-b"),
    Row("d", 200L, "new-d"),
    Row("e", 200L, "new-e")))

  test("no window: colliding target rows are replaced, source inserted") {
    val out = Merge.upsert(target, source, Seq("pk"))
    assert(canon(out.select("pk", "v")) == Seq(
      Seq("a", "new-a"), Seq("b", "new-b"), Seq("c", "untouched"),
      Seq("d", "new-d"), Seq("e", "new-e")))
  }

  test("window: out-of-window duplicates SURVIVE next to the new row") {
    val out = Merge.upsert(target, source, Seq("pk"), window = Some(col("ts") >= 50L))
    // b(ts=10) is outside the window → kept even though pk collides
    assert(canon(out.filter(col("pk") === "b").select("v")) ==
      Seq(Seq("new-b"), Seq("old-out-of-window")))
    // a(ts=100) is inside → replaced
    assert(canon(out.filter(col("pk") === "a").select("v")) == Seq(Seq("new-a")))
  }

  test("NULL window predicate counts as outside: the row is never dropped") {
    val out = Merge.upsert(target, source, Seq("pk"), window = Some(col("ts") >= 50L))
    assert(canon(out.filter(col("pk") === "d").select("v")) ==
      Seq(Seq("new-d"), Seq("null-ts")))
  }

  test("hinted small source broadcasts; unhinted takes the safe plan") {
    val hinted = Merge.upsert(target, source, Seq("pk"), sourceKeyCountHint = Some(4L))
    hinted.count()
    assert(hinted.queryExecution.executedPlan.toString.contains("BroadcastHashJoin"))
    // no hint → no FORCED broadcast hint in the logical plan (AQE may still
    // choose to broadcast at runtime, which is the point)
    val unhinted = Merge.upsert(target, source, Seq("pk"))
    assert(!unhinted.queryExecution.logical.toString.contains("UnresolvedHint"))
    assert(canon(unhinted.select("pk", "v")) == canon(hinted.select("pk", "v")))
  }

  test("effective window shrinks to the batch's oldest event, clamped") {
    val day = 86400000L
    val now = 100L * day
    assert(Merge.effectiveWindowDays(365, now - 3 * day, now) == 3)
    assert(Merge.effectiveWindowDays(365, now - 1000 * day, now) == 365) // clamp high
    assert(Merge.effectiveWindowDays(365, now, now) == 1)                // clamp low
    assert(Merge.effectiveWindowDays(365, now - (2 * day + 1), now) == 3) // ceil
  }
}
