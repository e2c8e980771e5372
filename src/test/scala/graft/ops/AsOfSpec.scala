package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSuite

/** As-of join semantics: `<=` visibility, null before any update, and the
  * union-window form agreeing with the range-join executable spec. */
class AsOfSpec extends SparkSuite {
  import spark.implicits._

  private def leftDf(rows: (Long, String, Long)*) =
    rows.toDF("id", "k", "ts")
  private def rightDf(rows: (String, Long, Double)*) =
    rows.toDF("k", "ts", "v")

  test("each left row sees the latest right row at or before its ts") {
    val l = leftDf((1L, "a", 5L), (2L, "a", 10L), (3L, "a", 20L), (4L, "b", 7L))
    val r = rightDf(("a", 10L, 1.0), ("a", 15L, 2.0), ("b", 1L, 9.0))
    val out = AsOf.join(l, r, "k", "ts", Seq("v"))
      .select("id", "asof_v").as[(Long, Option[Double])].collect().toMap
    assert(out(1L).isEmpty)        // nothing at or before ts=5
    assert(out(2L).contains(1.0))  // update AT ts=10 is visible (<=)
    assert(out(3L).contains(2.0))  // latest preceding
    assert(out(4L).contains(9.0))  // per-key isolation
  }

  test("no join explosion: output has exactly one row per left row") {
    val l = leftDf((1L, "a", 100L), (2L, "a", 100L)) // duplicate left rows
    val r = rightDf(("a", 1L, 1.0), ("a", 2L, 2.0), ("a", 3L, 3.0))
    val out = AsOf.join(l, r, "k", "ts", Seq("v"))
    assert(out.count() == 2)
    assert(out.select("asof_v").as[Double].collect().toSeq == Seq(3.0, 3.0))
  }

  test("a NULL field in the latest snapshot stays NULL — no stale resurrection") {
    val l = leftDf((1L, "a", 10L))
    val r = Seq(("a", 1L, Some(5.0)), ("a", 2L, None)) // latest update: v is NULL
      .toDF("k", "ts", "v")
    val win = AsOf.join(l, r, "k", "ts", Seq("v"))
      .select("asof_v").as[Option[Double]].collect().toSeq
    val rng = AsOf.joinViaRange(l, r, "k", "ts", Seq("v"))
      .select("asof_v").as[Option[Double]].collect().toSeq
    assert(win == Seq(None)) // the snapshot IS the null, not the older 5.0
    assert(win == rng)
  }

  test("null-ts right rows are dropped; null-ts left rows see nothing") {
    val l = Seq((1L, "a", Some(10L)), (2L, "a", None)).toDF("id", "k", "ts")
    val r = Seq(("a", Some(1L), 7.0), ("a", None, 9.9)).toDF("k", "ts", "v")
    val out = AsOf.join(l, r, "k", "ts", Seq("v"))
      .select("id", "asof_v").as[(Long, Option[Double])].collect().toMap
    assert(out(1L).contains(7.0)) // the null-ts update never surfaces
    assert(out(2L).isEmpty)       // a timeless left row matches nothing
  }

  test("union-window form equals the range-join spec on seeded random data") {
    val rnd = new scala.util.Random(7)
    val l = leftDf((1 to 200).map(i =>
      (i.toLong, s"k${rnd.nextInt(5)}", rnd.nextInt(50).toLong)): _*)
    val r = rightDf((1 to 30).map { i =>
      (s"k${i % 5}", (i * 2).toLong, i.toDouble) // unique (k, ts) by construction
    }.distinct: _*)
    val a = AsOf.join(l, r, "k", "ts", Seq("v"))
      .select("id", "asof_v").as[(Long, Option[Double])].collect().toMap
    val b = AsOf.joinViaRange(l, r, "k", "ts", Seq("v"))
      .select("id", "asof_v").as[(Long, Option[Double])].collect().toMap
    assert(a == b)
  }

  test("window form equals the range spec on seeded random data WITH null values and null ts") {
    val rnd = new scala.util.Random(13)
    def maybe[T](v: T): Option[T] = if (rnd.nextInt(5) == 0) None else Some(v)
    val l = (1 to 150).map(i =>
      (i.toLong, s"k${rnd.nextInt(4)}", maybe(rnd.nextInt(40).toLong)))
      .toDF("id", "k", "ts")
    // unique (k, ts) among non-null-ts rows by construction; ts and values
    // each go null ~20%
    val r = (1 to 20).map { i =>
      (s"k${i % 4}", maybe((i * 2).toLong), maybe(i.toDouble))
    }.toDF("k", "ts", "v")
    val a = AsOf.join(l, r, "k", "ts", Seq("v"))
      .select("id", "asof_v").as[(Long, Option[Double])].collect().toMap
    // range spec with null-ts right rows dropped (the documented contract)
    val b = AsOf.joinViaRange(l, r.filter(col("ts").isNotNull), "k", "ts", Seq("v"))
      .select("id", "asof_v").as[(Long, Option[Double])].collect().toMap
    assert(a == b)
  }

  test("broadcast exec operator equals the window form on seeded data with nulls, ties, and absent keys") {
    val rnd = new scala.util.Random(29)
    def maybe[T](v: T): Option[T] = if (rnd.nextInt(5) == 0) None else Some(v)
    val l = (1 to 150).map(i =>
      (i.toLong, s"k${rnd.nextInt(6)}", maybe(rnd.nextInt(40).toLong))) // k4/k5 absent on the right
      .toDF("id", "k", "ts")
    val r = (1 to 20).map { i =>
      (s"k${i % 4}", maybe((i * 2).toLong), maybe(i.toDouble))
    }.toDF("k", "ts", "v")
    val win = AsOf.join(l, r, "k", "ts", Seq("v"))
      .select("id", "asof_v").as[(Long, Option[Double])].collect().toMap
    val exec = AsOf.joinBroadcast(l, r, "k", "ts", Seq("v"))
      .select("id", "asof_v").as[(Long, Option[Double])].collect().toMap
    assert(exec == win)
  }

  test("broadcast exec operator: self-as-of (right derived from left's scan) resolves and agrees") {
    val l = leftDf((1L, "a", 5L), (2L, "a", 10L), (3L, "a", 20L), (4L, "b", 7L))
    val r = l.filter(col("id") % 2 === 0)
      .select(col("k"), col("ts"), (col("id") * 10).cast("double").as("v"))
    val win = AsOf.join(l, r, "k", "ts", Seq("v"))
      .select("id", "asof_v").as[(Long, Option[Double])].collect().toMap
    val exec = AsOf.joinBroadcast(l, r, "k", "ts", Seq("v"))
      .select("id", "asof_v").as[(Long, Option[Double])].collect().toMap
    assert(exec == win)
  }

  test("broadcast exec: null keys follow join equality (see nulls); mismatched key types fail fast") {
    val l = Seq((1L, Option("a"), 10L), (2L, Option.empty[String], 10L))
      .toDF("id", "k", "ts")
    val r = Seq((Option("a"), 5L, 1.0), (Option.empty[String], 5L, 9.0))
      .toDF("k", "ts", "v")
    val out = AsOf.joinBroadcast(l, r, "k", "ts", Seq("v"))
      .select("id", "asof_v").as[(Long, Option[Double])].collect().toMap
    assert(out(1L).contains(1.0))
    assert(out(2L).isEmpty) // null key ≠ null key — the documented divergence
    val wrong = Seq((1, 3L, 1.0)).toDF("k", "ts", "v") // int key vs string key
    intercept[IllegalArgumentException] {
      AsOf.joinBroadcast(l, wrong, "k", "ts", Seq("v"))
    }
  }

  test("broadcast exec plan: custom operator, ZERO exchanges, no join operator") {
    val l = leftDf((1L, "a", 5L), (2L, "b", 6L))
    val r = rightDf(("a", 1L, 1.0), ("b", 2L, 2.0))
    val plan = AsOf.joinBroadcast(l, r, "k", "ts", Seq("v"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastAsOfJoin"), plan)
    assert(!plan.contains("Exchange"), plan)
    assert(!plan.contains("SortMergeJoin") && !plan.contains("BroadcastHashJoin") &&
      !plan.contains("BroadcastNestedLoop") && !plan.contains("CartesianProduct"), plan)
  }

  test("the plan shuffles once on the key — no nested-loop, no cartesian") {
    val l = leftDf((1L, "a", 5L), (2L, "b", 6L))
    val r = rightDf(("a", 1L, 1.0), ("b", 2L, 2.0))
    val plan = AsOf.join(l, r, "k", "ts", Seq("v")).queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"), plan)
    assert(!plan.contains("SortMergeJoin") && !plan.contains("BroadcastHashJoin"), plan)
  }
}
