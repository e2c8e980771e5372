package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.SparkSuite

/** The bucketed two-level prefix sum must be ROW-FOR-ROW equal to the
  * stratum-wide cumsum window it replaces (tokenBudget, packSequences, the
  * build/tokenize-pack offsets), under any input partitioning, including
  * bucket-boundary rows and skewed strata. */
class PrefixSumSpec extends SparkSuite {

  // skewed fleet: stratum "big" carries 40 rows, "small" 3, ids interleaved
  // so id-buckets (shift=2 → 4 ids/bucket) mix strata within a bucket range
  private def fleet: DataFrame = {
    val rows = (0L until 43L).map { i =>
      val s = if (i % 14 == 13) "small" else "big"
      Row(i, s, (i % 7) + 1) // values 1..7, non-uniform per bucket
    }
    df("id BIGINT, src STRING, v BIGINT", rows)
  }

  private def windowed(d: DataFrame, inclusive: Boolean): DataFrame = {
    val w = Window.partitionBy("src").orderBy(col("id").asc)
      .rowsBetween(Window.unboundedPreceding,
        if (inclusive) Window.currentRow else -1)
    d.withColumn("cum", coalesce(sum(col("v")).over(w), lit(0L)))
  }

  test("inclusive running total equals the stratum window, id buckets") {
    val d = fleet.repartition(5)
    val got = PrefixSum.running(d, Seq("src"),
      PrefixSum.idBucket(col("id"), shift = 2),
      Seq(col("id").asc), col("v"), "cum", inclusive = true)
    assertSameRows(got, windowed(d, inclusive = true))
  }

  test("exclusive running total equals the 1-PRECEDING window, id buckets") {
    val d = fleet.repartition(7)
    val got = PrefixSum.running(d, Seq("src"),
      PrefixSum.idBucket(col("id"), shift = 2),
      Seq(col("id").asc), col("v"), "cum", inclusive = false)
    assertSameRows(got, windowed(d, inclusive = false))
  }

  test("hash-bucket coarsening: high bits of the order hash preserve order") {
    // order key IS the 60-bit hash — exactly tokenBudget's shape; 4-bit
    // buckets force many cross-bucket boundaries at 43 rows
    val d = fleet.withColumn("h",
      graft.llm.TextOps.hash60(concat(col("id").cast("string"), lit(":t"))))
    val w = Window.partitionBy("src").orderBy(col("h").asc, col("id").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val want = d.withColumn("cum", sum(col("v")).over(w))
    val got = PrefixSum.running(d, Seq("src"),
      PrefixSum.hashBucket(col("h"), bits = 4),
      Seq(col("h").asc, col("id").asc), col("v"), "cum", inclusive = true)
    assertSameRows(got, want)
  }

  test("degenerate single bucket reduces to the plain window") {
    val d = fleet
    val got = PrefixSum.running(d, Seq("src"),
      PrefixSum.idBucket(col("id")), // shift 16 → every id in bucket 0
      Seq(col("id").asc), col("v"), "cum", inclusive = true)
    assertSameRows(got, windowed(d, inclusive = true))
  }

  test("column order is preserved and the out column appends") {
    val got = PrefixSum.running(fleet, Seq("src"),
      PrefixSum.idBucket(col("id"), shift = 2),
      Seq(col("id").asc), col("v"), "cum", inclusive = true)
    assert(got.columns.toSeq == Seq("id", "src", "v", "cum"))
  }

  test("a NULL stratum is an ordinary group, like the window form — no dropped rows") {
    val d = df("id BIGINT, src STRING, v BIGINT", Seq(
      Row(1L, null, 10L), Row(2L, "a", 1L), Row(3L, null, 5L), Row(4L, "a", 2L)))
    val got = PrefixSum.running(d, Seq("src"),
      PrefixSum.idBucket(col("id"), shift = 1),
      Seq(col("id").asc), col("v"), "cum", inclusive = true)
    assertSameRows(got, windowed(d, inclusive = true))
    assert(got.count() == 4)
  }

  test("expensive values: a PERSISTED valued frame is evaluated once across both scans") {
    // the tokenBudget/packSequences pattern — PrefixSum consumes its input
    // twice (narrow totals scan + main pass), so an expensive value column
    // must be materialized at the call site. This pins that the persisted
    // frame's derivation fires once per row, not once per scan (and that
    // the cache serves both the pruned totals scan and the full pass).
    val evals = spark.sparkContext.longAccumulator("ps_value_evals")
    val counted = udf { x: Long => evals.add(1); x }
    val d = fleet.repartition(5)
      .withColumn("nv", counted(col("v"))).persist()
    try {
      val got = PrefixSum.running(d, Seq("src"),
        PrefixSum.idBucket(col("id"), shift = 2),
        Seq(col("id").asc), col("nv"), "cum", inclusive = true)
      assertSameRows(got.drop("nv"), windowed(fleet, inclusive = true))
      assert(evals.value == 43L,
        s"value derivation fired ${evals.value} times for 43 rows — the " +
          "persisted frame is being recomputed per scan")
    } finally { d.unpersist(); () }
  }

  test("first row of every stratum gets 0 in the exclusive form") {
    val got = PrefixSum.running(fleet, Seq("src"),
      PrefixSum.idBucket(col("id"), shift = 2),
      Seq(col("id").asc), col("v"), "cum", inclusive = false)
    val firsts = got.withColumn("rk", row_number().over(
        Window.partitionBy("src").orderBy(col("id").asc)))
      .filter(col("rk") === 1).select("cum").collect().map(_.getLong(0))
    assert(firsts.toSeq == Seq(0L, 0L))
  }
}
