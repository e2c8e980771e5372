package graft.plans

import org.apache.spark.sql.functions._
import graft.SparkSuite

/** The bucketed co-located join must actually be co-located: zero shuffle
  * exchanges anywhere in the executed plan — not for the sort-merge join,
  * not for the per-key aggregate after it. The unbucketed twin of the same
  * query is the control: it MUST shuffle, proving the assertion bites. */
class BucketedJoinSpec extends SparkSuite {

  private val d = "/root/testdata/sf0.001"

  test("bucketed join + keyed agg runs with zero exchanges; unbucketed twin shuffles") {
    assume(new java.io.File(s"$d/lineitem.parquet").exists())
    val df = graft.queries.Relational.qBucketedJoin(spark, d)
    df.count() // materialize through AQE so the final plan is decided
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"bucketed plan shuffles:\n$plan")
    assert(plan.contains("SortMergeJoin"), s"expected a sort-merge join:\n$plan")
    // bucket metadata must actually be read back (selected bucket count)
    assert(plan.contains("Bucketed: true"), s"scan did not use bucketing:\n$plan")

    val li = graft.core.Tables.lineitem(spark, d)
      .select("l_orderkey", "l_extendedprice", "l_discount")
    val o = graft.core.Tables.orders(spark, d).select("o_orderkey", "o_orderdate")
    val twin = li.hint("merge").join(o, li("l_orderkey") === o("o_orderkey"))
      .groupBy(col("o_orderkey")).agg(count(lit(1)).as("n_items"))
    twin.count()
    assert(twin.queryExecution.executedPlan.toString.contains("Exchange"),
      "control: the unbucketed twin should shuffle — assertion is vacuous")
  }

  test("bucketed result equals the plain-join computation") {
    assume(new java.io.File(s"$d/lineitem.parquet").exists())
    val li = graft.core.Tables.lineitem(spark, d)
    val o = graft.core.Tables.orders(spark, d)
    val plain = li.join(o, li("l_orderkey") === o("o_orderkey"))
      .groupBy(col("o_orderkey"))
      .agg(sum(col("l_extendedprice").cast("decimal(18,2)") *
          (lit(1) - col("l_discount")).cast("decimal(18,2)"))
        .cast("double").as("revenue"),
        count(lit(1)).as("n_items"))
    assertSameRows(graft.queries.Relational.qBucketedJoin(spark, d), plain)
  }
}
