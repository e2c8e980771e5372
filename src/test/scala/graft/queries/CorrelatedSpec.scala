package graft.queries

import graft.SparkSuite

/** The correlated-subquery queries must DECORRELATE: Catalyst's subquery
  * rewrites have to land on hash semi/anti joins and grouped aggregates —
  * a nested-loop or cartesian fallback would be quadratic at corpus scale
  * (PlanSweep enforces the same globally; these asserts pin the POSITIVE
  * shape, not just the absence of the bad one). */
class CorrelatedSpec extends SparkSuite {

  private val d = "/root/testdata/sf0.001"

  private def plan(name: String): String =
    Registry.all(name).fn(spark, d).queryExecution.executedPlan.toString

  test("q2_corr_min: scalar MIN decorrelates to a grouped aggregate + hash join") {
    val p = plan("q2_corr_min")
    assert(p.contains("HashAggregate"), p.take(400))
    assert(!p.contains("BroadcastNestedLoop") && !p.contains("CartesianProduct"))
    // the min must be computed once per partkey, not per outer row
    assert(p.contains("min(l_extendedprice"), p.take(400))
  }

  test("q4_exists: EXISTS becomes a LeftSemi hash join on the order key") {
    val p = plan("q4_exists")
    assert(p.contains("LeftSemi"), p.take(400))
    assert(!p.contains("BroadcastNestedLoop") && !p.contains("CartesianProduct"))
  }

  test("q21_anti_semi: EXISTS + NOT EXISTS land as LeftSemi + LeftAnti hash joins") {
    val p = plan("q21_anti_semi")
    assert(p.contains("LeftSemi"), p.take(400))
    assert(p.contains("LeftAnti"), p.take(400))
    assert(!p.contains("BroadcastNestedLoop") && !p.contains("CartesianProduct"))
  }

  test("q17_avg_threshold: correlated scalars decorrelate; membership is decimal-exact") {
    val p = plan("q17_avg_threshold")
    assert(p.contains("HashAggregate"), p.take(400))
    assert(!p.contains("BroadcastNestedLoop") && !p.contains("CartesianProduct"))
    // one aggregate row comes out
    val rows = Registry.all("q17_avg_threshold").fn(spark, d).collect()
    assert(rows.length == 1)
  }

  test("q20_nested_in: HAVING's correlated scalars decorrelate; membership is a LeftSemi hash join") {
    val p = plan("q20_nested_in")
    assert(p.contains("LeftSemi"), p.take(400))
    assert(p.contains("HashAggregate"), p.take(400))
    assert(!p.contains("BroadcastNestedLoop") && !p.contains("CartesianProduct"))
    // the 3x bar must stay discriminating, not vacuous, at tiny SF
    val n = Registry.all("q20_nested_in").fn(spark, d).count()
    val total = graft.core.Tables.supplier(spark, d).count()
    assert(n > 0 && n < total, s"$n of $total suppliers")
  }

  test("q22_anti_avg: scalar average threshold + NOT EXISTS land as hash joins") {
    val p = plan("q22_anti_avg")
    assert(p.contains("LeftAnti"), p.take(400))
    assert(!p.contains("BroadcastNestedLoop") && !p.contains("CartesianProduct"))
    Registry.all("q22_anti_avg").fn(spark, d).count() // may be empty at sf0.001; must execute
  }

  test("q2/q4/q21 return plausible non-empty results at sf0.001") {
    assert(Registry.all("q2_corr_min").fn(spark, d).count() > 0)
    assert(Registry.all("q4_exists").fn(spark, d).count() > 0)
    // q21 may legitimately be empty at tiny SF; just require it executes
    Registry.all("q21_anti_semi").fn(spark, d).count()
  }
}
