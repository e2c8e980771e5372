package graft.plans

import org.apache.spark.sql.functions._
import graft.SparkSuite

/** The Levenshtein length-bound optimizer rule: fires on top-level
  * conjuncts only, preserves results (incl. nulls), and is idempotent. */
class LevenshteinLengthBoundSpec extends SparkSuite {
  import spark.implicits._

  // parquet-backed so the optimizer cannot constant-fold the whole filter
  // into the LocalRelation
  private lazy val pairsDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_levpairs_").toString
    Seq(("kitten", "sitting"), ("flaw", "lawn"), ("abc", "abcdefgh"),
      ("same", "same"), (null: String, "x"), ("y", null: String))
      .toDF("a", "b").write.mode("overwrite").parquet(dir)
    dir
  }
  private def pairs = spark.read.parquet(pairsDir)

  test("rule plants the length-diff bound and preserves the result set") {
    val q = pairs.filter(levenshtein(col("a"), col("b")) <= 2)
    val before = q.collect().map(r => (r.getString(0), r.getString(1))).toSet
    LevenshteinLengthBound.install(spark)
    val after = pairs.filter(levenshtein(col("a"), col("b")) <= 2)
    assert(after.queryExecution.optimizedPlan.toString.toLowerCase
      .contains("abs((length("), after.queryExecution.optimizedPlan.toString)
    val got = after.collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(got == before && got == Set(("flaw", "lawn"), ("same", "same"))) // lev(kitten,sitting)=3
  }

  test("idempotent, and OR-branches are left alone") {
    LevenshteinLengthBound.install(spark)
    val df = pairs.filter(levenshtein(col("a"), col("b")) <= 1 || length(col("a")) > 3)
    val opt = df.queryExecution.optimizedPlan
    // the lev comparison lives under an Or: no hoisted bound anywhere
    assert(!opt.toString.toLowerCase.contains("abs((length("), opt.toString)
    // fixed-point stability: re-running the rule changes nothing
    val once = LevenshteinLengthBound(
      pairs.filter(levenshtein(col("a"), col("b")) <= 2).queryExecution.analyzed)
    assert(LevenshteinLengthBound(once) == once)
  }

  test("qFuzzyJoin runs under the rule with the bound in its verify filter") {
    val dir = java.nio.file.Files.createTempDirectory("graft_levb_").toString
    Seq((1L, "red widget"), (2L, "red wodget"), (3L, "blue bolt"))
      .toDF("p_partkey", "p_name")
      .write.mode("overwrite").parquet(s"$dir/part.parquet")
    // inspect the PLAN form (qFuzzyJoin itself checkpoints the result away)
    val (plan, keyed) = graft.queries.Relational.fuzzyJoinPlan(spark, dir)
    assert(plan.queryExecution.optimizedPlan.toString.toLowerCase
      .contains("abs((length("), plan.queryExecution.optimizedPlan.toString)
    keyed.unpersist()
    val out = graft.queries.Relational.qFuzzyJoin(spark, dir)
    val got = out.collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(got == Set(("red widget", "red wodget")))
  }
}
