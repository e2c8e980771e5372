package graft.plans

import graft.SparkSuite

/** The tokenizer ENCODE queries' 100 TB property: after the bounded-model
  * train step, encoding is ONE narrow scan — the learned model (merge
  * cascade / vocabulary) rides inside a codegen'd kernel as a plan
  * reference, so the executed plan must contain no KEYED exchange (no hash
  * or range repartition — nothing that would shuffle corpus bytes by key at
  * scale) and the kernel must sit inside a WholeStageCodegen span. The one
  * allowed exchange is `Tables.spread`'s round-robin fan-out, a test-data
  * artifact (the driver's parquet is single-row-group, hence unsplittable —
  * a real lake scan parallelizes at the source and needs no spread). */
class TokenizerPlanSpec extends SparkSuite {

  private val d = "/root/testdata/sf0.001"

  private def executed(df: org.apache.spark.sql.DataFrame): String = {
    df.collect() // drive THIS QueryExecution so AQE finalizes the plan
    df.queryExecution.executedPlan.toString
  }

  private def assertNarrowScan(plan: String, kernel: String): Unit = {
    assert(!plan.contains("hashpartitioning"),
      s"$kernel encode shuffles by key:\n$plan")
    assert(!plan.contains("rangepartitioning"),
      s"$kernel encode global-sorts:\n$plan")
    // executed plans render whole-stage-codegen spans as a `*(n)` prefix —
    // the kernel's Project must carry one
    assert(plan.linesIterator.exists(l => l.contains(kernel) && l.contains("*(")),
      s"kernel not inside a codegen span:\n$plan")
  }

  test("llm_wordpiece_encode is a keyed-shuffle-free codegen'd scan") {
    assume(new java.io.File(s"$d/documents.parquet").exists())
    assertNarrowScan(
      executed(graft.queries.BpeOps.wordpieceEncode(spark, d)), "word_pieces")
  }

  test("llm_bpe_encode is a keyed-shuffle-free codegen'd scan") {
    assume(new java.io.File(s"$d/documents.parquet").exists())
    assertNarrowScan(
      executed(graft.queries.BpeOps.bpeEncode(spark, d)), "bpe_pieces")
  }
}
