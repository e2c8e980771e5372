package graft.queries

import org.apache.spark.sql.functions._
import graft.SparkSuite
import graft.core.Tables

/** `llm_lsh_eval_sampled` must be the RESTRICTION of the exact eval forms —
  * the sampled estimator is only trustworthy if its pair sets equal the
  * full pipelines' pair sets filtered to sample-touching pairs, and its
  * cost only scales as |sample| if no full-corpus prefix build sneaks in. */
class SampledEvalSpec extends SparkSuite {

  private val d = "/root/testdata/sf0.001"

  test("sampled exact/LSH pair sets equal the full pipelines restricted to the sample") {
    val (exactS, lshS, cached) = LlmOps.sampledPairSets(spark, d)
    try {
      val sampleIds = Tables.documents(spark, d)
        .filter(LlmOps.evalSampled(col("doc_id")))
        .select("doc_id").collect().map(_.getLong(0)).toSet
      def touching(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
        df.select("i", "j").collect()
          .map(r => (r.getLong(0), r.getLong(1)))
          .filter { case (i, j) => sampleIds(i) || sampleIds(j) }.toSet
      val fullExact = touching(Registry.all("llm_prefix_join").fn(spark, d))
      val fullLsh = touching(Registry.all("llm_minhash_lsh").fn(spark, d))
      val sampExact = exactS.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val sampLsh = lshS.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(sampExact == fullExact,
        s"exact restriction mismatch: only-sampled=${sampExact -- fullExact} only-full=${fullExact -- sampExact}")
      assert(sampLsh == fullLsh,
        s"lsh restriction mismatch: only-sampled=${sampLsh -- fullLsh} only-full=${fullLsh -- sampLsh}")
      // every sampled pair touches the sample (the one-sided build can't leak
      // unsampled×unsampled pairs)
      assert(sampExact.forall { case (i, j) => sampleIds(i) || sampleIds(j) })
      assert(sampLsh.forall { case (i, j) => sampleIds(i) || sampleIds(j) })
    } finally cached.foreach(_.unpersist())
  }

  test("the sampled plan prefixes only sampled docs (cost scales as |sample|)") {
    val (exactS, _, cached) = LlmOps.sampledPairSets(spark, d)
    try {
      // the prefix build (sort_array over collected shingles) must sit above
      // a pmod-filter on doc_id — i.e. only the sampled slice is ever
      // aggregated into prefixes; the full corpus contributes only the flat
      // (doc_id, s) index side
      val plan = exactS.queryExecution.analyzed.toString
      assert(plan.contains("pmod"), plan.take(500))
      assert(plan.contains("sort_array"), plan.take(500))
    } finally cached.foreach(_.unpersist())
  }
}
