package graft.tools

import org.apache.spark.sql.SparkSession

/** Plan-audit main: prints formatted physical plans for the queries whose
  * 100 TB behavior matters most, to keep shuffle/pushdown regressions
  * visible. Not part of the driver contract. */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val interesting = Seq(
      "q1_agg", "q3_join", "q_topk", "s7_select",
      "llm_minhash_lsh", "llm_embed_neardup", "llm_ann_multiprobe",
      "llm_exact_dedup", "d2_merge_window", "t1_flatten",
      "llm_decontaminate", "llm_pack", "llm_sample", "llm_redact",
      "llm_chunk_dedup", "llm_tfidf", "llm_entropy", "llm_incremental",
      "llm_semdedup", "llm_quota", "q_asof", "q_interval_join")
    val qs = graft.queries.Registry.all
    interesting.foreach { name =>
      println(s"\n===== $name =====")
      try println(qs(name).fn(spark, sfDir).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
      catch { case e: Throwable => println(s"(failed: ${e.getMessage})") }
    }
    spark.stop()
  }
}
