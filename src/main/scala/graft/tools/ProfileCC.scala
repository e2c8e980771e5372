package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch diagnostic main: stage-by-stage wall-time decomposition of the
  * clean-corpus pipeline at a given SF. Not part of the driver contract. */
object ProfileCC {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id)").collect()

    def t[A](name: String)(f: => A): A = {
      val s = System.nanoTime(); val r = f
      println(f"[profile] $name%-28s ${(System.nanoTime() - s) / 1e9}%.2f s"); r
    }

    // full query twice (cold + warm)
    t("full cold") { graft.queries.LlmOps.qs("llm_clean_corpus").fn(spark, sfDir).count() }
    spark.sharedState.cacheManager.clearCache()
    t("full warm") { graft.queries.LlmOps.qs("llm_clean_corpus").fn(spark, sfDir).count() }
    spark.sharedState.cacheManager.clearCache()
    t("minhash_lsh standalone") { graft.queries.LlmOps.qs("llm_minhash_lsh").fn(spark, sfDir).count() }
    spark.sharedState.cacheManager.clearCache()
    t("minhash_lsh again") { graft.queries.LlmOps.qs("llm_minhash_lsh").fn(spark, sfDir).count() }
    spark.stop()
  }
}
