package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch perf probe (not part of the driver contract). */
object IvfProbe {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id)").collect()
    def time(tag: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[probe] $tag%-30s ${(System.nanoTime() - t0) / 1e9}%8.3f s  rows=$n")
    }
    time("clean_corpus full")(graft.queries.LlmOps.cleanCorpus(spark, d).count())
    time("clean_corpus again")(graft.queries.LlmOps.cleanCorpus(spark, d).count())
    time("minhash_lsh full docs")(graft.queries.LlmOps.minhashLsh(spark, d).count())
    spark.stop()
  }
}
