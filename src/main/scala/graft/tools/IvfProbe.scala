package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.llm.Similarity

object IvfProbe {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.01")
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
    sys.env.get("PROBE_NOCODEGEN").foreach(_ => spark.conf.set("spark.sql.codegen.wholeStage", "false"))
    val emb = Tables.embeddings(spark, d)
    time("emb.count")(emb.count())
    time("emb.count again")(emb.count())
    val q = emb.filter(col("vec_id") < 10)
    time("full ivf")(Similarity.ivfTopK(q, emb, emb.filter(col("vec_id") < 16), 5, 2).count())
    time("full ivf again")(Similarity.ivfTopK(q, emb, emb.filter(col("vec_id") < 16), 5, 2).count())
    spark.stop()
  }
}
