package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.llm.Similarity

/** Scratch perf probe (not part of the driver contract). */
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
    import spark.implicits._
    val raw = Tables.spread(spark, Tables.lineitem(spark, d)).select(to_json(struct(
      struct(col("l_orderkey").as("key"), col("l_linenumber").cast("long").as("line")).as("order"),
      col("l_quantity").as("qty"),
      array(col("l_returnflag"), col("l_linestatus")).as("tags"),
      col("l_partkey").as("$part key!"),
      col("l_shipdate").as("ship"))).as("j")).as[String]
    time("raw lines count")(raw.count())
    time("t1 full")(graft.shape.Ingest.shape(spark, raw,
      graft.shape.Ingest.ShapeOptions(cacheNormalized = true)).df.count())
    time("t1 full again")(graft.shape.Ingest.shape(spark, raw,
      graft.shape.Ingest.ShapeOptions(cacheNormalized = true)).df.count())
    val emb = Tables.embeddings(spark, d)
    val q = emb.filter(col("vec_id") < 10)
    time("full ivf")(Similarity.ivfTopK(q, emb, emb.filter(col("vec_id") < 16), 5, 2).count())
    spark.stop()
  }
}
