package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.llm.TextOps

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
      println(f"[probe] $tag%-26s ${(System.nanoTime() - t0) / 1e9}%8.3f s  rows=$n")
    }
    def sh0 = Tables.documents(spark, d).select(col("doc_id"),
      explode(TextOps.shingles(TextOps.tokens(col("text")), 3)).as("s"))
    def winCap: DataFrame = sh0
      .withColumn("df", count(lit(1)).over(Window.partitionBy("s")))
      .filter(col("df") <= 100).drop("df")
    def bcastCap: DataFrame = {
      val hot = sh0.groupBy("s").agg(count(lit(1)).as("df"))
        .filter(col("df") > 100).select("s")
      sh0.join(broadcast(hot), Seq("s"), "left_anti")
    }
    (1 to 2).foreach { i =>
      time(s"window cap #$i")(winCap.count())
      time(s"broadcast cap #$i")(bcastCap.count())
    }
    spark.stop()
  }
}
