package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
object T1Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = "/root/testdata/sf0.1"
    import spark.implicits._
    def raw = graft.core.Tables.spread(spark, graft.core.Tables.lineitem(spark, d)).select(to_json(struct(
      struct(col("l_orderkey").as("key"), col("l_linenumber").cast(LongType).as("line")).as("order"),
      col("l_quantity").as("qty"),
      array(col("l_returnflag"), col("l_linestatus")).as("tags"),
      col("l_partkey").as("$part key!"),
      col("l_shipdate").as("ship"))).as("j")).as[String]
    def time(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f; println(s"PROBE $name ${(System.nanoTime()-t0)/1e9}")
    }
    time("warm")(spark.range(10).selectExpr("sum(id)").collect())
    time("rawcount")(raw.count())
    for (i <- 1 to 2) {
      time(s"shape_cache_5pct_$i")({graft.shape.Ingest.shape(spark, raw,
        graft.shape.Ingest.ShapeOptions(cacheNormalized = true, samplingRatio = 0.05)).df.count()
        spark.sharedState.cacheManager.clearCache()})
      time(s"shape_nocache_5pct_$i")(graft.shape.Ingest.shape(spark, raw,
        graft.shape.Ingest.ShapeOptions(samplingRatio = 0.05)).df.count())
      time(s"shape_nocache_full_$i")(graft.shape.Ingest.shape(spark, raw,
        graft.shape.Ingest.ShapeOptions()).df.count())
      time(s"shape_cache_full_$i")({graft.shape.Ingest.shape(spark, raw,
        graft.shape.Ingest.ShapeOptions(cacheNormalized = true)).df.count()
        spark.sharedState.cacheManager.clearCache()})
    }
    spark.stop()
  }
}
