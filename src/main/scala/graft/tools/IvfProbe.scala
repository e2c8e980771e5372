package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch perf probe (not part of the driver contract). */
object IvfProbe {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id)").collect()
    // count jobs via listener
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobs.incrementAndGet(); ()
      }
    })
    def time(tag: String)(f: => Long): Unit = {
      val j0 = jobs.get()
      val t0 = System.nanoTime()
      val n = f
      println(f"[probe] $tag%-26s ${(System.nanoTime() - t0) / 1e9}%8.3f s  rows=$n jobs=${jobs.get() - j0}")
    }
    time("b4 full")(graft.queries.StreamOps.b4RetryPipeline(spark, d).count())
    time("b4 again")(graft.queries.StreamOps.b4RetryPipeline(spark, d).count())
    spark.stop()
  }
}
