package graft

import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._
import graft.sink.FileSink

/** Scale-shape proofs — the reference's bigdata_test.go (1M-row batch) and
  * the co-located-join posture the 100 TB design leans on. These verify the
  * SHAPE holds (row counts, dedup math, no shuffle in the plan), not wall
  * time. */
class ScaleSpec extends SparkSuite {

  test("1M-row batch: shape → dedup → file sink completes with exact counts (bigdata_test.go:18-39)") {
    // 1M synthetic events, 100k distinct pks → dedup keeps exactly 100k
    val million = spark.range(1000000L).select(
      (col("id") % 100000L).as("pk"),
      col("id").as("arrival"),
      concat(lit("v"), col("id")).as("v"))
    val dir = java.nio.file.Files.createTempDirectory("graft_big_").toString
    FileSink.write(million, dir, SaveMode.Overwrite,
      FileSink.Config(format = "parquet", pk = Seq("pk")),
      arrival = Some(col("arrival")))
    val back = spark.read.parquet(dir)
    assert(back.count() == 100000L)
    // last-wins: pk 0 survives as arrival 999...0 → id 900000
    assert(back.filter(col("pk") === 0L).select("arrival").collect()(0).getLong(0) == 900000L)
  }

  test("bucketed tables co-locate the join: NO shuffle exchange in the plan") {
    spark.sql("DROP TABLE IF EXISTS buck_orders")
    spark.sql("DROP TABLE IF EXISTS buck_lines")
    spark.range(10000L).select(col("id").as("okey"), (col("id") % 7).as("status"))
      .write.bucketBy(8, "okey").sortBy("okey").saveAsTable("buck_orders")
    spark.range(30000L).select((col("id") % 10000L).as("okey"), col("id").as("line"))
      .write.bucketBy(8, "okey").saveAsTable("buck_lines")
    val joined = spark.table("buck_orders").join(spark.table("buck_lines"), "okey")
    assert(joined.count() == 30000L) // execute first: AQE finalizes the plan
    val plan = joined.queryExecution.executedPlan.toString
    // both sides pre-bucketed on the join key → SortMergeJoin with ZERO
    // shuffle Exchanges: the co-located layout a 100 TB fact-fact join needs
    // (broadcast of the small side is fine — no data moved by key)
    assert(!plan.contains("Exchange hashpartitioning"), plan)
  }

  test("AQE coalesces post-shuffle partitions on small data (runtime re-plan)") {
    assert(spark.conf.get("spark.sql.adaptive.enabled") == "true") // Spark 4 default
    val agg = spark.range(100000L)
      .groupBy((col("id") % 50L).as("k")).count()
    // materialize through an action that keeps the adaptive plan, then
    // inspect the FINAL (post-execution) plan
    agg.collect()
    val finalPlan = agg.queryExecution.executedPlan.toString
    assert(finalPlan.contains("AQEShuffleRead") || finalPlan.contains("isFinalPlan=true"),
      finalPlan.take(500))
  }
}
