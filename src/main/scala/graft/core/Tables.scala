package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated TPC-H-ish parquet tables (TESTDATA.md). */
object Tables {
  /** The test parquet files are single-row-group (unsplittable), so Spark
    * scans them as ONE partition. For the CPU-heavy text/embedding operators
    * (shingling, md5 hashing, cosine math) that serializes ALL work onto one
    * core — spread those scans across the cluster. Only the heavy consumers
    * pay the (tiny) shuffle: cheap relational scans keep their single
    * partition, where a forced shuffle costs more than it saves. At real
    * scale a 100 TB table has thousands of splits and the branch never fires. */
  def spread(spark: SparkSession, df: DataFrame): DataFrame = {
    val target = spark.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < target) df.repartition(target) else df
  }

  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def lineitem(s: SparkSession, d: String): DataFrame  = apply(s, d, "lineitem")
  def orders(s: SparkSession, d: String): DataFrame    = apply(s, d, "orders")
  def customer(s: SparkSession, d: String): DataFrame  = apply(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = apply(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = apply(s, d, "part")
  def nation(s: SparkSession, d: String): DataFrame    = apply(s, d, "nation")
  def region(s: SparkSession, d: String): DataFrame    = apply(s, d, "region")
  def documents(s: SparkSession, d: String): DataFrame = spread(s, apply(s, d, "documents"))
  def embeddings(s: SparkSession, d: String): DataFrame = spread(s, apply(s, d, "embeddings"))

  /** `events.parquet` stores `ts` as parquet TIMESTAMP(NANOS) which Spark's
    * TimestampType (µs) cannot hold; we read nanos as long
    * (`spark.sql.legacy.parquet.nanosAsLong`) and expose:
    *   - `ts_ns`  — raw epoch nanoseconds (long)
    *   - `ts_ms`  — epoch milliseconds (long, floor)
    *   - `ts`     — TimestampType truncated to milliseconds
    * Oracle side uses DuckDB `epoch_ms(ts)` which floors identically. */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    apply(s, d, "events")
      .withColumnRenamed("ts", "ts_ns")
      .withColumn("ts_ms", expr("ts_ns div 1000000"))
      .withColumn("ts", timestamp_millis(col("ts_ms")))
  }
}
