package graft.plans

import org.apache.spark.sql.functions._
import graft.SparkSuite

/** Adaptive-execution proofs — the RUNTIME half of the 100 TB posture that
  * static plans can't show (DppSpec covers runtime partition pruning; this
  * covers runtime skew repair). `q_skew_join` handles KNOWN skew with
  * salting; AQE's OptimizeSkewedJoin is the engine's answer to skew nobody
  * predicted — a planted power-law key must come out of the sort-merge
  * join as split sub-partitions (`skew=true`), not one straggler task. */
class AqeSpec extends SparkSuite {

  private def withConf(pairs: (String, String)*)(f: => Unit): Unit = {
    val old = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try f
    finally old.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("AQE splits a skewed sort-merge join partition at runtime (skew=true)") {
    withConf(
      "spark.sql.adaptive.enabled" -> "true",
      // force a shuffle join so the skew path (not a broadcast) plans
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1",
      // test-scale thresholds: the defaults (256 MB) never trip on fixtures
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "32KB",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "1MB") {
      import spark.implicits._
      // 95% of the fact hangs off ONE key with a fat INCOMPRESSIBLE
      // payload (shuffle sizes are post-compression — an all-'x' pad
      // squeezes under every threshold); the dim is uniform — the classic
      // unpredicted hot-key join
      val fact = spark.range(100000L).select(
        when(col("id") < 95000L, lit(0L)).otherwise(col("id") % 100L).as("k"),
        concat(sha2(col("id").cast("string"), 256),
          sha2((col("id") + 1L).cast("string"), 256)).as("payload"))
      val dim = spark.range(100L).select(col("id").as("k"),
        (col("id") % 7L).as("grp"))
      // the payload must be CONSUMED downstream of the join or column
      // pruning drops it before the shuffle and the skew vanishes
      val joined = fact.join(dim, Seq("k")).groupBy("grp")
        .agg(count(lit(1)).as("n"), sum(length(col("payload"))).as("bytes"))
      val rows = joined.collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      // correctness first: 95000 rows land on key 0 → grp 0
      assert(rows(0L) >= 95000L, s"hot-key rows missing: $rows")
      assert(rows.values.sum == 100000L, s"row loss across the join: $rows")
      // the EXECUTED plan (post-AQE re-plan) must show the skew split
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"no runtime skew split in the executed plan:\n${plan.take(3000)}")
      assert(plan.contains("AQEShuffleRead"),
        s"no AQE shuffle read in the executed plan:\n${plan.take(1500)}")
    }
  }

  test("AQE coalesces an over-partitioned shuffle at runtime") {
    withConf(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "true",
      // tiny data over many shuffle partitions — the 100 TB-config-on-
      // 1 GB-input shape AQE exists to repair
      "spark.sql.shuffle.partitions" -> "64",
      "spark.sql.adaptive.coalescePartitions.parallelismFirst" -> "false",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "8MB") {
      val agg = spark.range(1000L)
        .groupBy((col("id") % 10L).as("k")).agg(count(lit(1)).as("n"))
      assert(agg.collect().length == 10)
      val plan = agg.queryExecution.executedPlan.toString
      assert(plan.contains("coalesced"),
        s"no runtime partition coalescing in the executed plan:\n${plan.take(1500)}")
      // the shuffle that planned 64 partitions must execute with far fewer
      // (toRdd reuses the already-finalized QueryExecution — Dataset.rdd
      // would build a fresh one and re-execute the query)
      val parts = agg.queryExecution.toRdd.getNumPartitions
      assert(parts < 64, s"still $parts partitions after AQE")
    }
  }
}
