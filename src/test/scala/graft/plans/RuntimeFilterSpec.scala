package graft.plans

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.FilterExec
import graft.SparkSuite

/** Runtime bloom-filter join proof — the AQE-era complement to DppSpec's
  * dynamic partition pruning: when a dim side carries a selective predicate,
  * Spark's InjectRuntimeFilter builds a bloom filter from the dim keys at
  * runtime and applies `might_contain` on the fact side BEFORE
  * the shuffle, so a 100 TB fact scan ships only candidate rows into the
  * exchange. The proof asserts both halves: the filter node in the EXECUTED
  * plan, and the actual row-count reduction its metric records. */
class RuntimeFilterSpec extends SparkSuite {

  private def withConf(pairs: (String, String)*)(f: => Unit): Unit = {
    val old = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try f
    finally old.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("runtime bloom filter injects on a selective dim→fact shuffle join and prunes the fact side") {
    val dir = java.nio.file.Files.createTempDirectory("graft_rtf_").toString
    // fact: 200k rows over 1000 keys; payload keeps the scan non-trivial
    spark.range(200000L)
      .select((col("id") % 1000L).as("k"),
        sha2(col("id").cast("string"), 256).as("payload"))
      .write.parquet(s"$dir/fact")
    // dim: 1000 keys, 50 categories → a cat filter keeps 2% of keys
    spark.range(1000L)
      .select(col("id").as("k"), (col("id") % 50L).as("cat"))
      .write.parquet(s"$dir/dim")
    withConf(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      // default 10GB: no fixture ever qualifies — drop to test scale
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "1KB",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "10MB",
      // force a shuffle join: that's the case a runtime filter pays for
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      // static plan so FilterExec is directly collectible (the rule is an
      // optimizer injection, independent of AQE re-planning)
      "spark.sql.adaptive.enabled" -> "false") {
      val fact = spark.read.parquet(s"$dir/fact")
      val dim = spark.read.parquet(s"$dir/dim").filter(col("cat") === 0L)
      val joined = fact.join(dim, Seq("k"))
        .agg(count(lit(1)).as("n"), sum(length(col("payload"))).as("bytes"))

      // correctness first: 20 surviving keys × 200 fact rows each
      val row = joined.collect()(0)
      assert(row.getLong(0) == 4000L, s"join lost rows: ${row.getLong(0)}")

      val plan = joined.queryExecution.executedPlan
      assert(plan.toString.contains("might_contain"),
        s"no runtime bloom filter in the executed plan:\n${plan.toString.take(3000)}")
      // the injected filter must have actually PRUNED: its output is the
      // matching rows (+ bloom false positives), far below the 200k scanned
      val bloomFilters = plan.collect {
        case f: FilterExec if f.condition.toString.contains("might_contain") => f
      }
      assert(bloomFilters.nonEmpty, "bloom filter planned but not as a FilterExec")
      val out = bloomFilters.map(_.metrics("numOutputRows").value).sum
      assert(out >= 4000L && out < 40000L,
        s"bloom filter passed $out of 200000 fact rows — no real pruning")
    }
  }

  test("runtime bloom filter does NOT inject without a selective creation-side predicate") {
    val dir = java.nio.file.Files.createTempDirectory("graft_rtf2_").toString
    spark.range(50000L).select((col("id") % 100L).as("k")).write.parquet(s"$dir/fact")
    spark.range(100L).select(col("id").as("k")).write.parquet(s"$dir/dim")
    withConf(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "1KB",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.enabled" -> "false") {
      // no filter on the dim: a bloom of ALL keys prunes nothing — the rule
      // must decline (building it would be pure overhead at 100 TB)
      val joined = spark.read.parquet(s"$dir/fact")
        .join(spark.read.parquet(s"$dir/dim"), Seq("k"))
        .agg(count(lit(1)).as("n"))
      assert(joined.collect()(0).getLong(0) == 50000L)
      assert(!joined.queryExecution.executedPlan.toString
        .contains("might_contain"))
    }
  }
}
