package graft.queries

import org.apache.spark.sql.functions._
import graft.SparkSuite

/** Dynamic partition pruning proof for `q_dpp_join`: the partitioned fact
  * scan must carry a runtime DynamicPruningExpression (the dim's filter is
  * on a non-join attribute, so nothing static can prune), and the files the
  * scan actually opens must be exactly the dim-selected day folders.
  * `df.inputFiles` ignores runtime pruning, so the file assertion goes
  * through `input_file_name()` on the executed join (CLAUDE.md rule). */
class DppSpec extends SparkSuite {

  private val d = "/root/testdata/sf0.001"

  test("q_dpp_join prunes the fact scan at runtime to the dim-selected day partitions") {
    // Build the lake + run the full query once (also proves it returns rows).
    val agg = SinkOps.qDppJoin(spark, d)
    val rows = agg.collect()
    // expectations derive from the dim itself — the driver regenerates
    // /root/testdata between rounds, so no hardcoded calendar
    val expected = SinkOps.dppDim(spark, d).select("day")
      .collect().map(_.getString(0)).toSet
    assert(rows.nonEmpty && rows.length == expected.size,
      s"expected ${expected.size} dim-selected day groups, got ${rows.length}")

    // Re-plan the join over the written lake: the fact FileScan must carry
    // a dynamicpruning partition filter (runtime, not static — the dim's
    // dom<=7 predicate can't propagate through the join key).
    val joined = SinkOps.dppJoinFrame(spark, d, "/tmp/graft_dpp/events")
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.toLowerCase.contains("dynamicpruning"),
      s"no DynamicPruningExpression in the fact scan:\n${plan.take(2000)}")

    // Execute and observe which files the scan actually opened: only the 7
    // matching day= folders, out of 30 written. input_file_name() must be
    // tagged on the fact BEFORE the join (multi-source restriction).
    val tagged = SinkOps.dppFact(spark, "/tmp/graft_dpp/events")
      .withColumn("f", input_file_name())
      .join(broadcast(SinkOps.dppDim(spark, d)), Seq("day"))
    val seenDays = tagged.select(col("f")).distinct()
      .collect().map(_.getString(0))
      .map { f =>
        val m = "day=([0-9-]+)".r.findFirstMatchIn(f)
        assert(m.isDefined, s"file outside a day= partition folder: $f")
        m.get.group(1)
      }.toSet
    assert(seenDays == expected,
      s"scan touched wrong partitions: $seenDays vs dim $expected")
    // ... and pruning must have had something to prune: the lake carries
    // strictly more day folders than the dim selects
    val allDays = new java.io.File("/tmp/graft_dpp/events").listFiles()
      .count(_.getName.startsWith("day="))
    assert(allDays > expected.size,
      s"fixture degenerate: $allDays folders written, dim selects ${expected.size}")
  }
}
