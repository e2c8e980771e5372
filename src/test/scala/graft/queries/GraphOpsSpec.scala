package graft.queries

import org.apache.spark.sql.functions._
import graft.SparkSuite

/** Fixed-point PageRank: the driver fast path and the distributed loop must
  * be BIT-IDENTICAL (integer arithmetic makes that a hard equality, not a
  * tolerance), and the rank order must reflect the link structure. */
class GraphOpsSpec extends SparkSuite {
  import spark.implicits._

  /** Seeded random multigraph over `n` string nodes. */
  private def randomEdges(n: Int, m: Int, seed: Long): Seq[(String, String, Long)] = {
    val rnd = new scala.util.Random(seed)
    (0 until m).map { _ =>
      (s"p${rnd.nextInt(n)}", s"p${rnd.nextInt(n)}", 1L + rnd.nextInt(5))
    }.groupBy(e => (e._1, e._2))
      .map { case ((s0, d0), es) => (s0, d0, es.map(_._3).sum) }.toSeq
  }

  test("distributed loop is bit-identical to the driver fast path (incl. dangling nodes)") {
    // p0..p19 with edges, plus a SINK node that only receives (dangling)
    val edges = randomEdges(20, 60, seed = 5L) ++ Seq(("p0", "sink", 3L), ("p1", "sink", 2L))
    val driver = GraphOps.pageRankDriver(edges, GraphOps.PrIters)
    val dist = GraphOps.pageRankDistributed(
        edges.toDF("src", "dst", "w"), GraphOps.PrIters)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(dist == driver)
    // dangling sanity: the sink exists, got rank, and mass was redistributed
    assert(driver.contains("sink") && driver("sink") > 0L)
  }

  test("triangle count: K5 walk = 10; shared-edge bowtie = 2; star = 0") {
    def count(edges: Seq[(Int, Int)]): Long =
      GraphOps.triangleCount(
          edges.map { case (x, y) => (math.min(x, y), math.max(x, y)) }
            .distinct.toDF("a", "b"))
        .collect().head.getLong(2)
    // complete graph K5: C(5,3) = 10 triangles
    val k5 = for (i <- 1 to 5; j <- (i + 1) to 5) yield (i, j)
    assert(count(k5) == 10L)
    // two triangles sharing edge (1,2)
    assert(count(Seq((1, 2), (1, 3), (2, 3), (1, 4), (2, 4))) == 2L)
    // star: wedges everywhere, no closures
    assert(count((2 to 8).map(i => (1, i))) == 0L)
  }

  test("textrank: a word co-occurring with every other word outranks the periphery") {
    // "hub" neighbors every rare word; rare words only ever see "hub"
    val docs = (0 until 12).map(i => (i.toLong, s"hub rare$i", "en", "s0"))
    val dir = java.nio.file.Files.createTempDirectory("graft_trank_").toString
    docs.toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val ranks = GraphOps.llmTextrank(spark, dir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(ranks("hub") > ranks.filter(_._1 != "hub").values.max,
      s"hub not top-ranked: $ranks")
    assert(ranks.size == 13)
  }

  test("rank follows link structure: a hub every node points to outranks leaves") {
    val leaves = (1 to 9).map(i => (s"leaf$i", "hub", 1L))
    val back = Seq(("hub", "leaf1", 1L)) // hub links out so it isn't dangling
    val r = GraphOps.pageRankDriver(leaves ++ back, GraphOps.PrIters)
    assert((2 to 9).forall(i => r("hub") > r(s"leaf$i")), r.toString)
    // total mass stays near 1.0 (truncation can only lose units, never add)
    val total = r.values.sum
    assert(total <= GraphOps.PrUnit && total > (GraphOps.PrUnit * 9) / 10, total.toString)
  }

  test("r·w beyond Long range stays exact (widened product, no silent wrap)") {
    // two nodes, weight 5e7: r ≈ PrUnit/2 = 5e11, so r·w ≈ 2.5e19 > Long.Max
    // — a bare Long product wraps negative and corrupts every rank. The
    // driver (BigInt), distributed (DECIMAL 38) and oracle (HUGEINT) all
    // widen; this pins the first two agreeing and staying in range.
    val w = 50000000L
    val edges = Seq(("a", "b", w), ("b", "a", 1L), ("a", "c", 1L))
    val driver = GraphOps.pageRankDriver(edges, GraphOps.PrIters)
    assert(driver.values.forall(r => r > 0L && r <= GraphOps.PrUnit), driver)
    assert(driver.values.sum <= GraphOps.PrUnit) // truncation only loses mass
    val dist = GraphOps.pageRankDistributed(
        edges.toDF("src", "dst", "w"), GraphOps.PrIters)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(dist == driver, s"$dist vs $driver")
  }

  test("distributed plan: edge-table equi-joins only, no pair product, no global sort") {
    val edges = randomEdges(10, 30, seed = 7L)
    val out = GraphOps.pageRankDistributed(edges.toDF("src", "dst", "w"), 2)
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoop"), plan)
    assert(!plan.contains("rangepartitioning"), plan)
  }
}
