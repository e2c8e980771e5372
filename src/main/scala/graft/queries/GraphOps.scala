package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.Tables

/** Graph analytics over the event stream: PageRank on the session
  * page-transition graph (Brin & Page 1998) — "which screens actually hold
  * the product together", the graph twin of [[EventOps.qPathTopK]]'s path
  * mining.
  *
  * Arithmetic is FIXED-POINT: ranks live in integer units of 10^-12
  * ([[PrUnit]]), every division is integer division, every sum is exact
  * long arithmetic — so the answer is a pure function of the graph,
  * independent of partition order, summation order, and engine (a float
  * power iteration would drift between Spark's and DuckDB's summation
  * orders and libm; the oracle replays all ten iterations bit-for-bit).
  * Truncation loses ≤1 unit (10^-12) per division — PageRank's fixpoint is
  * insensitive to it, and determinism is what the correctness gate needs.
  *
  * Scale shape: events are scanned ONCE through the same user-keyed window
  * as path mining to build the (src, dst, weight) edge aggregate — the
  * graph lives in PAGE space, not event space, so each of the ten
  * iterations joins and aggregates the edge table only. Like
  * [[graft.llm.Corpus.clusterPairs]], a ONE-probe limit-guarded collect
  * takes the driver fast path when the edge table is tiny (page graphs
  * usually are); beyond the cap the distributed loop runs the identical
  * integer arithmetic with `localCheckpoint(true)` per round to truncate
  * iterative lineage ([[GraphOpsSpec]] proves the two paths bit-identical).
  */
object GraphOps {

  private[graft] val PrUnit = 1000000000000L // rank fixed-point: 10^12 = 1.0
  private[queries] val PrIters = 10
  private val PrGapMs = 30L * 60 * 1000 // session gap, same as qPathTopK
  private[queries] val PrDriverEdgeCap = 4096

  /** Driver fast path: exact fixed-point power iteration with damping
    * d = 85/100 and dangling-mass redistribution. */
  private[graft] def pageRankDriver(edges: Seq[(String, String, Long)],
                                      iters: Int): Map[String, Long] = {
    if (edges.isEmpty) return Map.empty // no transitions → no pages (n=0 would divide)
    val outw = edges.groupBy(_._1).map { case (s0, es) => s0 -> es.map(_._3).sum }
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct
    val n = nodes.length.toLong
    val base = 15L * PrUnit / (100L * n)
    var r = nodes.map(v => v -> PrUnit / n).toMap
    for (_ <- 1 to iters) {
      val dang = nodes.filterNot(outw.contains).map(r).sum / n
      val inflow = edges.groupBy(_._2).map { case (dstN, es) =>
        // r·w can exceed Long (r ≲ PrUnit=1e12, w unbounded) — widen the
        // product exactly, as the distributed twin (DECIMAL) and the oracle
        // (HUGEINT) do; the quotient is ≤ r so it fits back in Long.
        dstN -> es.map { case (s0, _, w) => (BigInt(r(s0)) * w / outw(s0)).toLong }.sum
      }
      r = nodes.map(v => v -> (base + 85L * (inflow.getOrElse(v, 0L) + dang) / 100L)).toMap
    }
    r
  }

  /** Distributed twin: per iteration, ONE equi-join of the checkpointed
    * rank frame against the edge table (keyed on src) + ONE map-side-
    * combinable aggregate on dst; the dangling mass is a 1-row
    * control-plane scalar read off the already-materialized checkpoint. */
  private[graft] def pageRankDistributed(edges: DataFrame, iters: Int): DataFrame = {
    val e = edges.select(col("src"), col("dst"), col("w")).persist()
    val outw = e.groupBy(col("src")).agg(sum(col("w")).as("outw"))
    val nodes = e.select(col("src").as("node")).union(e.select(col("dst").as("node")))
      .distinct()
      .join(outw.select(col("src").as("node"), col("outw")), Seq("node"), "left")
      .na.fill(0L, Seq("outw"))
      .persist() // joined every round (rank rebuild) + dangling filter
    val n = nodes.count() // control-plane: the page-space size
    val base = 15L * PrUnit / (100L * n)
    val ew = e.join(outw, "src").persist() // (src, dst, w, outw): the loop operand
    var ranks = nodes.select(col("node"), col("outw"),
      lit(PrUnit / n).as("r"))
    for (_ <- 1 to iters) {
      val cp = ranks.localCheckpoint(true) // truncate iterative lineage
      val dang = cp.filter(col("outw") === 0L)
        .agg(coalesce(sum(col("r")), lit(0L)).as("s")).first().getLong(0) / n
      val inflow = cp.select(col("node"), col("r"))
        .join(ew, col("node") === col("src"))
        .select(col("dst"),
          // widen r·w to DECIMAL(38,0) before the integral divide — a Long
          // product wraps once w ≳ 1e7 on a high-rank node; `div` on
          // decimals still returns BIGINT (truncating, operands nonneg)
          expr("(CAST(r AS DECIMAL(38,0)) * w) div outw").as("c"))
        .groupBy(col("dst")).agg(sum(col("c")).as("inflow"))
      ranks = nodes.join(inflow.withColumnRenamed("dst", "node"), Seq("node"), "left")
        .select(col("node"), col("outw"),
          (lit(base) + expr(s"(85 * (coalesce(inflow, 0L) + ${dang}L)) div 100")).as("r"))
    }
    ranks
  }

  /** PageRank over session page transitions: an edge src→dst for every
    * consecutive same-session event pair (the [[EventOps.qPathTopK]]
    * windowing), weighted by transition count. */
  def qPageRank(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts_ms").asc, col("event_id").asc)
    val trans = Tables.events(s, d)
      .select(col("event_id"), col("user_id"), col("event_type"), col("ts_ms"))
      .withColumn("src", lag(col("event_type"), 1).over(w))
      .withColumn("gap", col("ts_ms") - lag(col("ts_ms"), 1).over(w))
      .filter(col("src").isNotNull && col("gap") <= PrGapMs)
      .groupBy(col("src"), col("event_type").as("dst"))
      .agg(count(lit(1)).as("w"))
    // ONE limit-guarded probe decides the path (the llm_dedup_cluster rule:
    // no eager checkpoint, no extra count pass)
    val probe = trans.limit(PrDriverEdgeCap + 1).collect()
    if (probe.length <= PrDriverEdgeCap) {
      import s.implicits._
      pageRankDriver(probe.toSeq.map(r => (r.getString(0), r.getString(1), r.getLong(2))),
          PrIters)
        .toSeq.toDF("node", "rank_e12")
    } else {
      pageRankDistributed(trans, PrIters).select(col("node"), col("r").as("rank_e12"))
    }
  }

  /** One oracle iteration: dangling mass off r{k-1}, then the damped
    * update. Every multiply-referenced CTE is MATERIALIZED (DuckDB inlines
    * per reference — a 10-deep chain would otherwise expand exponentially,
    * the BPE-train lesson). */
  private def prIterSql(k: Int): String = s"""
    dang$k AS MATERIALIZED (
      SELECT COALESCE(CAST(sum(r) AS BIGINT), 0) // (SELECT nn FROM nc) AS dg
      FROM r${k - 1} WHERE outw = 0),
    r$k AS MATERIALIZED (
      SELECT n.node, n.outw,
        (SELECT (15 * $PrUnit) // (100 * nn) FROM nc)
        + (85 * (COALESCE(inf.s, 0) + (SELECT dg FROM dang$k))) // 100 AS r
      FROM n LEFT JOIN (
        SELECT e.dst AS node, CAST(sum((CAST(p.r AS HUGEINT) * e.w) // p.outw) AS BIGINT) AS s
        FROM r${k - 1} p JOIN e ON e.src = p.node GROUP BY 1) inf
      ON inf.node = n.node)"""

  /** The engine-independent oracle tail: out-weights, node set, initial
    * ranks, and [[PrIters]] replayed iterations — everything downstream of
    * an `e(src, dst, w)` edge CTE, shared by every PageRank-family query
    * (session transitions, TextRank co-occurrence). */
  private def pageRankOracleTail: String = {
    val iters = (1 to PrIters).map(prIterSql).mkString(",")
    s"""
    ow AS MATERIALIZED (SELECT src, CAST(sum(w) AS BIGINT) AS outw FROM e GROUP BY 1),
    n AS MATERIALIZED (
      SELECT u.node, COALESCE(ow.outw, 0) AS outw
      FROM (SELECT src AS node FROM e UNION SELECT dst AS node FROM e) u
      LEFT JOIN ow ON ow.src = u.node),
    nc AS MATERIALIZED (SELECT CAST(count(*) AS BIGINT) AS nn FROM n),
    r0 AS MATERIALIZED (
      SELECT node, outw, (SELECT $PrUnit // nn FROM nc) AS r FROM n),
    $iters
    SELECT node, r AS rank_e12 FROM r$PrIters"""
  }

  private val pageRankOracle = s"""
    WITH ev AS (SELECT event_id, user_id, event_type, epoch_ms(ts) AS ts_ms FROM events),
    tr AS (
      SELECT lag(event_type) OVER w AS src, event_type AS dst,
             ts_ms - lag(ts_ms) OVER w AS gap
      FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY ts_ms ASC, event_id ASC)),
    e AS MATERIALIZED (
      SELECT src, dst, CAST(count(*) AS BIGINT) AS w FROM tr
      WHERE src IS NOT NULL AND gap <= $PrGapMs GROUP BY 1, 2),
    $pageRankOracleTail"""

  // ---- TextRank keyword ranking ----------------------------------------

  private val TextRankWindow = 2

  /** TextRank (Mihalcea & Tarau 2004): PageRank over the word
    * CO-OCCURRENCE graph — an edge per ordered word pair within ±
    * [[TextRankWindow]] positions, weighted by corpus-wide count; rank =
    * corpus keywordness. Pair generation is the narrow slice-zip of
    * [[SketchOps.skipgram]] (no positional self-join), self-loops dropped,
    * and the iterations are the SAME fixed-point integer machinery as
    * [[qPageRank]] — word graphs exceed [[PrDriverEdgeCap]] so this query
    * exercises the checkpointed DISTRIBUTED loop in production, with the
    * oracle replaying every iteration off the shared tail. */
  def llmTextrank(s: SparkSession, d: String): DataFrame = {
    val toksd = Tables.documents(s, d)
      .select(graft.llm.TextOps.tokens(col("text")).as("tk"))
    val n = size(col("tk"))
    def pairsAt(k: Int): Column = concat(
      zip_with(slice(col("tk"), lit(1), greatest(n - k, lit(0))),
        slice(col("tk"), lit(1 + k), greatest(n - k, lit(0))),
        (a, b) => struct(a.as("s"), b.as("t"))),
      zip_with(slice(col("tk"), lit(1 + k), greatest(n - k, lit(0))),
        slice(col("tk"), lit(1), greatest(n - k, lit(0))),
        (a, b) => struct(a.as("s"), b.as("t"))))
    val edges = toksd
      .select(explode(concat((1 to TextRankWindow).map(pairsAt): _*)).as("p"))
      .select(col("p.s").as("src"), col("p.t").as("dst"))
      .filter(col("src") =!= col("dst"))
      .groupBy("src", "dst").agg(count(lit(1)).as("w"))
    val probe = edges.limit(PrDriverEdgeCap + 1).collect()
    if (probe.length <= PrDriverEdgeCap) {
      import s.implicits._
      pageRankDriver(probe.toSeq.map(r => (r.getString(0), r.getString(1), r.getLong(2))),
          PrIters)
        .toSeq.toDF("node", "rank_e12")
    } else {
      pageRankDistributed(edges, PrIters).select(col("node"), col("r").as("rank_e12"))
    }
  }

  private val textrankOracle = s"""
    WITH t AS (SELECT doc_id, ${LlmOps.toksSql} AS sp FROM documents),
    tok AS (SELECT doc_id, unnest(sp) AS w, generate_subscripts(sp, 1) AS pos FROM t),
    e AS MATERIALIZED (
      SELECT a.w AS src, b.w AS dst, CAST(count(*) AS BIGINT) AS w
      FROM tok a JOIN tok b ON a.doc_id = b.doc_id
        AND abs(b.pos - a.pos) BETWEEN 1 AND $TextRankWindow
        AND a.w <> b.w
      GROUP BY 1, 2),
    $pageRankOracleTail"""

  // ---- triangle counting -------------------------------------------------

  /** Distributed triangle counting by DEGREE ORIENTATION (Cohen 2009; the
    * MapReduce-classic "node-iterator++"), over the property-value
    * co-navigation graph: nodes are `props.k` values, an undirected edge
    * joins values a user visited consecutively.
    *
    * The naive wedge count explodes on hubs (a degree-d node yields d²
    * wedges). Orienting every edge from its lower-(degree, id) endpoint to
    * the higher caps out-degree at O(√m): each triangle then has EXACTLY ONE
    * apex with two out-edges in it, so triangles = closed oriented wedges,
    * counted once, no dedup pass. The plan is three keyed equi-joins (degree
    * attach ×2, wedge self-join, closure semi-join) and map-side-combinable
    * counts — no global sort, nothing quadratic in nodes. The oriented edge
    * table feeds both sides of the wedge self-join → persisted (self-join
    * sides don't share exchanges). */
  def qTriangleCount(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts_ms").asc, col("event_id").asc)
    val ev = Tables.events(s, d)
      .select(col("user_id"), col("ts_ms"), col("event_id"),
        from_json(col("props"), org.apache.spark.sql.types.StructType.fromDDL("k INT"))
          .getField("k").as("node"))
      .filter(col("node").isNotNull)
    val edges = ev.withColumn("prev", lag(col("node"), 1).over(w))
      .filter(col("prev").isNotNull && col("prev") =!= col("node"))
      .select(least(col("prev"), col("node")).as("a"),
        greatest(col("prev"), col("node")).as("b"))
      .distinct()
    triangleCount(edges)
  }

  /** The counting core of [[qTriangleCount]], over a distinct undirected
    * edge table (a < b). Split out so the spec can drive planted graphs. */
  private[queries] def triangleCount(edges0: DataFrame): DataFrame = {
    val edges = edges0.persist()
    // persisted: read twice by the orientation joins and once by the final
    // node count (r20 — it was re-aggregated from the edge cache per use)
    val deg = edges.select(col("a").as("v"))
      .union(edges.select(col("b").as("v")))
      .groupBy("v").agg(count(lit(1)).as("dg"))
      .persist()
    val oriented = edges
      .join(deg.select(col("v").as("a"), col("dg").as("da")), "a")
      .join(deg.select(col("v").as("b"), col("dg").as("db")), "b")
      .select(
        when(col("da") < col("db") ||
          (col("da") === col("db") && col("a") < col("b")), col("a"))
          .otherwise(col("b")).as("src"),
        when(col("da") < col("db") ||
          (col("da") === col("db") && col("a") < col("b")), col("b"))
          .otherwise(col("a")).as("dst"))
      .persist()
    val wedges = oriented.as("x").join(oriented.as("y"),
        col("x.src") === col("y.src") && col("x.dst") < col("y.dst"))
      .select(least(col("x.dst"), col("y.dst")).as("a"),
        greatest(col("x.dst"), col("y.dst")).as("b"))
    val closed = wedges.join(edges, Seq("a", "b"), "left_semi")
    // ONE tagged-union aggregate instead of three scalar branches glued by
    // crossJoins (r20): same three counts, one job instead of three
    // aggregate jobs + two broadcast exchanges.
    // r21 (ADVICE): the 1-row result checkpoints EAGERLY so the three
    // caches release here — callers outside Bench/Verify's per-query
    // clearCache no longer leak edges/deg/oriented for the session.
    val out = deg.select(lit(1L).as("nv"), lit(0L).as("ne"), lit(0L).as("nt"))
      .unionAll(edges.select(lit(0L).as("nv"), lit(1L).as("ne"), lit(0L).as("nt")))
      .unionAll(closed.select(lit(0L).as("nv"), lit(0L).as("ne"), lit(1L).as("nt")))
      .agg(coalesce(sum("nv"), lit(0L)).as("n_nodes"),
        coalesce(sum("ne"), lit(0L)).as("n_edges"),
        coalesce(sum("nt"), lit(0L)).as("n_triangles"))
      .localCheckpoint(true)
    Seq(edges, deg, oriented).foreach(_.unpersist())
    out
  }

  private val triangleOracle = """
    WITH e0 AS (
      SELECT user_id, epoch_ms(ts) AS ts_ms, event_id,
             json_extract(props::JSON, '$.k')::INT AS node
      FROM events WHERE json_extract(props::JSON, '$.k') IS NOT NULL),
    steps AS (
      SELECT node, lag(node) OVER (PARTITION BY user_id ORDER BY ts_ms, event_id) AS prev
      FROM e0),
    edges AS (
      SELECT DISTINCT least(prev, node) AS a, greatest(prev, node) AS b
      FROM steps WHERE prev IS NOT NULL AND prev <> node)
    SELECT
      (SELECT count(DISTINCT v) FROM (SELECT a AS v FROM edges UNION ALL SELECT b FROM edges)) AS n_nodes,
      (SELECT count(*) FROM edges) AS n_edges,
      (SELECT count(*) FROM edges e1
         JOIN edges e2 ON e2.a = e1.a AND e2.b > e1.b
         JOIN edges e3 ON e3.a = e1.b AND e3.b = e2.b) AS n_triangles"""

  def qs: Map[String, Q] = Map(
    "q_pagerank" -> Q(qPageRank, Some(pageRankOracle)),
    "llm_textrank" -> Q(llmTextrank, Some(textrankOracle)),
    "q_triangle_count" -> Q(qTriangleCount, Some(triangleOracle)))
}
