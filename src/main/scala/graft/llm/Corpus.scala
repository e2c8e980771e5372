package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Corpus-level training-data operators: benchmark decontamination,
  * deterministic stratified sampling, and sequence packing — the set a
  * 100 TB pretraining pipeline runs after dedup/quality filtering.
  * Query-layer wrappers with DuckDB oracles live in
  * [[graft.queries.LlmOps]]; these take plain DataFrames so they compose
  * with any upstream source.
  */
object Corpus {

  /** Drop every training document sharing ANY `n`-gram with `bench` (the
    * standard eval-overlap filter; GPT-3 appendix C uses 13-grams).
    *
    * Scale shape: a benchmark is tiny by definition → its distinct n-gram
    * set broadcasts; the corpus explodes to (id, gram) ONCE and semi-joins
    * that broadcast, so the corpus itself never shuffles and nothing is
    * quadratic. Returns the surviving training rows, all columns. */
  def decontaminate(train: DataFrame, bench: DataFrame, n: Int,
                    idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    def grams(c: Column) = explode(TextOps.shingles(TextOps.tokens(c), n))
    val benchGrams = bench.select(grams(col(textCol)).as("__g")).distinct()
    val contaminated = train.select(col(idCol), grams(col(textCol)).as("__g"))
      .join(broadcast(benchGrams), Seq("__g"), "left_semi")
      .select(idCol).distinct()
    train.join(contaminated, Seq(idCol), "left_anti")
  }

  /** Keep a row iff `hash(id) mod 1000 < perMille(stratum)` — reproducible
    * hash-gated sampling with per-stratum rates (the corpus-mixing knob).
    * A narrow filter: zero shuffles, stable under re-partitioning and
    * re-runs, identical on every engine — unlike `TABLESAMPLE`/`rand()`. */
  def sampleStratified(docs: DataFrame, strataCol: String,
                       perMille: Seq[(String, Long)], defaultPerMille: Long,
                       idCol: String = "doc_id", salt: String = ":sample"): DataFrame = {
    val bucket = TextOps.hash60(concat(col(idCol).cast(StringType), lit(salt))) % 1000
    val rate = perMille.foldRight(lit(defaultPerMille): Column) {
      case ((s, r), acc) => when(col(strataCol) === s, lit(r)).otherwise(acc)
    }
    docs.filter(bucket < rate)
  }

  /** Connected components over a near-duplicate pair set: every document
    * gets the SMALLEST doc id reachable through pair edges as its
    * `cluster_id` — the step a dedup pipeline runs after pair generation
    * (keep one representative per cluster, not per pair: pairwise removal
    * of (a,b),(b,c) would wrongly keep both a and c).
    *
    * Min-label propagation: each round every node takes the min of its own
    * and its neighbors' labels — one equi-join + partial-aggregate shuffle
    * per round, converging in graph-diameter rounds (near-dup clusters are
    * shallow: diameters of 2-4). The convergence probe is a driver-side
    * count (control-plane). At extreme diameters the same loop accepts the
    * large-star/small-star edge rewriting to converge in O(log n) rounds —
    * the per-round dataflow is identical. */
  def clusterPairs(pairs: DataFrame, iCol: String = "i", jCol: String = "j",
                   maxIter: Int = 25, driverMaxEdges: Long = 2000000L): DataFrame = {
    // every round's frame is localCheckpoint'ed: iterative plans otherwise
    // NEST (round n's lineage contains round n-1's twice) and the analyzer
    // blows the driver heap long before the data is large — checkpointing
    // truncates the lineage to the materialized blocks, the standard shape
    // for iterative dataflow on Spark
    val edges = pairs.select(col(iCol).as("src"), col(jCol).as("dst"))
      .union(pairs.select(col(jCol).as("src"), col(iCol).as("dst")))
      .localCheckpoint(true)
    // near-dup pairs are the corpus's uniqueness FAILURES — usually a sliver
    // of the data. Under the threshold, union-find on the driver beats ~6
    // distributed rounds of fixed scheduler cost; past it (or for non-long
    // ids) the iterative dataflow below scales arbitrarily. The count is the
    // same control-plane probe Merge.upsert uses to pick broadcast-vs-shuffle.
    val longIds = pairs.schema(iCol).dataType == org.apache.spark.sql.types.LongType &&
      pairs.schema(jCol).dataType == org.apache.spark.sql.types.LongType
    if (longIds && edges.count() <= 2 * driverMaxEdges)
      return driverUnionFind(edges)
    var labels = edges.select(col("src").as("node")).distinct()
      .withColumn("label", col("node")).localCheckpoint(true)
    var converged = false
    var it = 0
    while (!converged && it < maxIter) {
      val nbrMin = edges
        .join(labels.select(col("node").as("dst"), col("label").as("dlabel")), "dst")
        .groupBy("src").agg(min(col("dlabel")).as("nmin"))
        .select(col("src").as("node"), col("nmin"))
      val stepped = labels.join(nbrMin, Seq("node"), "left")
        .select(col("node"), col("label"),
          least(col("label"), coalesce(col("nmin"), col("label"))).as("cand"))
      // pointer jumping: also adopt the candidate's OWN current label
      // (L(L(v))) — labels descend along paths exponentially, so rounds are
      // O(log diameter) instead of O(diameter); the fixpoint (stable under
      // neighbor-min) is unchanged
      val updated = stepped
        .join(labels.select(col("node").as("cand"), col("label").as("cl")),
          Seq("cand"), "left")
        .select(col("node"), col("label"),
          least(col("cand"), coalesce(col("cl"), col("cand"))).as("next"))
        .localCheckpoint(true)
      converged = updated.filter(col("next") < col("label")).isEmpty
      labels = updated.select(col("node"), col("next").as("label"))
      it += 1
    }
    labels.select(col("node"), col("label").as("cluster_id"))
  }

  /** Small-graph path: classic union-find with path compression, attaching
    * the larger root under the smaller — every element starts as its own
    * root, so the invariant "root = min of merged roots" makes the final
    * root exactly the component minimum (the same labels the distributed
    * loop converges to). */
  private def driverUnionFind(edges: DataFrame): DataFrame = {
    val parent = scala.collection.mutable.HashMap.empty[Long, Long]
    def find(x: Long): Long = {
      var r = x
      while (parent(r) != r) r = parent(r)
      var c = x
      while (parent(c) != r) { val nx = parent(c); parent(c) = r; c = nx }
      r
    }
    edges.select(col("src"), col("dst")).collect().foreach { row =>
      val (a, b) = (row.getLong(0), row.getLong(1))
      parent.getOrElseUpdate(a, a); parent.getOrElseUpdate(b, b)
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
    }
    val spark = edges.sparkSession
    import spark.implicits._
    parent.keysIterator.map(k => (k, find(k))).toSeq.toDF("node", "cluster_id")
  }

  /** GPT-style sequence packing with boundary splitting: documents
    * concatenate in `orderCol` order and each gets the index of the
    * `windowTokens`-token context window its FIRST token lands in.
    * Packing is order-dependent, so the parallel unit is the `shardCol`
    * shard (cumulative sum per shard) — exactly how a 100 TB corpus packs;
    * never a global sort. Output adds `n_tokens` and `seq_id`. */
  def packSequences(docs: DataFrame, shardCol: String, orderCol: String,
                    windowTokens: Long, textCol: String = "text"): DataFrame = {
    val w = Window.partitionBy(shardCol).orderBy(orderCol)
      .rowsBetween(Window.unboundedPreceding, -1)
    docs
      .withColumn("n_tokens", size(TextOps.tokens(col(textCol))).cast(LongType))
      .withColumn("seq_id",
        coalesce(sum(col("n_tokens")).over(w), lit(0L)).divide(windowTokens)
          .cast(LongType))
  }
}
