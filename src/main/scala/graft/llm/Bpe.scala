package graft.llm

/** Byte-pair-encoding tokenizer: train (iterative max-frequency pair merge,
  * Sennrich et al. 2016, arXiv:1508.07909) and encode (apply the learned
  * merges in rank order). Word-internal merges only (no end-of-word marker —
  * a documented simplification; adding one is a pre-tokenization change, not
  * an algorithm change).
  *
  * Determinism contract (the DuckDB oracle replays this EXACTLY):
  *  - words come from the whitespace tokenizer ([[TextOps.tokens]]);
  *  - the trainer sees the top-`VocabCap` words by (freq DESC, word ASC);
  *  - each round counts every adjacent symbol position weighted by word
  *    frequency; the winner is (weight DESC, lhs ASC, rhs ASC);
  *  - a merge applies left-to-right in one pass ("aaa" + (a,a) → [aa, a]);
  *  - encode applies the merge list in rank order, each rule exhaustively —
  *    for merges learned this way that reproduces the training segmentation.
  *
  * Scale shape: the ONLY corpus-scale pass is the word-count aggregation
  * (one shuffle, map-side combined). The word-frequency model is bounded by
  * construction (distinct words ≪ corpus; capped at `VocabCap`), so training
  * runs on the driver over the collected model — the same control-plane
  * treatment kmeans gives its centroids and vocab encoding gives its top-K
  * table. [[trainDistributed]] keeps the per-round pair counting on
  * executors for the uncapped case; CorpusSpec proves the two paths emit
  * identical merge tables.
  */
object Bpe {

  final case class Merge(rank: Int, lhs: String, rhs: String, merged: String,
                         weight: Long)

  /** One left-to-right pass applying rule (l,r) exhaustively: a freshly
    * merged symbol never re-merges with the following element in the same
    * pass unless the rule is (l·r, r) itself — the classic BPE convention
    * both the trainer and the encoder (and the oracle's fold) share. */
  def applyRule(syms: Array[String], l: String, r: String): Array[String] = {
    val out = new Array[String](syms.length)
    var n = 0
    var i = 0
    while (i < syms.length) {
      val x = syms(i)
      if (n > 0 && out(n - 1) == l && x == r) out(n - 1) = l + r
      else { out(n) = x; n += 1 }
      i += 1
    }
    if (n == syms.length) syms else java.util.Arrays.copyOf(out, n)
  }

  private def chars(word: String): Array[String] = {
    val out = new Array[String](word.length)
    var i = 0
    while (i < word.length) { out(i) = String.valueOf(word.charAt(i)); i += 1 }
    out
  }

  /** Driver-side trainer over a (bounded) word-frequency model. Stops early
    * when no adjacent pair remains (fully merged vocabulary). */
  def train(wordCounts: Seq[(String, Long)], nMerges: Int): Seq[Merge] = {
    var state: Array[(Array[String], Long)] =
      wordCounts.iterator.map { case (w, f) => (chars(w), f) }.toArray
    val merges = Seq.newBuilder[Merge]
    var rank = 0
    var exhausted = false
    while (rank < nMerges && !exhausted) {
      val pc = scala.collection.mutable.HashMap.empty[(String, String), Long]
      state.foreach { case (syms, f) =>
        var i = 0
        while (i < syms.length - 1) {
          val k = (syms(i), syms(i + 1))
          pc.update(k, pc.getOrElse(k, 0L) + f)
          i += 1
        }
      }
      if (pc.isEmpty) exhausted = true
      else {
        val ((l, r), w) = pc.minBy { case ((l, r), w) => (-w, l, r) }
        merges += Merge(rank, l, r, l + r, w)
        state = state.map { case (syms, f) => (applyRule(syms, l, r), f) }
        rank += 1
      }
    }
    merges.result()
  }

  /** Encode one word: chars → merges in rank order. */
  def encodeWord(word: String, rules: Seq[(String, String)]): Array[String] = {
    var syms = chars(word)
    rules.foreach { case (l, r) => if (syms.length > 1) syms = applyRule(syms, l, r) }
    syms
  }

  /** Executor-side per-round trainer for an UNCAPPED word model: each round
    * is one map-side-combined pair-count aggregate over the word-state frame
    * + a 1-row TakeOrdered feedback to the driver + a broadcast rule applied
    * by the codegen'd [[graft.functions.BpePieces]] kernel — the kmeans
    * control-plane feedback shape. The word frame never grows; lineage is
    * truncated per round. Emits the same merge table as [[train]]. */
  def trainDistributed(words: org.apache.spark.sql.DataFrame, nMerges: Int,
                       wordCol: String = "word", freqCol: String = "freq"): Seq[Merge] = {
    import org.apache.spark.sql.functions._
    var state = words
      .select(split(col(wordCol), "").as("syms"), col(freqCol).cast("long").as("freq"))
      .localCheckpoint(true)
    val merges = Seq.newBuilder[Merge]
    var rank = 0
    var exhausted = false
    while (rank < nMerges && !exhausted) {
      val st = state.withColumn("n", size(col("syms"))).filter(col("n") >= 2)
      val best = st
        .select(col("freq"), explode(arrays_zip(
          expr("slice(syms, 1, n - 1)"), expr("slice(syms, 2, n - 1)"))).as("p"))
        .groupBy(col("p.0").as("lhs"), col("p.1").as("rhs"))
        .agg(sum(col("freq")).as("w"))
        .orderBy(col("w").desc, col("lhs").asc, col("rhs").asc)
        .limit(1).collect() // TakeOrdered: 1 row of control-plane feedback
      if (best.isEmpty) exhausted = true
      else {
        val (l, r, w) = (best(0).getString(0), best(0).getString(1), best(0).getLong(2))
        merges += Merge(rank, l, r, l + r, w)
        state = state
          .withColumn("syms",
            TextOps.bpePieces(col("syms"), Seq((l, r)), perWord = false))
          .localCheckpoint(true)
        rank += 1
      }
    }
    merges.result()
  }
}
