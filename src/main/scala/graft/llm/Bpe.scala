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

  /** Split a word into CODE POINTS, one String each — supplementary chars
    * (emoji, rare CJK) stay whole. Matches Spark `split(word, "")` (code-point
    * aware) and the oracle's `regexp_extract_all(word, '.')`; a UTF-16
    * `charAt` split would feed lone surrogates to the trainer and diverge
    * from both engines on any non-BMP text. */
  private[llm] def chars(word: String): Array[String] = {
    val n = word.codePointCount(0, word.length)
    val out = new Array[String](n)
    var i = 0
    var k = 0
    while (i < word.length) {
      val cp = word.codePointAt(i)
      val w = Character.charCount(cp)
      out(k) = word.substring(i, i + w)
      i += w
      k += 1
    }
    out
  }

  /** UTF-8 byte symbols as two-character uppercase hex pairs — the
    * byte-fallback alphabet. Byte-level BPE (GPT-2's convention, Radford et
    * al. 2019) runs the same merge algebra over a 256-symbol base alphabet
    * so NO input is ever out-of-vocabulary; GPT-2 remaps bytes to printable
    * unicode cosmetically, hex pairs are the equivalent bijection that both
    * engines can compute (`hex(encode(word))` split in twos — Spark and
    * DuckDB render identical uppercase hex). */
  def byteSyms(word: String): Array[String] = {
    val bytes = word.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val out = new Array[String](bytes.length)
    var i = 0
    while (i < bytes.length) {
      val b = bytes(i) & 0xff
      out(i) = new String(Array(HexDigits(b >> 4), HexDigits(b & 0xf)))
      i += 1
    }
    out
  }

  private val HexDigits = "0123456789ABCDEF".toCharArray

  /** Driver-side trainer over a (bounded) word-frequency model. Stops early
    * when no adjacent pair remains (fully merged vocabulary). `split` picks
    * the base alphabet: code points (default) or [[byteSyms]]. */
  def train(wordCounts: Seq[(String, Long)], nMerges: Int,
            split: String => Array[String] = chars): Seq[Merge] = {
    var state: Array[(Array[String], Long)] =
      wordCounts.iterator.map { case (w, f) => (split(w), f) }.toArray
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
        val ((l, r), w) = pc.reduceLeft[((String, String), Long)] {
          case (best @ ((bl, br), bw), cand @ ((cl, cr), cw)) =>
            val better = cw > bw || (cw == bw && {
              val c = cpCompare(cl, bl); c < 0 || (c == 0 && cpCompare(cr, br) < 0)
            })
            if (better) cand else best
        }
        merges += Merge(rank, l, r, l + r, w)
        state = state.map { case (syms, f) => (applyRule(syms, l, r), f) }
        rank += 1
      }
    }
    merges.result()
  }

  /** CODE-POINT string order — what Spark's UTF8String asc and DuckDB's
    * ORDER BY both compare (UTF-8 byte order preserves code points), and
    * what `java.lang.String.compareTo` does NOT: UTF-16 ranks surrogates
    * (U+D800+) below U+E000..U+FFFF, so a supplementary-vs-BMP tie-break
    * would pick different merge winners on the driver than on the engines.
    * The driver trainer breaks ties through this instead (and any other
    * driver-side path that must agree with an engine ORDER BY — e.g. the
    * failover reprocessor's file ordering). */
  private[graft] def cpCompare(a: String, b: String): Int = {
    var i = 0
    var j = 0
    while (i < a.length && j < b.length) {
      val ca = a.codePointAt(i)
      val cb = b.codePointAt(j)
      if (ca != cb) return Integer.compare(ca, cb)
      i += Character.charCount(ca)
      j += Character.charCount(cb)
    }
    Integer.compare(a.length - i, b.length - j)
  }

  /** Encode one word: chars → merges in rank order. */
  def encodeWord(word: String, rules: Seq[(String, String)]): Array[String] = {
    var syms = chars(word)
    rules.foreach { case (l, r) => if (syms.length > 1) syms = applyRule(syms, l, r) }
    syms
  }

  /** Parallel-array twin of [[encodeWord]] for the codegen'd kernel's hot
    * path ([[graft.functions.BpePieces]]) — no per-row tuple Seq. */
  def encodeWord(word: String, lhs: Array[String], rhs: Array[String]): Array[String] = {
    var syms = chars(word)
    var i = 0
    while (i < lhs.length) {
      if (syms.length > 1) syms = applyRule(syms, lhs(i), rhs(i))
      i += 1
    }
    syms
  }

  /** Byte-level twin of the parallel-array [[encodeWord]]: the word becomes
    * UTF-8 hex-pair symbols before the cascade — no OOV possible. */
  def encodeWordBytes(word: String, lhs: Array[String], rhs: Array[String]): Array[String] = {
    var syms = byteSyms(word)
    var i = 0
    while (i < lhs.length) {
      if (syms.length > 1) syms = applyRule(syms, lhs(i), rhs(i))
      i += 1
    }
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
    var sinceCheckpoint = 0
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
        state = state.withColumn("syms",
          TextOps.bpePieces(col("syms"), Seq((l, r)), perWord = false))
        // truncate lineage every few rounds, not every round: a handful of
        // stacked BpePieces projections stays cheap to analyze/execute, and
        // each eager materialization is a whole job of fixed cost (the pair
        // count above re-runs the un-checkpointed tail at most Every times)
        sinceCheckpoint += 1
        if (sinceCheckpoint >= CheckpointEvery) {
          state = state.localCheckpoint(true)
          sinceCheckpoint = 0
        }
        rank += 1
      }
    }
    merges.result()
  }

  /** Rounds between lineage truncations in [[trainDistributed]]. */
  private val CheckpointEvery = 8
}
