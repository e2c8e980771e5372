package graft.llm

/** WordPiece tokenizer (Schuster & Nakajima 2012; the BERT tokenizer,
  * Devlin et al. 2019, arXiv:1810.04805): train by iterative pair merge like
  * BPE, but the merge winner maximizes the LIKELIHOOD score
  * `count(ab) / (count(a) * count(b))` over the CURRENT segmentation state —
  * the pair whose merge most increases corpus log-likelihood under a
  * unigram-piece LM — and encode is greedy longest-match-first against the
  * learned vocabulary (not a merge cascade), with a whole word falling back
  * to `[UNK]` when any position is uncoverable. Word-internal, no `##`
  * continuation marker — the same documented simplification as [[Bpe]]'s
  * missing end-of-word marker (a pre-tokenization convention, not an
  * algorithm change).
  *
  * Determinism contract (the DuckDB oracle replays this EXACTLY):
  *  - the same capped word-frequency model as [[Bpe]];
  *  - each round: symbol counts and adjacent-pair counts both weighted by
  *    word frequency over the current state; the score is quantized to the
  *    integer `count(ab)·10^18 / (count(a)·count(b))` (floor division in
  *    128-bit — BigInt here, HUGEINT in the oracle; exact, no float ulps),
  *    winner by (quotient DESC, lhs ASC, rhs ASC) in code-point order;
  *  - the quotient never exceeds 10^18 (count(a), count(b) >= count(ab), so
  *    q <= 10^18 / count(ab)) — it always fits the output's BIGINT column;
  *  - merges apply left-to-right in one pass (shared [[Bpe.applyRule]]);
  *  - encode: vocabulary = every code point of the MODEL words + all merged
  *    pieces; per word, repeatedly take the LONGEST vocab piece matching at
  *    the cursor (lengths in code points — DuckDB `len`/`substr` and Spark
  *    `substring` both count code points, UTF-16 units would diverge on
  *    supplementary chars); any uncoverable position makes the whole word
  *    one `[UNK]` piece (the BERT convention).
  *
  * Scale shape: identical to [[Bpe]] — ONE corpus-scale word-count pass,
  * bounded-model training on the driver (control plane), and encode as a
  * broadcast-vocabulary codegen kernel ([[graft.functions.WordPieces]]), a
  * narrow per-document projection with no shuffle.
  */
object Wordpiece {

  final case class Merge(rank: Int, lhs: String, rhs: String, merged: String,
                         weight: Long, scoreQ: Long)

  val Unk = "[UNK]"

  private val ScoreScale = BigInt(10).pow(18)

  /** Driver-side trainer over the (bounded) word-frequency model. Stops
    * early when no adjacent pair remains. `split` picks the base alphabet
    * (code points by default, same contract as [[Bpe.train]]). */
  def train(wordCounts: Seq[(String, Long)], nMerges: Int): Seq[Merge] = {
    var state: Array[(Array[String], Long)] =
      wordCounts.iterator.map { case (w, f) => (Bpe.chars(w), f) }.toArray
    val merges = Seq.newBuilder[Merge]
    var rank = 0
    var exhausted = false
    while (rank < nMerges && !exhausted) {
      val uc = scala.collection.mutable.HashMap.empty[String, Long]
      val pc = scala.collection.mutable.HashMap.empty[(String, String), Long]
      state.foreach { case (syms, f) =>
        var i = 0
        while (i < syms.length) {
          uc.update(syms(i), uc.getOrElse(syms(i), 0L) + f)
          if (i < syms.length - 1) {
            val k = (syms(i), syms(i + 1))
            pc.update(k, pc.getOrElse(k, 0L) + f)
          }
          i += 1
        }
      }
      if (pc.isEmpty) exhausted = true
      else {
        var bl: String = null; var br: String = null
        var bw = 0L; var bq = BigInt(-1)
        pc.foreach { case ((l, r), w) =>
          val q = (BigInt(w) * ScoreScale) / (BigInt(uc(l)) * BigInt(uc(r)))
          // bl is null only before the first candidate, and then q > bq
          val better = q > bq || (q == bq && {
            val c = Bpe.cpCompare(l, bl); c < 0 || (c == 0 && Bpe.cpCompare(r, br) < 0)
          })
          if (better) { bl = l; br = r; bw = w; bq = q }
        }
        merges += Merge(rank, bl, br, bl + br, bw, bq.toLong)
        state = state.map { case (syms, f) => (Bpe.applyRule(syms, bl, br), f) }
        rank += 1
      }
    }
    merges.result()
  }

  /** Executor-side per-round trainer for an UNCAPPED word model — the
    * WordPiece twin of [[Bpe.trainDistributed]]: each round is one
    * map-side-combined symbol-count aggregate + one pair-count aggregate,
    * the likelihood score joined in (the symbol-count frame is bounded —
    * alphabet + one merge per round — so both joins broadcast), and a
    * 1-row TakeOrdered feedback to the driver; the winning rule applies
    * executor-side via the codegen'd [[graft.functions.BpePieces]] kernel
    * (the merge algebra is shared). Emits the same table as [[train]].
    *
    * Exact-quotient discipline: `count(ab)·10^18` overflows Long, so the
    * quotient computes in DECIMAL(38,0) — and because Spark decimal
    * DIVISION rounds HALF_UP (a true x.9999996 would round past the
    * floor), the numerator is first made an exact multiple of the
    * denominator (`wS − pmod(wS, den)`); the division is then exact and
    * representable, no rounding can fire. */
  def trainDistributed(words: org.apache.spark.sql.DataFrame, nMerges: Int,
                       wordCol: String = "word", freqCol: String = "freq"): Seq[Merge] = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.{DecimalType, LongType}
    var state = words
      .select(split(col(wordCol), "").as("syms"), col(freqCol).cast("long").as("freq"))
      .localCheckpoint(true)
    val merges = Seq.newBuilder[Merge]
    var rank = 0
    var exhausted = false
    var sinceCheckpoint = 0
    val dec = DecimalType(38, 0)
    while (rank < nMerges && !exhausted) {
      // ONE pass + ONE shuffle per round: each word emits its unigram
      // tokens (rhs = null) and its adjacent pairs into a single
      // frequency-weighted aggregate (r15 verdict: the separate uni/pair
      // aggregates scanned the state twice). `slice(syms, 2, n-1)` is
      // empty for 1-symbol words, so no n >= 2 branch is needed. The
      // bounded result feeds three consumers (pair rows + both score-join
      // sides) — persisted per the multi-consumer rule.
      val st = state.withColumn("n", size(col("syms")))
      val nullRhs = lit(null).cast("string")
      val toks = st.select(col("freq"), explode(concat(
          transform(col("syms"), x => struct(x.as("lhs"), nullRhs.as("rhs"))),
          zip_with(expr("slice(syms, 1, n - 1)"), expr("slice(syms, 2, n - 1)"),
            (a, b) => struct(a.as("lhs"), b.as("rhs"))))).as("p"))
        .groupBy(col("p.lhs").as("lhs"), col("p.rhs").as("rhs"))
        .agg(sum(col("freq")).as("w"))
        .persist()
      val uni = toks.filter(col("rhs").isNull).select(col("lhs").as("s"), col("w").as("c"))
      val pairs = toks.filter(col("rhs").isNotNull)
      val wS = col("w").cast(dec) * lit(ScoreScale.toString).cast(dec)
      val den = col("ca").cast(dec) * col("cb").cast(dec)
      val best = pairs
        .join(broadcast(uni.select(col("s").as("lhs"), col("c").as("ca"))), "lhs")
        .join(broadcast(uni.select(col("s").as("rhs"), col("c").as("cb"))), "rhs")
        .select(col("lhs"), col("rhs"), col("w"),
          ((wS - pmod(wS, den)) / den).cast(LongType).as("q"))
        .orderBy(col("q").desc, col("lhs").asc, col("rhs").asc)
        .limit(1).collect() // TakeOrdered: 1 row of control-plane feedback
      toks.unpersist()
      if (best.isEmpty) exhausted = true
      else {
        val (l, r, w, q) = (best(0).getString(0), best(0).getString(1),
          best(0).getLong(2), best(0).getLong(3))
        merges += Merge(rank, l, r, l + r, w, q)
        state = state.withColumn("syms",
          TextOps.bpePieces(col("syms"), Seq((l, r)), perWord = false))
        sinceCheckpoint += 1
        if (sinceCheckpoint >= 8) {
          state = state.localCheckpoint(true)
          sinceCheckpoint = 0
        }
        rank += 1
      }
    }
    merges.result()
  }

  /** The encode vocabulary: every code point of the model words plus every
    * merged piece — sorted for a deterministic plan reference. */
  def vocab(modelWords: Seq[String], merges: Seq[Merge]): IndexedSeq[String] = {
    val v = scala.collection.mutable.LinkedHashSet.empty[String]
    modelWords.foreach(w => Bpe.chars(w).foreach(v += _))
    merges.foreach(v += _.merged)
    v.toIndexedSeq.sorted
  }

  /** Greedy longest-match encode of one word; `[UNK]` (alone) when any
    * cursor position matches no piece. Longest = most CODE POINTS. */
  def encodeWord(word: String, pieces: Set[String], maxPieceCps: Int): Array[String] =
    encodeWord(word, pieces, maxPieceCps, new Array[Int](maxPieceCps))

  /** Hot-path twin: `scratch` (length ≥ maxPieceCps) is the candidate
    * end-offset buffer, supplied by the caller so the kernel allocates it
    * once per ROW, not once per cursor position ([[graft.functions
    * .WordPieces]]). */
  def encodeWord(word: String, pieces: Set[String], maxPieceCps: Int,
                 scratch: Array[Int]): Array[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < word.length) {
      // candidate lengths in code points, longest first
      var bestEnd = -1
      var end = i
      var cps = 0
      // advance to at most maxPieceCps code points, remembering char offsets
      while (end < word.length && cps < maxPieceCps) {
        end += Character.charCount(word.codePointAt(end))
        scratch(cps) = end
        cps += 1
      }
      var k = cps - 1
      while (k >= 0 && bestEnd < 0) {
        val cand = word.substring(i, scratch(k))
        if (pieces.contains(cand)) bestEnd = scratch(k)
        k -= 1
      }
      if (bestEnd < 0) return Array(Unk)
      out += word.substring(i, bestEnd)
      i = bestEnd
    }
    out.toArray
  }
}
