package graft.llm

import scala.collection.mutable

/** Unigram-LM subword tokenizer trainer (Kudo 2018, arXiv:1804.10959 — the
  * SentencePiece unigram model), re-disciplined to INTEGER arithmetic so a
  * SQL oracle can replay it bit-for-bit. The paper's pipeline is: seed a
  * large candidate vocabulary from frequent substrings, iterate EM
  * (segment the corpus under current piece scores → re-estimate scores
  * from usage), and prune the worst-scoring pieces until the vocabulary
  * reaches its target — keeping single characters forever as the coverage
  * floor. This implementation keeps that exact loop but replaces the
  * float log-likelihood with a total integer order (the same adjudication
  * as the Viterbi segmentation query and [[Wordpiece]]'s exact score
  * quotients — a float objective would pick EM winners by ulps and no
  * cross-engine oracle could gate it):
  *
  *  - Viterbi decode per word: minimize PIECE COUNT; tie → maximize the
  *    SUM of piece scores along the path; tie → prefer the LONGEST final
  *    piece at each DP position. Scores are corpus counts (integers), so
  *    the order is total and engine-independent.
  *  - E-step: hard counts from the single Viterbi path, weighted by word
  *    frequency (integer), instead of expected counts from the full
  *    lattice (floats).
  *  - M-step + prune: new score = count; single-code-point pieces are
  *    always kept (score 0 allowed); multi-char pieces used this round are
  *    ranked by (count DESC, piece ASC in code-point order) and the top
  *    `floor(3m/4)` of the m used survive — the paper's shrink factor.
  *
  * Determinism contract (the DuckDB oracle replays all of this):
  *  - model = the same capped word-frequency table as [[Bpe]]/[[Wordpiece]];
  *  - seed = every code point of the model words + the top-[[SeedMulti]]
  *    substrings of 2..[[MaxLen]] code points by (weighted occurrence
  *    count DESC, piece ASC) — occurrences counted at every position,
  *    overlaps included;
  *  - [[Rounds]] EM rounds exactly as above;
  *  - all lengths/positions are CODE POINTS (DuckDB `len`/`substr` and
  *    Spark `substring`/`length` agree; UTF-16 units would diverge on
  *    supplementary chars), all orderings code-point order
  *    ([[Bpe.cpCompare]] on the driver — `String.compareTo` is UTF-16).
  *
  * Scale shape — identical to the sibling trainers: ONE corpus-scale
  * word-count pass; training over the bounded model is control-plane on
  * the driver, or per-round executor segmentation via the codegen'd
  * [[graft.functions.UnigramPieces]] kernel with a bounded (≤ alphabet +
  * [[SeedMulti]] rows) count collect in [[trainDistributed]]; encode is a
  * broadcast-vocabulary narrow projection, no shuffle.
  */
object Unigram {

  val Unk = "[UNK]"
  val MaxLen = 4       // max piece length, in code points
  val SeedMulti = 256  // multi-char pieces admitted to the seed vocabulary
  val Rounds = 4       // EM (segment → count → prune) rounds

  private def isSingleCp(s: String): Boolean =
    s.nonEmpty && s.codePointCount(0, s.length) == 1

  private def sliceStr(cps: Array[String], from: Int, len: Int): String =
    if (len == 1) cps(from)
    else {
      val sb = new java.lang.StringBuilder
      var i = 0
      while (i < len) { sb.append(cps(from + i)); i += 1 }
      sb.toString
    }

  /** Viterbi DP over one word's code points under the integer total order
    * (fewest pieces → max summed score → longest piece on full ties).
    * Returns null when some position is uncoverable — the caller emits one
    * [[Unk]] for the whole word (the [[Wordpiece]] convention; model words
    * are always coverable because their characters are never pruned). */
  def segmentCps(cps: Array[String],
                 score: java.util.Map[String, java.lang.Long]): Array[String] = {
    val n = cps.length
    val dpn = new Array[Long](n + 1)
    val dpf = new Array[Long](n + 1)
    val bp = new Array[Int](n + 1)  // chosen piece length ending at p; 0 = unreachable
    bp(0) = -1                      // origin: reachable, no piece
    var p = 1
    while (p <= n) {
      var bestL = 0
      var bn = 0L
      var bf = 0L
      var l = math.min(MaxLen, p)
      while (l >= 1) {              // l DESC: on a full (n, f) tie the longer piece stays
        if (bp(p - l) != 0) {
          val c = score.get(sliceStr(cps, p - l, l))
          if (c != null) {
            val cn = dpn(p - l) + 1
            val cf = dpf(p - l) + c.longValue()
            if (bestL == 0 || cn < bn || (cn == bn && cf > bf)) {
              bestL = l; bn = cn; bf = cf
            }
          }
        }
        l -= 1
      }
      bp(p) = bestL
      if (bestL != 0) { dpn(p) = bn; dpf(p) = bf }
      p += 1
    }
    if (n > 0 && bp(n) == 0) null
    else {
      val out = new Array[String](dpn(n).toInt)
      var q = n
      var k = out.length
      while (q > 0) {
        val l = bp(q)
        k -= 1
        out(k) = sliceStr(cps, q - l, l)
        q -= l
      }
      out
    }
  }

  /** Driver-side segment of a raw word (splits to code points first). */
  def segment(word: String,
              score: java.util.Map[String, java.lang.Long]): Array[String] =
    segmentCps(Bpe.chars(word), score)

  private def toJavaMap(vocab: Seq[(String, Long)]): java.util.HashMap[String, java.lang.Long] = {
    val m = new java.util.HashMap[String, java.lang.Long](vocab.size * 2)
    vocab.foreach { case (p, c) => m.put(p, java.lang.Long.valueOf(c)) }
    m
  }

  /** (count DESC, piece ASC code-point) over the multi-char entries, then
    * keep the top `keep(m)` of the m candidates. */
  private def topMultis(cnt: Iterable[(String, Long)],
                        keep: Int => Int): Vector[(String, Long)] = {
    val ms = cnt.iterator.filter(kv => !isSingleCp(kv._1)).toArray
    java.util.Arrays.sort(ms, new java.util.Comparator[(String, Long)] {
      def compare(a: (String, Long), b: (String, Long)): Int = {
        val c = java.lang.Long.compare(b._2, a._2)
        if (c != 0) c else Bpe.cpCompare(a._1, b._1)
      }
    })
    ms.take(keep(ms.length)).toVector
  }

  /** Weighted substring counts (1..[[MaxLen]] code points, every position,
    * overlaps included) over the word model. */
  private def substringCounts(wc: Seq[(String, Long)]): mutable.HashMap[String, Long] = {
    val cnt = mutable.HashMap.empty[String, Long]
    wc.foreach { case (w, f) =>
      val cps = Bpe.chars(w)
      var i = 0
      while (i < cps.length) {
        var l = 1
        while (l <= MaxLen && i + l <= cps.length) {
          val p = sliceStr(cps, i, l)
          cnt.update(p, cnt.getOrElse(p, 0L) + f)
          l += 1
        }
        i += 1
      }
    }
    cnt
  }

  /** Seed vocabulary: all single code points + top-[[SeedMulti]] multis. */
  def seed(wc: Seq[(String, Long)]): Vector[(String, Long)] = {
    val cnt = substringCounts(wc)
    val chars = cnt.iterator.filter(kv => isSingleCp(kv._1)).toVector
      .sortWith((a, b) => Bpe.cpCompare(a._1, b._1) < 0)
    chars ++ topMultis(cnt, m => math.min(m, SeedMulti))
  }

  /** One M-step + prune: chars re-scored (kept even at 0), used multis
    * ranked and shrunk to floor(3m/4). */
  private def nextVocab(chars: Vector[String],
                        cnt: collection.Map[String, Long]): Vector[(String, Long)] =
    chars.map(c => (c, cnt.getOrElse(c, 0L))) ++
      topMultis(cnt, m => m * 3 / 4)

  /** Driver-side EM trainer over the (bounded) word-frequency model.
    * Returns the final vocabulary, sorted by piece in code-point order. */
  def train(wc: Seq[(String, Long)], rounds: Int = Rounds): Vector[(String, Long)] = {
    var vocab = seed(wc)
    val chars = vocab.iterator.map(_._1).filter(isSingleCp).toVector
    val model = wc.map { case (w, f) => (Bpe.chars(w), f) }
    var r = 0
    while (r < rounds) {
      val score = toJavaMap(vocab)
      val cnt = mutable.HashMap.empty[String, Long]
      model.foreach { case (cps, f) =>
        val ps = segmentCps(cps, score) // never null: chars always covered
        var i = 0
        while (i < ps.length) {
          cnt.update(ps(i), cnt.getOrElse(ps(i), 0L) + f)
          i += 1
        }
      }
      vocab = nextVocab(chars, cnt)
      r += 1
    }
    vocab.sortWith((a, b) => Bpe.cpCompare(a._1, b._1) < 0)
  }

  /** Executor-per-round EM trainer for an UNCAPPED word model — the
    * unigram twin of [[Bpe.trainDistributed]]. The seed is one substring
    * explode (positions × lengths ≤ [[MaxLen]]) + a TakeOrdered; each EM
    * round segments every word EXECUTOR-SIDE through the codegen'd
    * [[graft.functions.UnigramPieces]] kernel (vocabulary rides along as a
    * bounded broadcast plan reference), aggregates piece counts map-side,
    * and collects only the bounded (≤ alphabet + [[SeedMulti]] rows) count
    * table as control-plane feedback for the driver's prune. Emits the
    * same vocabulary as [[train]]. */
  def trainDistributed(words: org.apache.spark.sql.DataFrame, rounds: Int = Rounds,
                       wordCol: String = "word", freqCol: String = "freq")
      : Vector[(String, Long)] = {
    import org.apache.spark.sql.functions._
    val w = words.select(col(wordCol).as("word"), col(freqCol).cast("long").as("freq"))
      .localCheckpoint(true) // consumed once per round: cut the upstream re-run
    val subCounts = w
      .select(col("word"), col("freq"),
        explode(sequence(lit(1), length(col("word")))).as("p"))
      .select(col("freq"),
        explode(sequence(lit(1), lit(MaxLen))).as("l"), col("word"), col("p"))
      .filter(col("p") + col("l") - lit(1) <= length(col("word")))
      .select(expr("substring(word, p, l)").as("piece"), col("freq"))
      .groupBy("piece").agg(sum("freq").as("c"))
      .persist() // two consumers: the chars collect and the multi TakeOrdered
    val chars = subCounts.filter(length(col("piece")) === 1)
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .sortWith((a, b) => Bpe.cpCompare(a._1, b._1) < 0).toVector
    val multis = subCounts
      .filter(length(col("piece")) >= 2)
      .orderBy(col("c").desc, col("piece").asc).limit(SeedMulti) // TakeOrdered
      .collect().map(r => (r.getString(0), r.getLong(1))).toVector
    subCounts.unpersist()
    val charKeys = chars.map(_._1)
    var vocab: Vector[(String, Long)] = chars ++ multis
    var r = 0
    while (r < rounds) {
      val cnt = w.select(col("freq"),
          explode(TextOps.unigramPieces(array(col("word")), vocab)).as("piece"))
        .groupBy("piece").agg(sum("freq").as("c"))
        .collect().map(x => (x.getString(0), x.getLong(1))).toMap
      vocab = nextVocab(charKeys, cnt)
      r += 1
    }
    vocab.sortWith((a, b) => Bpe.cpCompare(a._1, b._1) < 0)
  }
}
