package graft.llm

import org.apache.spark.sql.functions._
import graft.SparkSuite

/** Unigram-LM (SentencePiece-style) Viterbi-EM trainer: the integer total
  * order of the DP (fewest pieces → max score-sum → longest piece), the
  * seed/prune discipline, driver-vs-distributed parity, and the
  * UnigramPieces kernel's eval/codegen agreement. The query-level oracle
  * (BpeOps) replays all of it in DuckDB SQL; these specs pin the Scala
  * semantics it mirrors. */
class UnigramSpec extends SparkSuite {
  import spark.implicits._

  private def score(kv: (String, Long)*): java.util.HashMap[String, java.lang.Long] = {
    val m = new java.util.HashMap[String, java.lang.Long]()
    kv.foreach { case (p, c) => m.put(p, java.lang.Long.valueOf(c)) }
    m
  }

  test("Viterbi minimizes piece count first") {
    // "abcd": {ab, cd} (2 pieces) must beat {a,b,c,d} (4) whatever scores say
    val s = score("a" -> 100L, "b" -> 100L, "c" -> 100L, "d" -> 100L,
      "ab" -> 1L, "cd" -> 1L)
    assert(Unigram.segment("abcd", s).toSeq == Seq("ab", "cd"))
  }

  test("equal piece count breaks on max score sum, then longest piece") {
    // two 2-piece covers of "abc": {a,bc} (5+1=6) vs {ab,c} (3+1=4)
    val s1 = score("a" -> 5L, "bc" -> 1L, "ab" -> 3L, "c" -> 1L, "b" -> 0L)
    assert(Unigram.segment("abc", s1).toSeq == Seq("a", "bc"))
    // full (n, f) tie: {ab, cd} vs {abc, d} both 2 pieces, sum 4 —
    // the DP prefers the LONGER final candidate at each position, so at
    // p=4 candidate l=1 ({abc}+d) loses to... l=2 ({ab}+cd) only via the
    // longest-l rule; construct an exact tie and pin the choice
    val s2 = score("ab" -> 2L, "cd" -> 2L, "abc" -> 3L, "d" -> 1L)
    assert(Unigram.segment("abcd", s2).toSeq == Seq("ab", "cd"))
  }

  test("uncoverable position makes the word null (→ [UNK] in the kernel)") {
    assert(Unigram.segment("axb", score("a" -> 1L, "b" -> 1L)) == null)
    assert(Unigram.segment("", score("a" -> 1L)).toSeq == Seq.empty)
  }

  test("code points, not UTF-16 units") {
    // "😀a" = 2 code points; piece "😀a" is length 2 in cps (4 UTF-16 units)
    val s = score("😀" -> 1L, "a" -> 1L, "😀a" -> 5L)
    assert(Unigram.segment("😀a", s).toSeq == Seq("😀a"))
  }

  test("seed = all chars + top multis by (count desc, cp order)") {
    val v = Unigram.seed(Seq("abab" -> 2L)).toMap
    // chars: a×2 pos ×2 freq = 4 each; multis: ab appears at pos 1,3 → 4;
    // ba at pos 2 → 2; aba/bab → 2 each; abab → 2
    assert(v("a") == 4L && v("b") == 4L)
    assert(v("ab") == 4L && v("ba") == 2L && v("abab") == 2L)
    assert(v.contains("aba") && v.contains("bab"))
  }

  test("EM rounds: counts re-score, unused multis pruned, chars kept") {
    // one word "abab"×10: Viterbi under the seed picks the fewest pieces —
    // "abab" itself (1 piece). After round 1 only "abab" has a count;
    // prune keeps floor(3·1/4)=0 multis → chars-only vocab with score 0,
    // then rounds re-segment to chars and chars get counts back.
    val v = Unigram.train(Seq("abab" -> 10L), rounds = 2).toMap
    assert(v.keySet == Set("a", "b"))
    assert(v("a") == 20L && v("b") == 20L)
  }

  test("driver and distributed trainers emit the identical vocabulary") {
    val wc = Seq(("spark", 40L), ("spar", 11L), ("park", 7L), ("sparkle", 3L),
      ("a", 25L), ("ab", 13L), ("ba", 9L), ("😀ab", 2L))
    val driver = Unigram.train(wc)
    val df = wc.toDF("word", "freq")
    val dist = Unigram.trainDistributed(df)
    assert(dist == driver)
  }

  test("kernel: codegen and interpreted eval agree; [UNK] and doc order") {
    val vocab = Unigram.train(Seq(("spark", 5L), ("park", 3L), ("ab", 2L)))
    val docs = Seq(
      (1L, Seq("spark", "park", "ab")),
      (2L, Seq("sparkxq", "spark")), // 'x','q' not in any piece → [UNK]
      (3L, Seq.empty[String])).toDF("id", "words")
    val rows = docs.select(col("id"),
        TextOps.unigramPieces(col("words"), vocab).as("p"))
      .orderBy("id").collect()
    val doc2 = rows(1).getSeq[String](1)
    assert(doc2.head == Unigram.Unk)            // uncoverable word collapses
    assert(doc2.tail.mkString == "spark")       // next word's pieces follow
    assert(rows(2).getSeq[String](1).isEmpty)
    // coverable words reproduce their text on concat (lossless pieces)
    assert(rows(0).getSeq[String](1).mkString == "sparkparkab")
    // interpreted parity (eval path, no codegen)
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import org.apache.spark.unsafe.types.UTF8String
    val arr = new GenericArrayData(Array[Any](
      UTF8String.fromString("sparkxq"), UTF8String.fromString("spark")))
    val out = graft.functions.UnigramPieces.encode(arr,
      new graft.functions.UnigramPieces.Model(vocab))
    assert((0 until out.numElements()).map(out.getUTF8String(_).toString) == doc2)
  }
}
