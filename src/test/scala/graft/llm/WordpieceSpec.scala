package graft.llm

import org.apache.spark.sql.functions._
import graft.SparkSuite

/** WordPiece tokenizer: likelihood-score training (exact integer quotient
  * compare), greedy longest-match encode incl. the [UNK] collapse, and the
  * WordPieces kernel's eval/codegen agreement. The query-level oracle
  * (BpeOps) replays both halves in DuckDB SQL; these specs pin the Scala
  * semantics it mirrors. */
class WordpieceSpec extends SparkSuite {
  import spark.implicits._

  test("train maximizes count(ab)/(count(a)count(b)), not raw pair count") {
    // "ababab"×4 and "xq"×3: pair (a,b) weight 12 but a,b are everywhere
    // (count(a)=count(b)=12 → score 12/144); (x,q) weight 3 with
    // count(x)=count(q)=3 → score 3/9 — the rarer-context pair must win,
    // which is exactly where WordPiece diverges from BPE's max-frequency.
    val m = Wordpiece.train(Seq("ababab" -> 4L, "xq" -> 3L), 1)
    assert(m(0).lhs == "x" && m(0).rhs == "q" && m(0).weight == 3L)
    val bpe = Bpe.train(Seq("ababab" -> 4L, "xq" -> 3L), 1)
    assert(bpe(0).lhs == "a" && bpe(0).rhs == "b") // the BPE contrast
  }

  test("score quotient is exact and ties break lexicographically") {
    // two pairs with the SAME rational score: (a,b) and (c,d) each appear
    // once, all four symbols count 1 → q = 10^18 for both → lex winner (a,b)
    val m = Wordpiece.train(Seq("ab" -> 1L, "cd" -> 1L), 2)
    assert(m(0).lhs == "a" && m(0).rhs == "b" && m(0).scoreQ == 1000000000000000000L)
    assert(m(1).lhs == "c" && m(1).rhs == "d")
    // quotient floor: pair weight 2, counts 3 and 2 → 2e18/6 = 333...333
    val f = Wordpiece.train(Seq("abab" -> 1L, "a" -> 1L), 1)
    assert(f(0).lhs == "a" && f(0).rhs == "b" && f(0).weight == 2L)
    assert(f(0).scoreQ == 333333333333333333L)
  }

  test("merges apply to the state so later rounds score the merged symbol") {
    val m = Wordpiece.train(Seq("abc" -> 2L), 2)
    assert(m(0).merged == "ab" || m(0).merged == "bc")
    // round 2 merges the round-1 piece with the remaining symbol
    assert(m(1).merged == "abc")
  }

  test("greedy encode takes the LONGEST match first and never backtracks") {
    val pieces = Set("a", "b", "c", "ab", "abc", "bc")
    assert(Wordpiece.encodeWord("abcbc", pieces, 3).toSeq == Seq("abc", "bc"))
    // greedy, not optimal: "ab"+"?" — after taking "ab", "cx" is uncoverable
    val p2 = Set("ab", "a", "bcx")
    assert(Wordpiece.encodeWord("abcx", p2, 3).toSeq == Seq(Wordpiece.Unk))
  }

  test("encode collapses uncoverable words to [UNK] and counts code points") {
    assert(Wordpiece.encodeWord("zz", Set("a"), 1).toSeq == Seq(Wordpiece.Unk))
    // supplementary char: one CODE POINT piece ("😀" = 2 UTF-16 units);
    // "ab" (2 cps) must outrank it only by cp length where both match
    val p = Set("😀", "a")
    assert(Wordpiece.encodeWord("😀a", p, 2).toSeq ==
      Seq("😀", "a"))
  }

  test("distributed trainer emits the driver trainer's exact merge table") {
    // includes an exact-quotient case (2e18/6 floors) and a lex tie
    val wc = Seq("ababab" -> 4L, "xq" -> 3L, "abab" -> 1L, "cd" -> 1L)
    val driver = Wordpiece.train(wc, 4)
    val dist = Wordpiece.trainDistributed(wc.toDF("word", "freq"), 4)
    assert(dist == driver)
    assert(driver.map(m => (m.rank, m.lhs, m.rhs, m.weight, m.scoreQ)) ==
      dist.map(m => (m.rank, m.lhs, m.rhs, m.weight, m.scoreQ)))
  }

  test("vocab = model code points + merged pieces") {
    val m = Wordpiece.train(Seq("ab" -> 2L), 1)
    val v = Wordpiece.vocab(Seq("ab", "c😀"), m)
    assert(v.toSet == Set("a", "b", "c", "😀", "ab"))
  }

  test("WordPieces kernel: codegen and interpreted eval agree, per doc order") {
    val vocab = Seq("a", "b", "ab", "c")
    val df = Seq(
      (1L, Seq("ab", "ba", "q")),   // q → [UNK]
      (2L, Seq("", "c"))            // empty word contributes nothing
    ).toDF("id", "words")
      .select(col("id"), TextOps.wordPieces(col("words"), vocab).as("p"))
    val rows = df.orderBy("id").collect()
    assert(rows(0).getSeq[String](1) == Seq("ab", "b", "a", Wordpiece.Unk))
    assert(rows(1).getSeq[String](1) == Seq("c"))
    // interpreted parity (eval path, no codegen)
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import org.apache.spark.unsafe.types.UTF8String
    val arr = new GenericArrayData(Array[Any](
      UTF8String.fromString("ab"), UTF8String.fromString("ba"),
      UTF8String.fromString("q")))
    val out = graft.functions.WordPieces.encode(arr,
      new graft.functions.WordPieces.Model(vocab))
    assert((0 until out.numElements()).map(out.getUTF8String(_).toString) ==
      Seq("ab", "b", "a", Wordpiece.Unk))
  }
}
