package graft.llm

import org.apache.spark.sql.functions._
import graft.SparkSuite

/** BPE tokenizer: trainer determinism, the merge-application convention,
  * driver/distributed trainer parity, and the BpePieces kernel's
  * eval/codegen agreement. The query-level oracle (BpeOps) replays the same
  * loop in DuckDB SQL; these specs pin the Scala semantics it mirrors. */
class BpeSpec extends SparkSuite {
  import spark.implicits._

  test("applyRule merges left-to-right in one pass (aaa + (a,a) -> [aa, a])") {
    assert(Bpe.applyRule(Array("a", "a", "a"), "a", "a").toSeq == Seq("aa", "a"))
    assert(Bpe.applyRule(Array("a", "a", "a", "a"), "a", "a").toSeq == Seq("aa", "aa"))
    assert(Bpe.applyRule(Array("x", "a", "b", "y"), "a", "b").toSeq == Seq("x", "ab", "y"))
    // a freshly merged symbol can chain only via its own rule
    assert(Bpe.applyRule(Array("aa", "a"), "aa", "a").toSeq == Seq("aaa"))
    assert(Bpe.applyRule(Array("q"), "a", "b").toSeq == Seq("q"))
  }

  test("train picks max weight with (weight DESC, lhs, rhs) tie-break and replays merges") {
    // freqs: "abab"×3, "abc"×2 → pairs: (a,b)=8, (b,a)=3, (b,c)=2
    val m = Bpe.train(Seq("abab" -> 3L, "abc" -> 2L), 3)
    assert(m(0).lhs == "a" && m(0).rhs == "b" && m(0).weight == 8L && m(0).merged == "ab")
    // after merge 0: abab→[ab,ab]×3, abc→[ab,c]×2 → (ab,ab)=3, (ab,c)=2
    assert(m(1).lhs == "ab" && m(1).rhs == "ab" && m(1).weight == 3L)
    assert(m(2).lhs == "ab" && m(2).rhs == "c" && m(2).weight == 2L)
    // tie-break: equal weights go lexicographically smallest
    val t = Bpe.train(Seq("xy" -> 1L, "ab" -> 1L), 1)
    assert(t(0).lhs == "a" && t(0).rhs == "b")
  }

  test("chars() splits by CODE POINT and tie-break is code-point order") {
    // U+1F600 is ONE symbol from round 1 (code-point split \u2014 a charAt split
    // would feed its two surrogates as separate symbols, diverging from
    // Spark split(w,"") and the oracle's regexp_extract_all(w,'.')). Round 1
    // then ties (smiley,a) vs (priv,b) at weight 3: UTF-16 units rank the
    // smiley (0xD83D\u2026) below U+E000, code points rank it above \u2014 the engines
    // compare code points, so the winner must be priv.
    val smiley = new String(Character.toChars(0x1F600))
    val priv = "\uE000"
    val merges = Bpe.train(Seq(s"${smiley}a" -> 3L, s"${priv}b" -> 3L), 2)
    assert(merges.head.lhs == priv && merges.head.rhs == "b", merges.head)
    assert(merges(1).lhs == smiley && merges(1).rhs == "a", merges(1))
    // encode keeps supplementary chars whole and restores the word
    val rules = merges.map(m => (m.lhs, m.rhs))
    assert(Bpe.encodeWord(s"${smiley}a", rules).toSeq == Seq(s"${smiley}a"))
    assert(Bpe.encodeWord(smiley, rules).toSeq == Seq(smiley))
  }

  test("driver and distributed trainers agree on supplementary-char words") {
    val smiley = new String(Character.toChars(0x1F600))
    val rocket = new String(Character.toChars(0x1F680))
    val words = Seq(s"${smiley}${rocket}ab" -> 9L, s"${rocket}ab" -> 6L,
      s"ab${smiley}" -> 4L, "ab" -> 3L)
    val dist = Bpe.trainDistributed(words.toDF("word", "freq"), 6)
    val drv = Bpe.train(words, 6)
    assert(dist == drv, s"$dist vs $drv")
    // and no merge-table entry starts or ends mid-code-point
    drv.foreach { m =>
      Seq(m.lhs, m.rhs).foreach { s =>
        assert(!Character.isHighSurrogate(s.last), s"dangling surrogate in $s")
        assert(!Character.isLowSurrogate(s.head), s"leading low surrogate in $s")
      }
    }
  }

  test("train stops when the vocabulary is fully merged") {
    val m = Bpe.train(Seq("ab" -> 5L), 10)
    assert(m.length == 1 && m(0).merged == "ab")
  }

  test("encodeWord applies ranks in order and reproduces training segmentation") {
    val rules = Bpe.train(Seq("lower" -> 5L, "lowest" -> 2L), 4).map(m => (m.lhs, m.rhs))
    val enc = Bpe.encodeWord("lowering", rules)
    // whatever the exact merges, re-encoding a training word must equal its
    // final training state
    val trained = Bpe.train(Seq("lower" -> 5L, "lowest" -> 2L), 4)
    var st = "lower".map(String.valueOf(_)).toArray
    trained.foreach(m => st = Bpe.applyRule(st, m.lhs, m.rhs))
    assert(Bpe.encodeWord("lower", rules).toSeq == st.toSeq)
    assert(enc.mkString == "lowering") // concatenation always restores the word
  }

  test("trainDistributed emits the identical merge table to the driver trainer") {
    val words = Seq("spark" -> 40L, "sparse" -> 25L, "parse" -> 25L, "park" -> 10L,
      "stream" -> 8L, "scan" -> 8L, "a" -> 100L)
    val wdf = words.toDF("word", "freq")
    val dist = Bpe.trainDistributed(wdf, 8)
    val drv = Bpe.train(words, 8)
    assert(dist == drv, s"$dist vs $drv")
  }

  test("BpePieces perWord flattens per-word pieces, skips nulls/empties; eval==codegen") {
    val rules = Seq(("a", "b"), ("ab", "c"))
    val df = Seq(
      (1L, Seq("abc", "ab", "x")),
      (2L, Seq("", "abcabc")),
      (3L, Seq[String]())).toDF("id", "ws")
    def run(codegen: String) = {
      spark.conf.set("spark.sql.codegen.wholeStage", codegen)
      df.select(col("id"), TextOps.bpePieces(col("ws"), rules, perWord = true).as("p"))
        .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    }
    val on = run("true"); val off = run("false")
    spark.conf.set("spark.sql.codegen.wholeStage", "true")
    val exp = Map(
      1L -> Seq("abc", "ab", "x"),
      2L -> Seq("abc", "abc"),
      3L -> Seq[String]())
    assert(on == exp, s"$on")
    assert(off == exp, s"$off")
  }

  test("BpePieces sequence mode applies rules to the array as one symbol sequence") {
    val df = Seq((1L, Seq("a", "b", "c"))).toDF("id", "syms")
    val out = df.select(TextOps.bpePieces(col("syms"), Seq(("a", "b"), ("ab", "c")),
      perWord = false)).collect()(0).getSeq[String](0)
    assert(out == Seq("abc"))
  }

  test("spark split(word, \"\") yields per-character symbols (trainDistributed invariant)") {
    val out = Seq("spark").toDF("w").select(split(col("w"), "")).collect()(0).getSeq[String](0)
    assert(out == Seq("s", "p", "a", "r", "k"), out)
  }

  test("bpe queries: encode checksum equals the driver replay on a parquet corpus") {
    val dir = java.nio.file.Files.createTempDirectory("graft_bpe_").toString
    val rows = Seq(
      (0L, "stream spark sort scan stream spark", "en", "s0"),
      (1L, "sparse parse spark park sort", "en", "s0"),
      (2L, "scan scan stream parse spark sort park", "en", "s1"))
    rows.toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val merges = graft.queries.BpeOps.trainedMerges(spark, dir)
    // independent replay: word counts -> driver trainer
    val wc = rows.flatMap(_._2.split("\\s+")).filter(_.nonEmpty)
      .groupBy(identity).map { case (w, l) => w -> l.size.toLong }.toSeq
      .sortBy { case (w, f) => (-f, w) }
    assert(merges == Bpe.train(wc, graft.queries.BpeOps.NMerges))

    val trainDf = graft.queries.BpeOps.bpeTrain(spark, dir).collect()
    assert(trainDf.length == merges.length && merges.nonEmpty)

    val rules = merges.map(m => (m.lhs, m.rhs))
    val got = graft.queries.BpeOps.bpeEncode(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2)))).toMap
    val exp = rows.map { case (id, text, _, _) =>
      val pieces = text.trim.split("\\s+").filter(_.nonEmpty)
        .flatMap(w => Bpe.encodeWord(w, rules))
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(pieces.mkString("\u001f").getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      id -> ((pieces.length.toLong, hex))
    }.toMap
    assert(got == exp, s"$got vs $exp")
  }

  test("viterbiSegment equals an exact driver DP and never beats it") {
    // seeded corpus with heavy repeated bigrams so the bigram path matters
    val rnd = new scala.util.Random(17L)
    val phrases = Seq("big data", "fast scan", "hash join")
    val rows = (0L until 40L).map { i =>
      val words = Seq.fill(12)(
        if (rnd.nextBoolean()) phrases(rnd.nextInt(3))
        else s"w${rnd.nextInt(30)}").mkString(" ")
      (i, words, "en", "s0")
    }
    val dir = java.nio.file.Files.createTempDirectory("graft_vit_").toString
    rows.toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    // driver twin: same capped vocab, same lexicographic objective
    def toks(t: String) = t.trim.split("\\s+").toSeq
    val allToks = rows.flatMap(r => toks(r._2))
    val uni = allToks.groupBy(identity).view.mapValues(_.size.toLong).toMap
      .toSeq.sortBy { case (w, f) => (-f, w) }.take(512).toMap
    val bigAll = rows.flatMap(r => toks(r._2).sliding(2).filter(_.size == 2)
      .map(_.mkString(" ")))
    val big = bigAll.groupBy(identity).view.mapValues(_.size.toLong).toMap
      .toSeq.sortBy { case (w, f) => (-f, w) }.take(256).toMap
    def dp(ws: Seq[String]): (Long, Long) = {
      var (n1, f1, n, f) = (0L, 0L, 0L, 0L)
      ws.zipWithIndex.foreach { case (w, i) =>
        val (an, af) = (n + 1, f + uni.getOrElse(w, 0L))
        val bOpt = if (i > 0) big.get(s"${ws(i - 1)} $w") else None
        val (cn, cf) = bOpt match {
          case Some(bf0) =>
            val (bn, bf) = (n1 + 1, f1 + bf0)
            if (an < bn || (an == bn && af >= bf)) (an, af) else (bn, bf)
          case None => (an, af)
        }
        n1 = n; f1 = f; n = cn; f = cf
      }
      (n, f)
    }
    val exp = rows.map(r => r._1 -> dp(toks(r._2))).toMap
    val got = graft.queries.BpeOps.viterbiSegment(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(3)))).toMap
    assert(got == exp, s"${got.toSeq.sortBy(_._1).take(3)} vs ${exp.toSeq.sortBy(_._1).take(3)}")
    // optimality sanity: DP never needs more pieces than tokens, and uses
    // strictly fewer somewhere (the phrases guarantee winning bigrams)
    val nt = rows.map(r => r._1 -> toks(r._2).size).toMap
    assert(exp.forall { case (id, (n, _)) => n <= nt(id) })
    assert(exp.exists { case (id, (n, _)) => n < nt(id) })
  }

  test("byteSyms: UTF-8 hex pairs, supplementary chars covered, no OOV alphabet") {
    assert(Bpe.byteSyms("ab").toSeq == Seq("61", "62"))
    assert(Bpe.byteSyms("é").toSeq == Seq("C3", "A9"))      // 2-byte UTF-8
    assert(Bpe.byteSyms("€").toSeq == Seq("E2", "82", "AC")) // 3-byte
    assert(Bpe.byteSyms("😀").toSeq ==             // 😀, 4-byte
      Seq("F0", "9F", "98", "80"))
    assert(Bpe.byteSyms("").isEmpty)
  }

  test("byte-level encode is lossless on arbitrary unicode (hex concat = utf8 hex)") {
    val words = Seq("hello", "héllo", "日本語", "a😀b", "mixé€")
    val wc = words.map(_ -> 5L) ++ Seq("hehe" -> 50L, "lolo" -> 40L)
    val merges = Bpe.train(wc, 10, Bpe.byteSyms)
    val (lhs, rhs) = (merges.map(_.lhs).toArray, merges.map(_.rhs).toArray)
    words.foreach { w =>
      val pieces = Bpe.encodeWordBytes(w, lhs, rhs)
      assert(pieces.mkString("") == Bpe.byteSyms(w).mkString(""),
        s"byte loss on '$w'")
      // every piece is a whole number of byte symbols
      assert(pieces.forall(_.length % 2 == 0))
    }
  }

  test("byte-level training merges frequent byte pairs first") {
    // 'he' dominates: its byte pair (68,65) must be merge rank 0
    val wc = Seq("hehe" -> 100L, "xyz" -> 1L)
    val merges = Bpe.train(wc, 3, Bpe.byteSyms)
    assert(merges.head.lhs == "68" && merges.head.rhs == "65")
    // and the learned symbol keeps merging ('hehe' → one piece eventually)
    val enc = Bpe.encodeWordBytes("hehe",
      merges.map(_.lhs).toArray, merges.map(_.rhs).toArray)
    assert(enc.length < 4)
  }
}
