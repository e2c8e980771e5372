package graft.llm

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.SparkSuite

/** Text/similarity primitives for the training-data operators: portable
  * hashing, shingle edges, quantization determinism, language-ID tie order,
  * LSH bucket growth. */
class TextOpsSpec extends SparkSuite {
  import spark.implicits._

  test("hash60 column form equals the driver-side constant form") {
    val s = "the quick brown"
    val col60 = Seq(s).toDF("v").select(TextOps.hash60(col("v"))).collect()(0).getLong(0)
    assert(col60 == TextOps.hash60Str(s))
    assert(col60 >= 0L)
  }

  test("shingles: short documents yield one whole-text shingle") {
    val r = Seq("one two").toDF("v")
      .select(TextOps.shingles(TextOps.tokens(col("v")), 3)).collect()(0).getSeq[String](0)
    assert(r == Seq("one two"))
  }

  test("shingles are distinct and ordered windows") {
    val r = Seq("a b a b a").toDF("v")
      .select(TextOps.shingles(TextOps.tokens(col("v")), 2)).collect()(0).getSeq[String](0)
    assert(r == Seq("a b", "b a"))
  }

  test("repetition filters: dup-n-gram ratio and top-n-gram coverage") {
    val r = Seq(
      "spam spam spam spam spam",        // degenerate repetition
      "all words here are different ok", // clean
      "a b a b c").toDF("v")
      .select(
        TextOps.dupNgramRatio(TextOps.tokens(col("v")), 2).as("dup2"),
        TextOps.topNgramFraction(TextOps.tokens(col("v")), 2).as("top2"))
      .collect().toSeq.map(x => (x.getDouble(0), x.getDouble(1)))
    assert(r(0) == ((0.75, 1.0)))   // 4 grams "spam spam", all identical
    assert(r(1) == ((0.0, 0.2)))    // 5 distinct grams of 5
    assert(r(2) == ((0.25, 0.5)))   // "a b" twice of 4 grams
  }

  test("quant avoids engine-specific round-half behavior") {
    val r = Seq(0.05, 0.15, 0.25).toDF("v")
      .select(TextOps.quant(col("v"), 1)).collect().toSeq.map(_.getDouble(0))
    // floor(x*10 + 0.5): exact-half always rounds UP regardless of engine
    assert(r == Seq(0.1, 0.2, 0.3))
  }

  test("langId breaks ties in fixed priority order (en first)") {
    val scores = TextOps.LangStopwords.map { case (l, ws) =>
      l -> TextOps.langScore(TextOps.tokens(col("v")), ws) }
    val r = Seq("xyz qq").toDF("v") // zero hits everywhere → tie
      .select(TextOps.langId(scores)).collect()(0).getString(0)
    assert(r == "en")
  }

  test("simhash is deterministic and 32-bit bounded") {
    val r = Seq("the cat sat on the mat", "the cat sat on the mat").toDF("v")
      .select(TextOps.simhash32(TextOps.tokens(col("v")))).collect().toSeq.map(_.getLong(0))
    assert(r(0) == r(1))
    assert(r(0) >= 0L && r(0) < (1L << 32))
  }

  test("minhash signatures detect containment similarity") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "alpha beta gamma delta epsilon zeta eta iota"),
      (3L, "completely different words entirely other thing here now")).toDF("id", "text")
    val hs = transform(TextOps.shingles(TextOps.tokens(col("text")), 3), TextOps.hash60(_))
    val sigs = docs.select(col("id"), TextOps.minhash(hs, 0).as("m0"), TextOps.minhash(hs, 1).as("m1"))
      .collect().toSeq.map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // near-identical docs share at least one minhash; the unrelated one shares none
    assert(sigs(1) != sigs(3))
    assert(sigs(1)._1 == sigs(2)._1 || sigs(1)._2 == sigs(2)._2)
  }

  test("MinHashSig (codegen) equals the 16 chained interpreted minhash calls") {
    val docs = Seq("alpha beta gamma delta epsilon zeta", "one two three", "x")
      .toDF("text")
    val hs = transform(TextOps.shingles(TextOps.tokens(col("text")), 3), TextOps.hash60(_))
    val chained = docs.select(array((0 until 16).map(i => TextOps.minhash(hs, i)): _*))
      .collect().toSeq.map(_.getSeq[Long](0))
    val native = docs.select(TextOps.minhashSignature(hs, 16))
      .collect().toSeq.map(_.getSeq[Long](0))
    assert(native == chained)
  }

  test("MinHashSig interpreted eval matches codegen (null elements skipped)") {
    val d = df("hs ARRAY<BIGINT>", Seq(Row(Seq[Any](5L, null, 11L)), Row(Seq[Any]())))
    val sigCol = TextOps.minhashSignature(col("hs"), 4)
    // codegen path
    val gen = d.select(sigCol).collect().toSeq.map(_.getSeq[Long](0))
    // force interpreted eval through the expression directly
    import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
    val expr = graft.functions.MinHashSig(
      org.apache.spark.sql.catalyst.expressions.BoundReference(0,
        org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.LongType), true),
      TextOps.MinHashA.take(4).toSeq, TextOps.MinHashB.take(4).toSeq, TextOps.MinHashP)
    val row = org.apache.spark.sql.catalyst.InternalRow(
      new GenericArrayData(Array[Any](5L, null, 11L)))
    val interp = expr.eval(row).asInstanceOf[ArrayData].toLongArray().toSeq
    assert(gen.head == interp)
    // empty array → all mins stay at P (no elements voted)
    assert(gen(1).forall(_ == TextOps.MinHashP))
  }

  test("ShingleHash60 (codegen) equals hash60Array(shingles(...)) bit-for-bit") {
    val docs = Seq(
      "alpha beta gamma delta epsilon",      // ordinary 3-windows
      "a b a b a b a b",                     // duplicate shingles → distinct
      "one two",                             // fewer than n → whole-array shingle
      "one", "",                             // single token / empty text
      "naïve café 日本語 text 北京 test"       // unicode
    ).toDF("text")
    for (n <- Seq(3, 5)) {
      val toks = TextOps.tokens(col("text"))
      val unfused = docs.select(TextOps.hash60Array(TextOps.shingles(toks, n)))
        .collect().toSeq.map(_.getSeq[Long](0))
      val fused = docs.select(TextOps.shingleHash60(toks, n))
        .collect().toSeq.map(_.getSeq[Long](0))
      assert(fused == unfused, s"n=$n")
    }
  }

  test("ShingleHash60: 200 random docs (unicode, dups, degenerate) match unfused in all modes") {
    val rnd = new scala.util.Random(77L)
    val alphabet = Vector("a", "bb", "ccc", "naïve", "日本", "x1", "", " ")
    val docs = (0 until 200).map { _ =>
      val len = rnd.nextInt(12) // includes 0- and 1-token docs
      (0 until len).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString(" ")
    }.toDF("text")
    val toks = TextOps.tokens(col("text"))
    for (n <- Seq(2, 3, 5)) {
      assert(
        docs.select(TextOps.shingleHash60(toks, n)).collect().toSeq.map(_.getSeq[Long](0)) ==
        docs.select(TextOps.hash60Array(TextOps.shingles(toks, n))).collect().toSeq.map(_.getSeq[Long](0)),
        s"distinct n=$n")
      assert(
        docs.select(TextOps.ngramHash60(toks, n)).collect().toSeq.map(_.getSeq[Long](0)) ==
        docs.select(TextOps.hash60Array(TextOps.ngrams(toks, n))).collect().toSeq.map(_.getSeq[Long](0)),
        s"multi n=$n")
    }
  }

  test("ShingleHash60 Multi/Positional modes equal their unfused compositions") {
    val docs = Seq(
      "alpha beta gamma delta", "a b a b a b", "one two", "one", "",
      "naïve café 日本語 text").toDF("text")
    val toks = TextOps.tokens(col("text"))
    for (n <- Seq(2, 8)) {
      val multiU = docs.select(TextOps.hash60Array(TextOps.ngrams(toks, n)))
        .collect().toSeq.map(_.getSeq[Long](0))
      val multiF = docs.select(TextOps.ngramHash60(toks, n))
        .collect().toSeq.map(_.getSeq[Long](0))
      assert(multiF == multiU, s"multi n=$n")
      val posU = docs.select(
        when(size(toks) >= n, TextOps.hash60Array(transform(
          sequence(lit(0), size(toks) - n),
          i => concat_ws(" ", slice(toks, i + 1, lit(n))))))
        .otherwise(array().cast("array<bigint>")))
        .collect().toSeq.map(_.getSeq[Long](0))
      val posF = docs.select(TextOps.positionalGramHash60(toks, n))
        .collect().toSeq.map(_.getSeq[Long](0))
      assert(posF == posU, s"positional n=$n")
    }
  }

  test("ShingleHash60 interpreted eval matches the codegen result") {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import org.apache.spark.unsafe.types.UTF8String
    val toksSeq = Seq("w1", "w2", "w1", "w2", "w3")
    val gen = Seq(toksSeq.mkString(" ")).toDF("text")
      .select(TextOps.shingleHash60(TextOps.tokens(col("text")), 2))
      .collect().head.getSeq[Long](0)
    val expr = graft.functions.ShingleHash60(
      org.apache.spark.sql.catalyst.expressions.BoundReference(0,
        org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.StringType), true), 2)
    val row = org.apache.spark.sql.catalyst.InternalRow(
      new GenericArrayData(toksSeq.map(UTF8String.fromString).toArray[Any]))
    val interp = expr.eval(row)
      .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData].toLongArray().toSeq
    assert(gen == interp)
    // distinct kept: "w1 w2" appears twice in window space but once here
    assert(interp.length == 3)
  }

  test("Hash60Array (codegen) equals transform+hash60 element-for-element") {
    val docs = Seq("alpha beta gamma delta", "one", "", "naïve café 日本語 text")
      .toDF("text")
    val toks = TextOps.tokens(col("text"))
    val folded = docs.select(transform(toks, t => TextOps.hash60(t)))
      .collect().toSeq.map(_.getSeq[Long](0))
    val native = docs.select(TextOps.hash60Array(toks))
      .collect().toSeq.map(_.getSeq[Long](0))
    assert(native == folded)
    // and against the driver-side twin
    assert(native.head.head == TextOps.hash60Str("alpha"))
  }

  test("Hash60Array interpreted eval matches codegen; null elements stay null") {
    val d = df("a ARRAY<STRING>", Seq(Row(Seq[Any]("x", null, "y")), Row(Seq[Any]())))
    val gen = d.select(TextOps.hash60Array(col("a"))).collect().toSeq
      .map(_.getSeq[java.lang.Long](0))
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import org.apache.spark.unsafe.types.UTF8String
    val expr = graft.functions.Hash60Array(
      org.apache.spark.sql.catalyst.expressions.BoundReference(0,
        org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.StringType), true))
    val row = org.apache.spark.sql.catalyst.InternalRow(
      new GenericArrayData(Array[Any](UTF8String.fromString("x"), null, UTF8String.fromString("y"))))
    val interp = expr.eval(row).asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    assert(gen.head(0) == interp.getLong(0) && gen.head(2) == interp.getLong(2))
    assert(gen.head(1) == null && interp.isNullAt(1))
    assert(gen(1).isEmpty)
  }

  test("hash60_array is callable from SQL after registration") {
    org.apache.spark.sql.GraftExpressions.registerFunctions(spark)
    val viaSql = spark.sql("SELECT hash60_array(array('a','b')) AS h")
      .collect()(0).getSeq[Long](0)
    assert(viaSql == Seq(TextOps.hash60Str("a"), TextOps.hash60Str("b")))
  }

  test("minhash_sig is callable from SQL after registration") {
    org.apache.spark.sql.GraftExpressions.registerFunctions(spark)
    val viaSql = spark.sql(
      "SELECT minhash_sig(array(5L, 11L), 4) AS s").collect()(0).getSeq[Long](0)
    val viaColumn = Seq(Seq(5L, 11L)).toDF("hs")
      .select(TextOps.minhashSignature(col("hs"), 4)).collect()(0).getSeq[Long](0)
    assert(viaSql == viaColumn)
    // default arity
    assert(spark.sql("SELECT minhash_sig(array(5L))").collect()(0).getSeq[Long](0).length == 16)
  }

  test("kmin_k is callable from SQL after registration") {
    org.apache.spark.sql.GraftExpressions.registerFunctions(spark)
    Seq(9L, 3L, 3L, 1L, 7L).toDF("h").createOrReplaceTempView("kmin_t")
    val viaSql = spark.sql("SELECT kmin_k(h, 3) FROM kmin_t")
      .collect()(0).getSeq[Long](0)
    assert(viaSql == Seq(1L, 3L, 7L)) // distinct, ascending, bounded
  }

  test("top_k_by is callable from SQL after registration") {
    org.apache.spark.sql.GraftExpressions.registerFunctions(spark)
    Seq((5.0, 1L), (9.0, 2L), (7.0, 3L), (9.0, 9L)).toDF("v", "id")
      .createOrReplaceTempView("topk_t")
    val viaSql = spark.sql("SELECT top_k_by(v, id, 2) FROM topk_t")
      .collect()(0).getSeq[org.apache.spark.sql.Row](0)
      .map(e => (e.getDouble(0), e.getLong(1)))
    assert(viaSql == Seq((9.0, 2L), (9.0, 9L))) // score desc, id asc
  }

  test("bpe_pieces is callable from SQL after registration") {
    org.apache.spark.sql.GraftExpressions.registerFunctions(spark)
    val viaSql = spark.sql(
      "SELECT bpe_pieces(array('abc','x'), array('a','ab'), array('b','c'))")
      .collect()(0).getSeq[String](0)
    assert(viaSql == Seq("abc", "x")) // (a,b) then (ab,c) fully merges 'abc'
  }

  test("cosine of identical vectors is 1; orthogonal is 0") {
    val d = df("a ARRAY<DOUBLE>, b ARRAY<DOUBLE>", Seq(
      Row(Seq(1.0, 2.0, 3.0), Seq(1.0, 2.0, 3.0)),
      Row(Seq(1.0, 0.0), Seq(0.0, 1.0))))
    val r = d.select(TextOps.quant(Similarity.cosine(col("a"), col("b")), 4))
      .collect().toSeq.map(_.getDouble(0))
    assert(r == Seq(1.0, 0.0))
  }

  test("lshBucket: identical vectors share the bucket, sign-flipped do not") {
    val planes = Similarity.planes(6, 4)
    val d = df("v ARRAY<DOUBLE>", Seq(
      Row(Seq(1.0, 2.0, 3.0, 4.0)), Row(Seq(1.0, 2.0, 3.0, 4.0)),
      Row(Seq(-1.0, -2.0, -3.0, -4.0))))
    val r = d.select(Similarity.lshBucket(col("v"), planes)).collect().toSeq.map(_.getLong(0))
    assert(r(0) == r(1))
    assert(r(0) != r(2))
  }

  test("LSH finds a true near-duplicate at rank 1 (the regime LSH is FOR)") {
    // near-identical vectors (cos→1) share all sign bits — recall → 1.
    // On mutually-random vectors "top-k" is noise and bucket recall is
    // legitimately low; multi-probe widens it (measured 12% → 34% at sf0.01).
    val base = Array.tabulate(16)(i => math.sin(i + 1.0))
    val nearDup = base.map(_ * 1.0005)
    val noise = (1 to 30).map(s => Array.tabulate(16)(i => math.sin(i * 7.3 + s * 13.7)))
    val rows = (Seq(base, nearDup) ++ noise).zipWithIndex.map { case (v, i) =>
      Row(i.toLong, v.toSeq) }
    val corpus = df("vec_id BIGINT, embedding ARRAY<DOUBLE>", rows)
    val planes = Similarity.planes(5, 16)
    val top = Similarity.lshTopK(corpus.filter(col("vec_id") === 0L), corpus, 1, planes)
      .collect()(0)
    assert(top.getLong(top.fieldIndex("neighbor_id")) == 1L)
    assert(top.getDouble(top.fieldIndex("cos")) == 1.0) // quantized to 4 decimals
  }

  test("multi-probe candidates are a superset of single-bucket candidates") {
    val rows = (0 until 40).map(i => Row(i.toLong,
      Array.tabulate(8)(d => math.sin(i * 3.1 + d * 1.7)).toSeq))
    val corpus = df("vec_id BIGINT, embedding ARRAY<DOUBLE>", rows)
    val planes = Similarity.planes(4, 8)
    val q = corpus.filter(col("vec_id") < 5L)
    val single = Similarity.lshTopK(q, corpus, 10, planes)
      .select("query_id", "neighbor_id").collect().toSet
    val multi = Similarity.lshTopKMultiProbe(q, corpus, 10, planes)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val singlePairs = single.map(r => (r.getLong(0), r.getLong(1)))
    // every single-bucket candidate that made top-10 is reachable by probes
    assert(multi.size >= singlePairs.size)
  }

  test("planesFor grows the bucket space with the corpus") {
    assert(Similarity.planesFor(1000) == 4)        // floor at 4
    assert(Similarity.planesFor(1000000) > Similarity.planesFor(10000))
    assert(Similarity.planesFor(1L << 40) > 20)    // 100 TB scale keeps growing
  }

  test("redactPii scrubs emails before phones and leaves clean text alone") {
    val r = Seq(
      "reach me at jane.doe+x@sub.example.org today",
      "call +1 555 123-4567 or 555-123-4567 now",
      "clean text with no pii at all",
      "both a9@ex.com and +44 20 7946 0958 appear").toDF("v")
      .select(TextOps.redactPii(col("v"))).collect().toSeq.map(_.getString(0))
    assert(r(0) == "reach me at <EMAIL> today")
    assert(r(1) == "call <PHONE> or <PHONE> now")
    assert(r(2) == "clean text with no pii at all")
    assert(r(3) == "both <EMAIL> and <PHONE> appear")
  }

  test("LangHits (codegen) equals the per-language interpreted langScore filters") {
    val docs = Seq(
      "the cat sat on the mat and it was fine",   // en-heavy
      "der hund und die katze auf der matte",     // de-heavy
      "el perro y la casa en un dia",             // es (note: 'en' is es too)
      "le chat et un chien dans une maison",      // fr ('un' is es AND fr)
      "", "xyzzy plugh").toDF("text")
      .withColumn("__toks", TextOps.tokens(col("text")))
    val folded = docs.select(array(TextOps.LangStopwords.map { case (_, ws) =>
      TextOps.langScore(col("__toks"), ws).cast("long") }: _*))
      .collect().toSeq.map(_.getSeq[Long](0))
    val native = docs.select(TextOps.langHits(col("__toks")))
      .collect().toSeq.map(_.getSeq[Long](0))
    assert(native == folded)
    // multi-membership tokens count for EVERY language that lists them
    val un = Seq("un un").toDF("text")
      .select(TextOps.langHits(TextOps.tokens(col("text"))))
      .collect()(0).getSeq[Long](0)
    assert(un == Seq(0L, 0L, 2L, 2L)) // 'un' is an es AND fr stopword
  }

  test("LangHits randomized parity: 200 seeded token mixes equal the folded form") {
    val rnd = new scala.util.Random(31L)
    val pool = TextOps.LangStopwords.flatMap(_._2) ++
      Seq("xyz", "Der", "THE", "un!", "", "quelque", "数据") // case/punct/unicode near-misses
    val rows = (0 until 200).map { _ =>
      Seq.fill(rnd.nextInt(30))(pool(rnd.nextInt(pool.length))).mkString(" ")
    }
    val d = rows.toDF("text").withColumn("__toks", TextOps.tokens(col("text")))
    val folded = d.select(array(TextOps.LangStopwords.map { case (_, ws) =>
      TextOps.langScore(col("__toks"), ws).cast("long") }: _*))
      .collect().toSeq.map(_.getSeq[Long](0))
    val native = d.select(TextOps.langHits(col("__toks")))
      .collect().toSeq.map(_.getSeq[Long](0))
    assert(native == folded)
  }

  test("LangHits interpreted eval matches codegen; null tokens count nothing") {
    val d = df("a ARRAY<STRING>", Seq(Row(Seq[Any]("the", null, "und")), Row(null)))
    val gen = d.select(TextOps.langHits(col("a"))).collect().toSeq
    assert(gen(0).getSeq[Long](0) == Seq(1L, 1L, 0L, 0L))
    assert(gen(1).isNullAt(0)) // null array → null
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import org.apache.spark.unsafe.types.UTF8String
    val expr = graft.functions.LangHits(
      org.apache.spark.sql.catalyst.expressions.BoundReference(0,
        org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.StringType), true))
    val row = org.apache.spark.sql.catalyst.InternalRow(
      new GenericArrayData(Array[Any](UTF8String.fromString("the"), null,
        UTF8String.fromString("und"))))
    val interp = expr.eval(row).asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    assert(interp.toLongArray().toSeq == Seq(1L, 1L, 0L, 0L))
    // SQL registration parity
    org.apache.spark.sql.GraftExpressions.registerFunctions(spark)
    d.createOrReplaceTempView("langhits_t")
    val viaSql = spark.sql("SELECT lang_hits(a) FROM langhits_t").collect()(0).getSeq[Long](0)
    assert(viaSql == Seq(1L, 1L, 0L, 0L))
  }
}
