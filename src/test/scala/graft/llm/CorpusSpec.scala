package graft.llm

import org.apache.spark.sql.functions._
import graft.SparkSuite

/** Corpus-level training-data operators: decontamination semantics,
  * sampling determinism, packing boundary math. */
class CorpusSpec extends SparkSuite {
  import spark.implicits._

  private def docs(rows: (Long, String, String)*) =
    rows.toDF("doc_id", "text", "lang")

  test("decontaminate drops docs sharing an n-gram with the benchmark, keeps the rest") {
    val bench = docs((100L, "the quick brown fox jumps over the lazy dog", "en"))
    val train = docs(
      (1L, "we saw the quick brown fox jumps today again and again", "en"), // shares a 5-gram
      (2L, "completely unrelated text with no overlap at all here", "en"),
      (3L, "fox jumps over the lazy dog said nobody ever before", "en"))    // shares a 5-gram
    val out = Corpus.decontaminate(train, bench, 5)
      .select("doc_id").as[Long].collect().toSeq.sorted
    assert(out == Seq(2L))
  }

  test("decontaminate with a disjoint benchmark keeps everything") {
    val bench = docs((100L, "zzz yyy xxx www vvv uuu", "en"))
    val train = docs((1L, "aaa bbb ccc ddd eee fff", "en"))
    assert(Corpus.decontaminate(train, bench, 5).count() == 1L)
  }

  test("sampleStratified is deterministic and honors per-stratum rates") {
    val d = docs((0 until 200).map(i =>
      (i.toLong, s"doc $i", if (i % 2 == 0) "en" else "de")): _*)
    val keep = Corpus.sampleStratified(d, "lang", Seq("en" -> 1000L), 0L)
    // en: rate 1000‰ keeps every en row; de: default 0‰ keeps none
    val langs = keep.select("lang").distinct().as[String].collect().toSeq
    assert(langs == Seq("en") && keep.count() == 100L)
    // reproducible: the same call yields the same rows
    val a = Corpus.sampleStratified(d, "lang", Seq("en" -> 300L), 100L)
      .select("doc_id").as[Long].collect().toSeq.sorted
    val b = Corpus.sampleStratified(d, "lang", Seq("en" -> 300L), 100L)
      .select("doc_id").as[Long].collect().toSeq.sorted
    assert(a == b && a.nonEmpty && a.length < 200)
  }

  test("packSequences assigns the window of the doc's first token, per shard") {
    val d = Seq(
      (1L, "a b c d", "s1"),   // offset 0  → seq 0
      (2L, "e f g h", "s1"),   // offset 4  → seq 0
      (3L, "i j k", "s1"),     // offset 8  → seq 0 (straddles into window 1)
      (4L, "l m", "s1"),       // offset 11 → seq 1
      (5L, "x y z", "s2"))     // other shard: offset 0 → seq 0
      .toDF("doc_id", "text", "source")
    val out = Corpus.packSequences(d, "source", "doc_id", windowTokens = 10L)
      .select("doc_id", "n_tokens", "seq_id")
      .as[(Long, Long, Long)].collect().toSeq.sortBy(_._1)
    assert(out == Seq((1L, 4L, 0L), (2L, 4L, 0L), (3L, 3L, 0L), (4L, 2L, 1L), (5L, 3L, 0L)))
  }

  test("clusterPairs: chains, triangles, and singleton pairs get min-id clusters") {
    import spark.implicits._
    // components: {1,2,3,4,5} as a chain (diameter 4 → several rounds),
    // {10,11,12} as a triangle, {20,21} as one pair
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L),
      (10L, 11L), (11L, 12L), (10L, 12L), (20L, 21L)).toDF("i", "j")
    val out = Corpus.clusterPairs(pairs)
      .as[(Long, Long)].collect().toMap
    assert(out == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 20L -> 20L, 21L -> 20L))
  }

  test("clusterPairs distributed loop matches the driver union-find path") {
    import spark.implicits._
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L),
      (10L, 11L), (11L, 12L), (10L, 12L), (20L, 21L)).toDF("i", "j")
    val dist = Corpus.clusterPairs(pairs, driverMaxEdges = 0L)
      .as[(Long, Long)].collect().toMap
    val drv = Corpus.clusterPairs(pairs)
      .as[(Long, Long)].collect().toMap
    assert(dist == drv)
    assert(dist(5L) == 1L) // the 4-hop chain end reached the component min
  }

  test("chunkDedup flags later occurrences of a repeated token window") {
    val d = Seq(
      (1L, (1 to 25).map(i => s"w$i").mkString(" "), "s"), // chunks: w1..w20, w21..w25
      (2L, (1 to 20).map(i => s"w$i").mkString(" "), "s"), // duplicate of doc 1's chunk 0
      (3L, "totally different words here", "s"),
      (4L, "", "s")) // empty: excluded entirely
      .toDF("doc_id", "text", "source")
    val out = Corpus.chunkDedup(d, 20)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out(1L) == ((2L, 0L))) // first seen: nothing duplicate
    assert(out(2L) == ((1L, 1L))) // its only chunk was seen in doc 1
    assert(out(3L) == ((1L, 0L)))
    assert(!out.contains(4L))
  }

  test("chunkDedup first-occurrence order is (doc id, position), not arrival") {
    // the duplicate chunk appears at doc 5 pos 1 and doc 6 pos 0: doc 5 wins
    val rep = (1 to 20).map(i => s"r$i").mkString(" ")
    val d = Seq(
      (6L, rep, "s"),
      (5L, (1 to 20).map(i => s"q$i").mkString(" ") + " " + rep, "s"))
      .toDF("doc_id", "text", "source")
    val out = Corpus.chunkDedup(d, 20).as[(Long, Long, Long)]
      .collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out(5L) == ((2L, 0L)) && out(6L) == ((1L, 1L)))
  }

  test("chunkDedup with stride<window catches a cross-boundary duplicated span") {
    // S = 30 shared tokens; doc 1 has S at offset 0, doc 2 at offset 10 —
    // offsets agree mod 10 but NOT mod 20, so the disjoint pass misses the
    // duplication and the stride-10 sliding pass catches it
    val span = (1 to 30).map(i => s"s$i").mkString(" ")
    val padA = (1 to 10).map(i => s"a$i").mkString(" ")
    val padB = (1 to 10).map(i => s"b$i").mkString(" ")
    val d = Seq(
      (1L, span + " " + padA, "s"),
      (2L, padB + " " + span, "s")).toDF("doc_id", "text", "source")
    val disjoint = Corpus.chunkDedup(d, 20)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> r._3).toMap
    assert(disjoint(1L) == 0L && disjoint(2L) == 0L) // phase mismatch: blind
    val sliding = Corpus.chunkDedup(d, 20, stride = 10)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> r._3).toMap
    assert(sliding(2L) >= 1L, sliding) // doc 2's window at start 10 == doc 1's at 0
    assert(sliding(1L) == 0L)
    // stride = window reproduces the disjoint chunk count exactly
    val a = Corpus.chunkDedup(d, 20).as[(Long, Long, Long)].collect().toSet
    val b = Corpus.chunkDedup(d, 20, stride = 20).as[(Long, Long, Long)].collect().toSet
    assert(a == b)
  }

  test("splitAssign is a total, deterministic assignment honoring the fences") {
    val d = docs((0 until 300).map(i => (i.toLong, s"doc $i", "en")): _*)
    val out = d.withColumn("split",
      Corpus.splitAssign(Seq("train" -> 900L, "val" -> 950L, "test" -> 1000L)))
    val counts = out.groupBy("split").count().as[(String, Long)].collect().toMap
    assert(counts.values.sum == 300L)
    assert(counts("train") > counts.getOrElse("val", 0L))
    // deterministic under re-partitioning
    val again = d.repartition(7).withColumn("split",
      Corpus.splitAssign(Seq("train" -> 900L, "val" -> 950L, "test" -> 1000L)))
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    val first = out.select("doc_id", "split").as[(Long, String)].collect().toMap
    assert(again == first)
  }

  test("quotaPerStratum caps each stratum at k with a stable choice") {
    val d = (0 until 50).map(i => (i.toLong, s"doc $i", s"src${i % 3}"))
      .toDF("doc_id", "text", "source")
    val out = Corpus.quotaPerStratum(d, "source", 5)
    val bySrc = out.groupBy("source").count().as[(String, Long)].collect().toMap
    assert(bySrc.values.forall(_ == 5L))
    val a = out.select("doc_id").as[Long].collect().toSeq.sorted
    val b = Corpus.quotaPerStratum(d.repartition(9), "source", 5)
      .select("doc_id").as[Long].collect().toSeq.sorted
    assert(a == b)
  }

  test("quotaPerStratum: bounded heap equals a driver rank replay, ranks intact") {
    // the r19 rewrite (min_k_by heap + join-back, no stratum-wide window
    // sort) must elect the EXACT same docs with the same ranks
    val d = (0 until 200).map(i => (i.toLong, s"doc $i", s"src${i % 4}"))
      .toDF("doc_id", "text", "source")
    val out = Corpus.quotaPerStratum(d, "source", 7)
      .select("doc_id", "source", "quota_rank")
      .as[(Long, String, Long)].collect().toSet
    val expected = (0 until 200).map(i => (i.toLong, s"src${i % 4}"))
      .groupBy(_._2).flatMap { case (src, ms) =>
        ms.map(_._1).sortBy(id => (TextOps.hash60Str(s"$id:quota"), id))
          .take(7).zipWithIndex.map { case (id, r) => (id, src, r + 1L) }
      }.toSet
    assert(out == expected)
  }

  test("min_k_by ranks by EXACT long keys — low bits that a double would lose") {
    // two keys differing only below 2^53: a double-scored heap would tie
    // and could elect the wrong row; the long-keyed heap must not
    val base = (1L << 59) + 12345L
    val d = Seq((base + 1, 10L), (base, 20L), (base + 1, 5L))
      .toDF("k", "id")
    val out = d.agg(TextOps.minKBy(col("k"), col("id"), 2).as("mk"))
      .select(explode(col("mk")).as("e")).select("e.key", "e.id")
      .as[(Long, Long)].collect().toSeq
    assert(out == Seq((base, 20L), (base + 1, 5L)), out.toString)
  }

  test("tokenBudget keeps the hash-order prefix whose running total fits") {
    val d = (0 until 30).map(i => (i.toLong, ("t " * 10).trim, s"src${i % 2}"))
      .toDF("doc_id", "text", "source")
    // 10 tokens per doc, budget 35 ⇒ exactly 3 docs per source survive
    val out = Corpus.tokenBudget(d, "source", 35L)
    val bySrc = out.groupBy("source").count().as[(String, Long)].collect().toMap
    assert(bySrc.values.forall(_ == 3L), bySrc.toString)
    assert(out.agg(max(col("cum_tokens"))).as[Long].collect()(0) == 30L)
    // stable under re-partitioning
    val a = out.select("doc_id").as[Long].collect().toSeq.sorted
    val b = Corpus.tokenBudget(d.repartition(5), "source", 35L)
      .select("doc_id").as[Long].collect().toSeq.sorted
    assert(a == b)
  }

  test("tfidf: corpus-wide terms score 0, rare terms score ln(N/df) per count") {
    val d = docs(
      (1L, "shared shared rare1", "en"),
      (2L, "shared rare2 rare2", "en"),
      (3L, "shared other words", "en"))
    val out = Corpus.tfidf(d, 3)
      .select("doc_id", "token", "tfidf").as[(Long, String, Double)].collect()
    val m = out.map(r => (r._1, r._2) -> r._3).toMap
    assert(m((1L, "shared")) == 0.0) // df = N ⇒ idf = 0
    assert(math.abs(m((1L, "rare1")) - math.log(3.0)) < 1e-3)
    assert(math.abs(m((2L, "rare2")) - 2 * math.log(3.0)) < 1e-3)
  }

  test("tokenEntropy: uniform tokens give ln(k), single token gives 0") {
    val d = docs(
      (1L, "a b c d", "en"),      // 4 distinct ⇒ ln 4
      (2L, "x x x x x", "en"),    // one token ⇒ 0
      (3L, "y y z z", "en"))      // two even ⇒ ln 2
    val m = Corpus.tokenEntropy(d).as[(Long, Long, Double)]
      .collect().map(r => r._1 -> r._3).toMap
    assert(math.abs(m(1L) - math.log(4.0)) < 1e-3)
    assert(m(2L) == 0.0)
    assert(math.abs(m(3L) - math.log(2.0)) < 1e-3)
  }

  test("chunkDedup equals a driver-side brute-force reference on seeded random corpora") {
    val rnd = new scala.util.Random(99)
    (1 to 3).foreach { _ =>
      val w = 5
      val vocab = Vector("aa", "bb", "cc") // tiny vocab → real chunk collisions
      val rows = (1 to 40).map { i =>
        (i.toLong, Seq.fill(rnd.nextInt(14))(vocab(rnd.nextInt(vocab.size))).mkString(" "), "s")
      }
      // brute force: enumerate chunks in (doc, pos) order, count later occurrences
      val seen = scala.collection.mutable.HashSet.empty[String]
      val expect = rows.sortBy(_._1).flatMap { case (id, text, _) =>
        val toks = text.trim.split("\\s+").toSeq.filter(_.nonEmpty)
        if (toks.isEmpty) None else {
          val chunks = toks.grouped(w).map(_.mkString(" ")).toSeq
          val dups = chunks.count(c => !seen.add(c))
          Some(id -> ((chunks.size.toLong, dups.toLong)))
        }
      }.toMap
      val got = Corpus.chunkDedup(rows.toDF("doc_id", "text", "source"), w)
        .as[(Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
      assert(got == expect)
    }
  }

  test("ragChunk: exact windows vs a driver reference; stable ids; short docs emit one chunk") {
    val rnd = new scala.util.Random(42)
    val (w, st) = (6, 4)
    val rows = (1 to 30).map { i =>
      (i.toLong, Seq.fill(1 + rnd.nextInt(20))(s"t${rnd.nextInt(9)}").mkString(" "), "s")
    }
    val expect = rows.flatMap { case (id, text, _) =>
      val toks = text.trim.split("\\s+").toVector
      val last = math.max(0L, math.ceil((toks.size - w) / st.toDouble).toLong)
      (0L to last).map { i =>
        val s0 = (i * st).toInt
        (id, i, TextOps.hash60Str(s"$id:$i:rag"),
          toks.slice(s0, s0 + w).mkString(" "),
          math.min(w.toLong, toks.size - s0))
      }
    }.toSet
    val got = Corpus.ragChunk(rows.toDF("doc_id", "text", "source"), w, st)
      .as[(Long, Long, Long, String, Long)].collect().toSet
    assert(got == expect)
    // a doc shorter than one window still emits exactly its whole text
    val one = Corpus.ragChunk(docs((9L, "a b", "en")), w, st)
      .as[(Long, Long, Long, String, Long)].collect().toSeq
    assert(one == Seq((9L, 0L, TextOps.hash60Str("9:0:rag"), "a b", 2L)))
    // narrow plan: no exchange anywhere
    val plan = Corpus.ragChunk(rows.toDF("doc_id", "text", "source"), w, st)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }

  test("tokenBudget is prefix-monotone: a larger budget only ever ADDS docs") {
    val rnd = new scala.util.Random(5)
    val d = (0 until 80).map(i =>
      (i.toLong, Seq.fill(1 + rnd.nextInt(9))("t").mkString(" "), s"src${i % 3}"))
      .toDF("doc_id", "text", "source")
    val small = Corpus.tokenBudget(d, "source", 40L)
      .select("doc_id").as[Long].collect().toSet
    val big = Corpus.tokenBudget(d, "source", 120L)
      .select("doc_id").as[Long].collect().toSet
    assert(small.subsetOf(big))
    assert(big.size > small.size)
  }

  test("clusterPairs: distributed and driver paths agree on seeded random graphs") {
    import spark.implicits._
    val rnd = new scala.util.Random(42) // seeded: reproducible
    (1 to 3).foreach { _ =>
      val n = 40
      val pairs = (1 to 60).map { _ =>
        val a = rnd.nextInt(n).toLong; val b = rnd.nextInt(n).toLong
        if (a < b) (a, b) else (b, a + 1)
      }.filter(p => p._1 != p._2).toDF("i", "j")
      val dist = Corpus.clusterPairs(pairs, driverMaxEdges = 0L)
        .as[(Long, Long)].collect().toMap
      val drv = Corpus.clusterPairs(pairs).as[(Long, Long)].collect().toMap
      assert(dist == drv)
      // labels are component minima: every label is ≤ its node and is its own label
      assert(dist.forall { case (node, lab) => lab <= node && dist(lab) == lab })
    }
  }

  test("clusterPairs over strings: driver fast path == distributed, UTF-8 (code-point) minima") {
    import spark.implicits._
    // U+1F600 (😀, surrogate pair) vs U+FFFD: java.lang.String.compareTo
    // ranks the surrogate LOWER (UTF-16), but Spark/DuckDB min rank it
    // HIGHER (code-point order) — the cluster root must be U+FFFD
    val pairs = Seq(
      ("alpha", "beta"), ("beta", "gamma"),     // chain → root "alpha"
      ("😀", "�"),               // supplementary tie-break
      ("zeta", "zeta2")).toDF("i", "j").persist()
    val drv = Corpus.clusterPairs(pairs).as[(String, String)].collect().toMap
    val dist = Corpus.clusterPairs(pairs, driverMaxEdges = 0L)
      .as[(String, String)].collect().toMap
    assert(drv == dist)
    assert(drv("gamma") == "alpha" && drv("beta") == "alpha")
    assert(drv("😀") == "�" && drv("�") == "�",
      "cluster root must follow code-point order, not UTF-16")
    assert(java.lang.String.CASE_INSENSITIVE_ORDER != null &&
      "😀".compareTo("�") < 0, // the trap this test pins
      "fixture no longer exercises the UTF-16 divergence")
  }
}
