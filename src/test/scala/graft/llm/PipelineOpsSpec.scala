package graft.llm

import org.apache.spark.sql.functions._
import graft.SparkSuite

/** Planted-fixture specs for the round-10 pipeline operators: corpus-version
  * diff, epoch-weighted oversampling, multimodal blockhash near-dup. Each
  * runs the registry fn against a synthetic documents table with known
  * structure, so the assertions are independent of the driver corpus. */
class PipelineOpsSpec extends SparkSuite {
  import spark.implicits._

  private def docsDir(rows: Seq[(Long, String, String)]): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_pops_").toString
    rows.map { case (id, text, src) => (id, text, "en", src, text.length) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("corpus_diff statuses: added/removed/changed/unchanged land exactly by construction") {
    // ids picked to hit each arm: 9→added (absent v1), 3→removed (absent
    // v2, 3%13==3), 7→changed (revised in v2), 1→unchanged
    val d = docsDir(Seq(
      (1L, "steady text", "s0"), (3L, "dropped in v2", "s0"),
      (7L, "gets revised", "s0"), (9L, "new in v2", "s0"),
      (0L, "also revised (0%7==0)", "s0")))
    val got = graft.queries.Registry.all("llm_corpus_diff").fn(spark, d)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "unchanged", 3L -> "removed", 7L -> "changed",
      9L -> "added", 0L -> "changed"))
  }

  test("oversample: per-source base epochs agree across docs; copies ∈ [base, base+1]; deterministic") {
    val d = docsDir((0L until 40L).map(i => (i, s"doc $i", s"s${i % 3}")))
    val out = graft.queries.Registry.all("llm_oversample").fn(spark, d)
    val perDoc = out.groupBy("doc_id", "source").agg(count(lit(1)).as("n"),
        countDistinct("copy").as("nd"), min("copy").as("mn"), max("copy").as("mx"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    // copies form a dense 0..n-1 range per doc
    perDoc.foreach { case (id, _, n, nd, mn, mx) =>
      assert(n == nd && mn == 0L && mx == n - 1, s"doc $id copies not dense: $n/$nd/$mn/$mx")
      assert(n >= 1 && n <= 4, s"doc $id has $n copies (epochs are 1..3 + ≤1 frac)")
    }
    // within one source every doc's copy count differs by at most the ±1 gate
    perDoc.groupBy(_._2).foreach { case (src, ds) =>
      val ns = ds.map(_._3).toSet
      assert(ns.size <= 2 && (ns.max - ns.min) <= 1,
        s"source $src spreads beyond the frac gate: $ns")
    }
    // deterministic: a second run replays the same multiset
    assertSameRows(out, graft.queries.Registry.all("llm_oversample").fn(spark, d))
  }

  test("vocab_coverage: planted OOV tokens produce the exact per-source rate") {
    // w0..w15 fill the top-16 exactly (freq ≥ 8 each); s1's unique tokens
    // (freq 1) can never make the cut, so half of s1's running tokens are OOV
    val common = (0 until 16).map(i => s"w$i").mkString(" ")
    val d = docsDir(
      (0L until 8L).map(i => (i, common, "s0")) ++
      (8L until 12L).map(i => (i, s"w0 u${i}a w0 u${i}b", "s1")))
    val got = graft.queries.Registry.all("llm_vocab_coverage").fn(spark, d)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(got("s0") == ((128L, 0L, 1.0)), s"s0: ${got("s0")}")
    assert(got("s1") == ((16L, 8L, 0.5)), s"s1: ${got("s1")}")
  }

  test("skew join: result is salt-invariant (two runs with different random salts agree)") {
    val fn = graft.queries.Registry.all("q_skew_join").fn
    val d = "/root/testdata/sf0.001"
    assume(new java.io.File(s"$d/events.parquet").exists())
    assertSameRows(fn(spark, d), fn(spark, d))
  }

  test("substr_dedup: planted 8-token runs produce exact span counts and coverage") {
    def toks(pfx: String, n: Int): String = (1 to n).map(i => s"$pfx$i").mkString(" ")
    val w8 = toks("w", 8); val y8 = toks("y", 8); val x8 = toks("x", 8)
    val d = docsDir(Seq(
      (1L, toks("a", 20), "s0"),                    // clean: no dup
      (2L, s"$w8 ${toks("u", 12)}", "s0"),          // w-run at pos 1
      (3L, s"v1 v2 $w8 ${toks("v", 8).replace("v1", "vv1").replace("v2", "vv2")}", "s0"), // w-run at pos 3
      (4L, s"$x8 $x8", "s0"),                       // self-repeat: contiguous cover
      (5L, "s1 s2 s3", "s0"),                       // under K tokens: no grams
      (6L, s"$w8 z1 z2 z3 z4 $y8", "s0"),           // two separated spans
      (7L, s"$y8 ${toks("q", 12)}", "s0")))         // y-run at pos 1
    val got = graft.queries.Registry.all("llm_substr_dedup").fn(spark, d)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got(1L) == ((20L, 0L, 0L)), s"clean doc: ${got(1L)}")
    assert(got(2L) == ((20L, 8L, 1L)), s"prefix run: ${got(2L)}")
    assert(got(3L)._2 == 8L && got(3L)._3 == 1L, s"mid run: ${got(3L)}")
    assert(got(4L) == ((16L, 16L, 1L)), s"self-repeat: ${got(4L)}")
    assert(got(5L) == ((3L, 0L, 0L)), s"short doc: ${got(5L)}")
    assert(got(6L) == ((20L, 16L, 2L)), s"two spans: ${got(6L)}")
    assert(got(7L) == ((20L, 8L, 1L)), s"y run: ${got(7L)}")
  }

  test("substr_clean: planted runs vanish, unique tokens survive in order, full-dup doc empties") {
    def toks(pfx: String, n: Int): String = (1 to n).map(i => s"$pfx$i").mkString(" ")
    val w8 = toks("w", 8)
    val d = docsDir(Seq(
      (1L, toks("a", 20), "s0"),             // untouched
      (2L, s"$w8 ${toks("u", 12)}", "s0"),   // prefix run removed
      (3L, s"$w8 ${toks("r", 4)} $w8", "s0"), // both w-runs removed, middle kept
      (4L, w8, "s0"),                        // 8 tokens, entirely duplicated → empty
      (5L, w8, "s1")))                       // its duplicate, also empty
    val got = graft.queries.Registry.all("llm_substr_clean").fn(spark, d)
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    assert(got(1L) == ((toks("a", 20), 20L)))
    assert(got(2L) == ((toks("u", 12), 12L)))
    assert(got(3L) == ((toks("r", 4), 4L)))
    assert(got(4L) == (("", 0L)))
    assert(got(5L) == (("", 0L)))
  }

  test("pca_project: rank-1 corpus scores order by the planted coefficient (up to global sign)") {
    // x_i = a_i * u + tiny per-dim jitter; the dominant variance direction
    // is u, so pc1 scores must be monotone in a_i (modulo one global sign)
    val u = Array.tabulate(64)(j => math.sin(j + 1.0).toFloat)
    val as = (0 until 30).map(i => (i - 15) * 0.3)
    val dir = java.nio.file.Files.createTempDirectory("graft_pca_").toString
    as.zipWithIndex.map { case (a, i) =>
      (i.toLong, u.zipWithIndex.map { case (uj, j) =>
        (a * uj + 0.001 * ((i * 7 + j) % 5 - 2)).toFloat }.toSeq)
    }.toDF("vec_id", "embedding")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val got = graft.queries.Registry.all("llm_pca_project").fn(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val scores = as.indices.map(i => got(i.toLong))
    val diffs = scores.sliding(2).map(p => p(1) - p(0)).toSeq
    assert(diffs.forall(_ > 0) || diffs.forall(_ < 0),
      s"pc1 not monotone in the planted coefficient: $scores")
    // determinism: a second run is bit-identical
    val again = graft.queries.Registry.all("llm_pca_project").fn(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(again == got)
  }

  test("knnJoinIvf (shuffled join + bounded heap) equals the broadcast probe form") {
    import graft.llm.Similarity
    val emb = (0L until 40L).map(i =>
        (i, (0 until 8).map(j => (((i * 31 + j * 7) % 13) - 6).toFloat / 6f)))
      .toDF("vec_id", "embedding")
    val cents = emb.filter(col("vec_id") < 4)
    val joined = Similarity.knnJoinIvf(emb, emb, cents, k = 3, nprobe = 2)
    val probed = Similarity.ivfTopK(emb, emb, cents, k = 3, nprobe = 2)
      .withColumn("rank", col("rank").cast("long"))
    assertSameRows(joined, probed)
  }

  test("prefix_join: exact — finds the hot-shingle pair the capped index drops; equals brute force") {
    // 120 filler docs make every shingle of the hot phrase df>100, so the
    // DF-capped ngram index DROPS them; docs 1000/1001 consist of ONLY the
    // hot phrase, so the capped path has no index rows for them and misses
    // the J=1 pair. Prefix filtering is lossless: it must find it. 2000/2001
    // are an ordinary near-dup pair both paths find.
    val hot = "alpha beta gamma delta epsilon"
    val fixture =
      (0L until 120L).map(i => (i, s"$hot p${i}a p${i}b p${i}c p${i}d p${i}e", "s0")) ++
      Seq((1000L, hot, "s0"), (1001L, hot, "s0"),
          (2000L, "one two three four five six seven eight", "s0"),
          (2001L, "one two three four five six seven nine", "s0"))
    val d = docsDir(fixture)

    def shingleSet(text: String): Set[String] = {
      val tk = text.trim.split("\\s+").toSeq
      if (tk.size >= 3) tk.sliding(3).map(_.mkString(" ")).toSet
      else Set(tk.mkString(" "))
    }
    val brute = (for {
      a <- fixture; b <- fixture if a._1 < b._1
      sa = shingleSet(a._2); sb = shingleSet(b._2)
      inter = (sa & sb).size
      j = math.floor(inter.toDouble / (sa.size + sb.size - inter) * 1000 + 0.5) / 1000
      if j >= 0.5
    } yield (a._1, b._1, j)).toSet

    val got = graft.queries.Registry.all("llm_prefix_join").fn(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got == brute, s"prefix_join != brute force:\n got=$got\n exp=$brute")
    assert(got.contains((1000L, 1001L, 1.0)), "hot-shingle exact-dup pair missed")

    val capped = graft.queries.Registry.all("llm_ngram_jaccard").fn(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(!capped.contains((1000L, 1001L)),
      "fixture no longer exercises the cap: the capped path found the hot pair")
    assert(capped.contains((2000L, 2001L)), "ordinary near-dup pair missed by capped path")
  }

  test("sq8: planted vectors land on exact grid codes; constant dims code 0 with zero error") {
    val dir = java.nio.file.Files.createTempDirectory("graft_sq8_").toString
    Seq(
      (0L, Seq(0.0f, -1.0f, 5.0f)),
      (1L, Seq(2.0f, 1.0f, 5.0f)),
      (2L, Seq(1.0f, 0.0f, 5.0f)))
      .toDF("vec_id", "embedding")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val got = graft.queries.Registry.all("llm_sq8_encode").fn(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getDouble(3))).toMap
    // dim0 ∈ [0,2], dim1 ∈ [-1,1]: endpoints code 0/255 exactly, midpoint
    // floor(127.5+0.5)=128 with error |128/255·span − half-span|
    val midErr = math.floor(math.abs(128.0 / 255.0 * 2 - 1) * 1e6 + 0.5) / 1e6
    assert(got((0L, 0L)) == ((0L, 0.0)) && got((1L, 0L)) == ((255L, 0.0)))
    assert(got((0L, 1L)) == ((0L, 0.0)) && got((1L, 1L)) == ((255L, 0.0)))
    assert(got((2L, 0L)) == ((128L, midErr)) && got((2L, 1L)) == ((128L, midErr)))
    // constant dim: degenerate span → code 0, perfect reconstruction
    assert(Seq(0L, 1L, 2L).forall(v => got((v, 2L)) == ((0L, 0.0))))
  }

  test("mm_dedup: re-encoded near-identical payloads pair; unrelated payloads don't") {
    // two payloads differing by one byte (Hamming-close blockhashes), one
    // structurally different payload (ascending vs flat byte mass)
    val flat = "m" * 96
    val flatTweak = "m" * 95 + "n"
    val ramp = (0 until 96).map(i => ('a' + (i * 25 / 95)).toChar).mkString
    val d = docsDir(Seq((1L, flat, "s0"), (2L, flatTweak, "s0"), (3L, ramp, "s0")))
    val pairs = graft.queries.Registry.all("mm_dedup").fn(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)), s"near-identical pair missed: $pairs")
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L),
      s"structurally different payload paired: $pairs")
  }
}
