package graft.queries

import org.apache.spark.sql.functions._
import graft.SparkSuite
import graft.llm.TextOps

/** Skewed-corpus stress: real corpora are power-law — one boilerplate
  * paragraph (license header, nav bar, disclaimer) lands in a large
  * fraction of documents. A naive inverted-index join generates
  * Σ_s C(df(s), 2) candidate rows, which the boilerplate makes quadratic
  * in the clique size; the engine's two defenses must keep candidate
  * generation sub-quadratic:
  *  - the DF-CAP (llm_ngram_jaccard / llm_containment): shingles hotter
  *    than DfCap drop from the index before any join;
  *  - the df-ASC PREFIX (llm_prefix_join, exact): boilerplate shingles
  *    sort to the END of each doc's df-ordered list, so the indexed
  *    prefix holds only the doc's rarest shingles and hot shingles are
  *    never indexed — losslessly, since a qualifying pair must share a
  *    prefix shingle.
  * The planted corpus: 300 docs carrying a 21-token boilerplate paragraph
  * plus unique tails (pairwise Jaccard ≪ τ — NOT near-dups, so any pair
  * work on them is pure waste), 1200 fully unique docs. */
class SkewStressSpec extends SparkSuite {
  import spark.implicits._

  private val boiler = (1 to 21).map(i => s"boiler$i").mkString(" ")

  private lazy val corpus = {
    val hot = (0 until 300).map { i =>
      val tail = (1 to 40).map(j => s"u${i}x$j").mkString(" ")
      (i.toLong, s"$boiler $tail")
    }
    val cold = (0 until 1200).map { i =>
      (1000L + i, (1 to 40).map(j => s"c${i}y$j").mkString(" "))
    }
    (hot ++ cold).toDF("doc_id", "text")
  }

  private def shingleIndex = corpus.select(col("doc_id"),
    explode(TextOps.shingleHash60(TextOps.tokens(col("text")), 3)).as("s"))

  /** Σ_s C(df(s), 2) — the candidate-generation work an inverted-index
    * self-join performs over index `sh`. */
  private def pairWork(sh: org.apache.spark.sql.DataFrame): Long =
    sh.groupBy("s").agg(count(lit(1)).as("df"))
      .agg(sum(expr("df * (df - 1) div 2"))).first().getLong(0)

  test("df-cap drops boilerplate shingles: candidate work collapses vs the naive index") {
    val naive = pairWork(shingleIndex)
    val capped = LlmOps.cappedShingleIndex(corpus)
    val cappedWork = pairWork(capped)
    capped.unpersist()
    info(s"candidate work: naive=$naive capped=$cappedWork " +
      f"(ratio ${naive.toDouble / math.max(1, cappedWork)}%.0f x)")
    // 19 boilerplate shingles x C(300,2) ≈ 852k naive candidates from the
    // hot clique alone; the cap must remove ALL of them (df=300 > DfCap=100)
    assert(naive > 800000L, s"test corpus lost its skew: naive=$naive")
    assert(cappedWork < naive / 100,
      s"df-cap failed to collapse candidate work: $cappedWork vs $naive")
  }

  test("df-ASC prefix join never indexes hot shingles: candidates stay sub-quadratic and exact") {
    val sh = shingleIndex.persist()
    val (cands, pref) = LlmOps.prefixCandidates(sh)
    val nCands = cands.count()
    // hot shingles must not appear in any doc's indexed prefix
    val boilerHashes = TextOps.shingleHash60(TextOps.tokens(lit(boiler)), 3)
    val hotInPrefix = pref.join(
      spark.range(1).select(explode(boilerHashes).as("s")), "s").count()
    info(s"prefix candidates=$nCands hotShinglesIndexed=$hotInPrefix")
    assert(hotInPrefix == 0L, "boilerplate shingles leaked into the prefix index")
    // sub-quadratic: nothing shares rare shingles here, so candidates are
    // ~0; allow a linear slack rather than the ~45k a quadratic clique gives
    assert(nCands < 1500L, s"prefix candidates exploded: $nCands")
    // and losslessness is not at stake: the corpus has no qualifying pairs,
    // and the full exact join agrees
    assert(LlmOps.prefixJoinPairs(corpus).count() == 0L)
    pref.unpersist(); sh.unpersist()
  }

  test("video band cap: a hot frame-fingerprint clique generates ZERO candidates") {
    // 150 videos of identical content (every frame hashes to the same 48
    // bits — the video analogue of the boilerplate clique: an intro card,
    // a station ident) would naively generate C(150,2) x 4 frames x 4
    // bands candidate rows; with df=150 > the 100-key band cap every band
    // bucket is dropped before the self-join
    def fleet(n: Int, hash: Long, base: Long) =
      (0 until n).flatMap(i => (0 until 4).map(f =>
        (base + i, f.toLong, hash)))
    val hot = fleet(150, 0x0000123456789L, 0L)
    // plus a small genuine near-dup group under the cap: 3 videos whose
    // frame hashes flip one distinct low bit each (pairwise Hamming 2 <= 6
    // on every frame; bands 1-3 stay identical, so candidates surface)
    val near = (0 until 3).flatMap(i => (0 until 4).map(f =>
      (9000L + i, f.toLong, 0x7770000000000L ^ (1L << i))))
    val fh = (hot ++ near).toDF("doc_id", "frame_idx", "fhash")
    val out = LlmOps.videoDedupFromFrameHashes(fh)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // the clique contributes nothing; the under-cap trio pairs fully with
    // all 4 frames agreeing
    assert(out.forall(_._1 >= 9000L), s"hot-clique pair leaked: ${out.take(3).toSeq}")
    assert(out.toSet == Set((9000L, 9001L, 4L), (9000L, 9002L, 4L),
      (9001L, 9002L, 4L)), s"unexpected pairs: ${out.toSeq}")
  }

  test("audio band cap: a hot audio-fingerprint clique generates ZERO candidates") {
    // 150 identical 49-bit audio fingerprints (re-encodes of one jingle —
    // the audio boilerplate clique) would naively generate C(150,2) x 7
    // bands candidate rows; with df=150 > the 100-doc band cap every band
    // bucket of the clique drops before the self-join. The 7-bit band keys
    // make this cap load-bearing: only 128 keys exist per band, so at
    // corpus scale EVERY bucket of a naive join is quadratic.
    val hot = (0 until 150).map(i => (i.toLong, 0x1A2B3C4D5E6FL))
    // plus a genuine near-dup trio under the cap: one distinct low bit
    // flipped each (pairwise Hamming 2 <= 10; bands 1-6 stay identical)
    val near = (0 until 3).map(i => (9000L + i, 0x0F0F0F0F0F0F0L ^ (1L << i)))
    val out = LlmOps.audioFpDedupFromFps((hot ++ near).toDF("doc_id", "fp"))
      .filter(col("kind") === "pair")
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.forall(_._1 >= 9000L), s"hot-clique pair leaked: ${out.take(3).toSeq}")
    assert(out.toSet == Set((9000L, 9001L, 2L), (9000L, 9002L, 2L),
      (9001L, 9002L, 2L)), s"unexpected pairs: ${out.toSeq}")
  }
}
