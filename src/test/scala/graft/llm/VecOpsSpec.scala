package graft.llm

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.SparkSuite

/** Native vector kernels ([[graft.functions.CosineSim]] /
  * [[graft.functions.LshBucket]]) must be BIT-identical to the interpreted
  * higher-order forms they replace — the DuckDB oracles reproduce the folded
  * arithmetic, so any accumulation-order drift would break hash-compares. */
class VecOpsSpec extends SparkSuite {

  // deterministic pseudo-random float vectors (no Random: reproducible)
  private def vec(seed: Int, dim: Int): Seq[Float] =
    Seq.tabulate(dim)(k => (((seed * 1103515245 + k * 12345) % 1000) / 250.0f) - 2.0f)

  private def floatDf(rows: Seq[(Seq[Float], Seq[Float])]) =
    df("a ARRAY<FLOAT>, b ARRAY<FLOAT>", rows.map(r => Row(r._1, r._2)))

  test("CosineSim is bit-identical to the aggregate/zip_with fold (float)") {
    val d = floatDf(Seq.tabulate(8)(i => (vec(i, 64), vec(i + 100, 64))))
    val native = d.select(Similarity.cosine(col("a"), col("b"))).collect().toSeq.map(_.getDouble(0))
    val folded = d.select(Similarity.cosineFolded(col("a"), col("b"))).collect().toSeq.map(_.getDouble(0))
    // exact double equality — same accumulation order, same result bits
    assert(native == folded)
  }

  test("CosineSim is bit-identical to the fold on double arrays") {
    val d = df("a ARRAY<DOUBLE>, b ARRAY<DOUBLE>", Seq(
      Row(Seq(0.3, -1.7, 2.44), Seq(1.1, 0.05, -3.2)),
      Row(Seq(1e-8, 2e8, -5.5), Seq(-1e-8, 2e-8, 5.5))))
    val native = d.select(Similarity.cosine(col("a"), col("b"))).collect().toSeq.map(_.getDouble(0))
    val folded = d.select(Similarity.cosineFolded(col("a"), col("b"))).collect().toSeq.map(_.getDouble(0))
    assert(native == folded)
  }

  test("CosineSim nulls: mismatched lengths / null element / null array") {
    val d = df("a ARRAY<DOUBLE>, b ARRAY<DOUBLE>", Seq(
      Row(Seq(1.0, 2.0), Seq(1.0, 2.0, 3.0)),      // length mismatch
      Row(Seq[Any](1.0, null), Seq[Any](1.0, 2.0)), // null element
      Row(null, Seq(1.0))))                         // null array
    val r = d.select(Similarity.cosine(col("a"), col("b"))).collect().toSeq
    assert(r.forall(_.isNullAt(0)))
    // the folded form agrees on every null case
    val f = d.select(Similarity.cosineFolded(col("a"), col("b"))).collect().toSeq
    assert(f.forall(_.isNullAt(0)))
  }

  test("CosineSim interpreted eval matches the codegen path") {
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.expressions.BoundReference
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import org.apache.spark.sql.types._
    val at = ArrayType(DoubleType)
    val e = graft.functions.CosineSim(
      BoundReference(0, at, true), BoundReference(1, at, true))
    val interp = e.eval(InternalRow(
      new GenericArrayData(Array[Any](0.3, -1.7, 2.44)),
      new GenericArrayData(Array[Any](1.1, 0.05, -3.2)))).asInstanceOf[Double]
    val gen = df("a ARRAY<DOUBLE>, b ARRAY<DOUBLE>",
      Seq(Row(Seq(0.3, -1.7, 2.44), Seq(1.1, 0.05, -3.2))))
      .select(Similarity.cosine(col("a"), col("b"))).collect()(0).getDouble(0)
    assert(interp == gen)
  }

  test("LshBucket is bit-identical to the per-plane folded form") {
    val planes = Similarity.planes(10, 64)
    val d = df("a ARRAY<FLOAT>", Seq.tabulate(16)(i => Row(vec(i * 7 + 1, 64))))
    val native = d.select(Similarity.lshBucket(col("a"), planes)).collect().toSeq.map(_.getLong(0))
    val folded = d.select(Similarity.lshBucketFolded(col("a"), planes)).collect().toSeq.map(_.getLong(0))
    assert(native == folded)
    // buckets actually spread (not all rows in one bucket)
    assert(native.distinct.length > 1)
  }

  test("LshBucket degenerate inputs bucket to 0, matching the fold") {
    val planes = Similarity.planes(4, 3)
    val d = df("a ARRAY<DOUBLE>", Seq(
      Row(Seq(1.0, 2.0)),           // wrong dimension
      Row(Seq[Any](1.0, null, 2.0)) // null element
    ))
    val native = d.select(Similarity.lshBucket(col("a"), planes)).collect().toSeq.map(_.getLong(0))
    val folded = d.select(Similarity.lshBucketFolded(col("a"), planes)).collect().toSeq.map(_.getLong(0))
    assert(native == Seq(0L, 0L))
    assert(native == folded)
  }

  test("LshBucket interpreted eval matches codegen") {
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.expressions.BoundReference
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import org.apache.spark.sql.types._
    val planes = Similarity.planes(6, 8)
    val e = graft.functions.LshBucket(
      BoundReference(0, ArrayType(DoubleType), true), planes.map(_.toSeq).toSeq)
    val v = Seq(0.5, -1.25, 3.0, 0.125, -2.0, 1.5, -0.75, 0.25)
    val interp = e.eval(InternalRow(
      new GenericArrayData(v.toArray[Any]))).asInstanceOf[Long]
    val gen = df("a ARRAY<DOUBLE>", Seq(Row(v)))
      .select(Similarity.lshBucket(col("a"), planes)).collect()(0).getLong(0)
    assert(interp == gen)
  }

  test("cosine_sim and lsh_bucket are callable from SQL after registration") {
    org.apache.spark.sql.GraftExpressions.registerFunctions(spark)
    val cos = spark.sql(
      "SELECT cosine_sim(array(1.0D, 0.0D), array(1.0D, 0.0D)) AS c").collect()(0).getDouble(0)
    assert(cos == 1.0)
    val viaSql = spark.sql(
      "SELECT lsh_bucket(array(0.5D, -1.5D, 2.0D), 4, 3) AS b").collect()(0).getLong(0)
    val viaColumn = df("a ARRAY<DOUBLE>",
      Seq(org.apache.spark.sql.Row(Seq(0.5, -1.5, 2.0))))
      .select(Similarity.lshBucket(org.apache.spark.sql.functions.col("a"),
        Similarity.planes(4, 3))).collect()(0).getLong(0)
    assert(viaSql == viaColumn)
  }

  test("SimHash32 is bit-identical to the 32-fold form, incl. negatives and nulls") {
    val rows = Seq(
      Row(Seq(5L, 11L, 1023L, 7L)),
      Row(Seq(-3L, 8L, -1L)),          // negative hashes: % 2 semantics, not & 1
      Row(Seq[Any](5L, null, 11L)),    // null element votes -1 on every bit
      Row(Seq[Any]()),                 // empty → all votes 0 → hash 0
      Row(null))                       // null array → 0, not null
    val d = df("hs ARRAY<BIGINT>", rows)
    val native = d.select(TextOps.simhash32FromHashes(col("hs"))).collect().toSeq
    val folded = d.select(TextOps.simhash32Folded(col("hs"))).collect().toSeq
    assert(native.map(_.getLong(0)) == folded.map(_.getLong(0)))
    assert(!native.exists(_.isNullAt(0)))
  }

  test("SimHash32 interpreted eval matches codegen") {
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.expressions.BoundReference
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import org.apache.spark.sql.types._
    val e = graft.functions.SimHash32(
      BoundReference(0, ArrayType(LongType), true))
    val interp = e.eval(InternalRow(
      new GenericArrayData(Array[Any](5L, null, 11L)))).asInstanceOf[Long]
    val gen = df("hs ARRAY<BIGINT>", Seq(Row(Seq[Any](5L, null, 11L))))
      .select(TextOps.simhash32FromHashes(col("hs"))).collect()(0).getLong(0)
    assert(interp == gen)
    assert(e.eval(InternalRow(null)) == 0L)
  }

  test("wide SimHash (60-bit): interpreted == codegen; low 32 bits == simhash32") {
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.expressions.BoundReference
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import org.apache.spark.sql.types._
    val rows = Seq(
      Row(Seq(5L, 11L, 1023L, 7L, 0x123456789ABCDEFL)),
      Row(Seq(-3L, 8L, -1L)),
      Row(Seq[Any](5L, null, 11L)))
    val d = df("hs ARRAY<BIGINT>", rows)
    val wide = d.select(TextOps.simhashFromHashes(col("hs"), 60)).collect().toSeq
      .map(_.getLong(0))
    // per-bit votes are width-independent → the 60-bit hash truncates to
    // the 32-bit one, and bit 59 stays the top bit (non-negative BIGINT)
    val narrow = d.select(TextOps.simhash32FromHashes(col("hs"))).collect().toSeq
      .map(_.getLong(0))
    assert(wide.map(_ & 0xFFFFFFFFL) == narrow)
    assert(wide.forall(h => h >= 0L && (h >> 60) == 0L))
    val e = graft.functions.SimHash32(
      BoundReference(0, ArrayType(LongType), true), bits = 60)
    val interp = e.eval(InternalRow(
      new GenericArrayData(Array[Any](5L, null, 11L)))).asInstanceOf[Long]
    assert(interp == wide(2))
  }

  test("kmeansStep: assignment picks the cosine-nearest centroid; means are exact") {
    import spark.implicits._
    // two orthogonal centroids; members are scaled copies (cosine 1 to
    // their own centroid, 0 to the other)
    val cents = Seq((0L, Seq(1f, 0f)), (1L, Seq(0f, 1f))).toDF("vec_id", "embedding")
    val corpus = Seq(
      (0L, Seq(1f, 0f)), (1L, Seq(0f, 1f)),   // the seeds themselves
      (10L, Seq(2f, 0f)), (11L, Seq(4f, 0f)), // cluster 0
      (12L, Seq(0f, 3f))                      // cluster 1
    ).toDF("vec_id", "embedding")
    val out = Similarity.kmeansStep(corpus, cents)
      .as[(Long, Long, Double, Long)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4))).toMap
    assert(out((0L, 0L)) == ((math.floor((1.0 + 2 + 4) / 3 * 1e4 + 0.5) / 1e4, 3L)))
    assert(out((0L, 1L)) == ((0.0, 3L)))
    assert(out((1L, 0L)) == ((0.0, 2L)))
    assert(out((1L, 1L)) == ((2.0, 2L))) // (1 + 3) / 2
  }

  test("kmeansIterate converges on separable blobs: members end with their own blob's centroid") {
    import spark.implicits._
    // two tight blobs on orthogonal axes + seeds both starting NEAR blob A:
    // iteration must pull one centroid over to blob B
    val corpus = (
      (0 until 10).map(i => (i.toLong, Seq(1f + i * 0.01f, 0.1f))) ++      // blob A
      (0 until 10).map(i => (100L + i, Seq(0.1f, 1f + i * 0.01f)))          // blob B
    ).toDF("vec_id", "embedding")
    val seeds = Seq((0L, Seq(1f, 0.3f)), (1L, Seq(1f, 0.5f))).toDF("vec_id", "embedding")
    val fin = Similarity.kmeansIterate(corpus, seeds, iters = 4)
      .as[(Long, Long, Double, Long)].collect()
    // each final centroid holds exactly one blob (10 members each)
    val sizes = fin.groupBy(_._1).map { case (_, rs) => rs.head._4 }.toSeq.sorted
    assert(sizes == Seq(10L, 10L), sizes.toString)
    // the blob-B centroid points along the y axis: dim1 mean >> dim0 mean
    val byCent = fin.groupBy(_._1).map { case (c, rs) =>
      c -> rs.sortBy(_._2).map(_._3).toSeq
    }
    assert(byCent.values.exists(v => v(1) > 5 * v(0))) // a y-dominant centroid exists
    assert(byCent.values.exists(v => v(0) > 5 * v(1))) // and an x-dominant one
  }

  test("kmeansIterate keeps an empty centroid at its previous position (k never shrinks)") {
    import spark.implicits._
    // duplicate seeds: every vector ties on cosine, the tie-break hands all
    // members to the lower cent_id — the other centroid must SURVIVE
    val corpus = (0 until 6).map(i => (i.toLong, Seq(1f, 0f))).toDF("vec_id", "embedding")
    val seeds = Seq((0L, Seq(1f, 0f)), (1L, Seq(1f, 0f))).toDF("vec_id", "embedding")
    val fin = Similarity.kmeansIterate(corpus, seeds, iters = 3)
      .select("cent_id").distinct().as[Long].collect().toSet
    assert(fin == Set(0L)) // only centroid 0 wins members...
    // ...but the run completes all 3 rounds without losing centroid 1 from
    // the state (no exception, deterministic result)
    intercept[IllegalArgumentException](Similarity.kmeansIterate(corpus, seeds, iters = 0))
  }

  test("L2Sq is bit-identical to the fold; nulls mirror zip_with padding") {
    val d = floatDf(Seq.tabulate(8)(i => (vec(i, 64), vec(i + 100, 64))))
    val native = d.select(Similarity.l2sq(col("a"), col("b"))).collect().toSeq.map(_.getDouble(0))
    val folded = d.select(Similarity.l2sqFolded(col("a"), col("b"))).collect().toSeq.map(_.getDouble(0))
    assert(native == folded)
    assert(native.forall(_ >= 0d))
    val n = df("a ARRAY<DOUBLE>, b ARRAY<DOUBLE>", Seq(
      Row(Seq(1.0, 2.0), Seq(1.0, 2.0, 3.0)),
      Row(Seq[Any](1.0, null), Seq[Any](1.0, 2.0)),
      Row(null, Seq(1.0))))
    assert(n.select(Similarity.l2sq(col("a"), col("b"))).collect().forall(_.isNullAt(0)))
    // identical vectors → exactly 0
    val z = floatDf(Seq((vec(3, 16), vec(3, 16))))
    assert(z.select(Similarity.l2sq(col("a"), col("b"))).collect()(0).getDouble(0) == 0d)
  }

  test("pqEncode: a codebook seed encodes to ITSELF with distance 0 in every subspace") {
    import spark.implicits._
    val rows = (0L until 12L).map(i => (i, vec(i.toInt * 7 + 1, 16)))
    val emb = rows.toDF("vec_id", "embedding")
    val cb = Similarity.pqCodebook(emb.filter(col("vec_id") < 4), m = 4, dim = 16)
    val codes = Similarity.pqEncode(emb, cb, m = 4, dim = 16)
      .as[(Long, Int, Long, Double)].collect()
    assert(codes.length == 12 * 4)
    // seeds 0..3: nearest codeword in every subspace is their own subvector
    codes.filter(_._1 < 4).foreach { case (vid, _, code, dist) =>
      assert(code == vid && dist == 0d, s"$vid -> $code ($dist)")
    }
    // non-seeds: valid code range, non-negative distances
    codes.filter(_._1 >= 4).foreach { case (_, _, code, dist) =>
      assert(code >= 0 && code < 4 && dist >= 0d)
    }
  }

  test("pqSearchADC ranks by the exact sum of per-subspace code distances") {
    import spark.implicits._
    val rows = (0L until 10L).map(i => (i, vec(i.toInt * 11 + 3, 16)))
    val emb = rows.toDF("vec_id", "embedding")
    val cbDf = Similarity.pqCodebook(emb.filter(col("vec_id") < 4), m = 4, dim = 16)
    val codes = Similarity.pqEncode(emb, cbDf, m = 4, dim = 16)
    val cbRows = cbDf.collect().map(r => (r.getInt(0), r.getLong(1),
      r.getSeq[Float](2).map(_.toDouble).toArray)).toSeq
    val q = Seq((0L, rows(0)._2.map(_.toDouble).toArray))
    val out = Similarity.pqSearchADC(q, codes, cbRows, m = 4, k = 3)
      .as[(Long, Int, Long, Double)].collect().sortBy(_._2)
    assert(out.length == 3 && out.forall(_._1 == 0L))
    // independent replay: dtab + codes -> expected ranking
    val codeMap = codes.as[(Long, Int, Long, Double)].collect()
      .groupBy(_._1).map { case (v, rs) => v -> rs.sortBy(_._2).map(_._3) }
    def q6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    val qv = rows(0)._2.map(_.toDouble)
    def sub(a: Seq[Double], s: Int) = a.slice(s * 4, s * 4 + 4)
    val cbByKey = cbRows.map(r => (r._1, r._2) -> r._3).toMap
    val exp = rows.filter(_._1 != 0L).map { case (v, _) =>
      val adist = (0 until 4).map { s0 =>
        val cv = cbByKey((s0, codeMap(v)(s0)))
        val d = sub(qv, s0).zip(cv).map { case (x, y) => (x - y) * (x - y) }.sum
        BigDecimal(q6(d)).setScale(8)
      }.sum.toDouble
      v -> q6(adist)
    }.sortBy { case (v, a) => (a, v) }.take(3)
    assert(out.map(r => (r._3, r._4)).toSeq == exp, s"${out.toSeq} vs $exp")
  }

  test("pqTrainCodebook: Lloyd rounds cut quantization error and recall@5 >= seed codebook") {
    import spark.implicits._
    val (dim, m, kCodes, n) = (16, 4, 4, 48)
    // 4 well-separated cluster centers + deterministic per-vector noise;
    // seeds are vectors 0..3 (one per cluster, but noise-offset from the
    // center) — training should pull each codeword toward the member mean
    def center(c: Int) = Seq.tabulate(dim)(k => ((c * 31 + k * 7) % 11 - 5).toFloat * 2f)
    def noise(i: Int, k: Int) = (((i * 1103515245 + k * 12345) % 100) / 200.0f)
    val rows = (0L until n.toLong).map { i =>
      val c = (i % 4).toInt
      (i, center(c).zipWithIndex.map { case (v, k) => v + noise(i.toInt, k) })
    }
    val emb = rows.toDF("vec_id", "embedding")
    val seeds = emb.filter(col("vec_id") < kCodes)
    def q6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    def quantErr(cb: Seq[(Int, Long, Array[Double])]): Double = {
      val cbDf = cb.map { case (j, c, v) => (j, c, v.toSeq) }.toDF("sub", "code_id", "subvec")
      Similarity.pqEncode(emb, cbDf, m, dim)
        .agg(sum(col("dist_q"))).collect()(0).getDouble(0)
    }
    val seedCb = Similarity.pqTrainCodebook(emb, seeds, m, dim, iters = 0)
    val trained = Similarity.pqTrainCodebook(emb, seeds, m, dim, iters = 2)
    assert(trained != seedCb, "training moved no codeword")
    val (e0, e2) = (quantErr(seedCb), quantErr(trained))
    assert(e2 < e0, s"quantization error did not improve: $e0 -> $e2")
    // recall@5 against exact L2 ground truth, driver-computed
    val all = rows.map { case (i, e) => i -> e.map(_.toDouble).toArray }
    def l2(a: Array[Double], b: Array[Double]) =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val queries = all.take(4)
    def recall(cb: Seq[(Int, Long, Array[Double])]): Double = {
      val cbDf = cb.map { case (j, c, v) => (j, c, v.toSeq) }.toDF("sub", "code_id", "subvec")
      val codes = Similarity.pqEncode(emb, cbDf, m, dim)
      val got = Similarity.pqSearchADC(queries, codes, cb, m, k = 5)
        .as[(Long, Int, Long, Double)].collect()
        .groupBy(_._1).map { case (q, rs) => q -> rs.map(_._3).toSet }
      queries.map { case (qid, qv) =>
        val truth = all.filter(_._1 != qid)
          .map { case (v, e) => (q6(l2(qv, e)), v) }.sortBy(identity)
          .take(5).map(_._2).toSet
        (truth intersect got.getOrElse(qid, Set.empty)).size / 5.0
      }.sum / queries.size
    }
    val (r0, r2) = (recall(seedCb), recall(trained))
    assert(r2 >= r0, s"trained recall $r2 < seed recall $r0")
  }

  test("bruteTopK rejects a corpus-scale query side (quadratic-cross guard)") {
    val big = spark.range(Similarity.BruteQueryCap + 1)
      .select(col("id").as("vec_id"), array(lit(1.0f), lit(0.0f)).as("embedding"))
    val small = spark.range(4)
      .select(col("id").as("vec_id"), array(lit(1.0f), lit(0.0f)).as("embedding"))
    val e = intercept[IllegalArgumentException] {
      Similarity.bruteTopK(big, small, k = 1)
    }
    assert(e.getMessage.contains("query side exceeds"))
    // under the cap the guard is invisible
    assert(Similarity.bruteTopK(small, small, k = 2).count() > 0)
  }
}
