package graft

import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._
import graft.sink.FileSink

/** Scale-shape proofs — the reference's bigdata_test.go (1M-row batch) and
  * the co-located-join posture the 100 TB design leans on. These verify the
  * SHAPE holds (row counts, dedup math, no shuffle in the plan), not wall
  * time. */
class ScaleSpec extends SparkSuite {

  test("1M-row batch: shape → dedup → file sink completes with exact counts (bigdata_test.go:18-39)") {
    // 1M synthetic events, 100k distinct pks → dedup keeps exactly 100k
    val million = spark.range(1000000L).select(
      (col("id") % 100000L).as("pk"),
      col("id").as("arrival"),
      concat(lit("v"), col("id")).as("v"))
    val dir = java.nio.file.Files.createTempDirectory("graft_big_").toString
    FileSink.write(million, dir, SaveMode.Overwrite,
      FileSink.Config(format = "parquet", pk = Seq("pk")),
      arrival = Some(col("arrival")))
    val back = spark.read.parquet(dir)
    assert(back.count() == 100000L)
    // last-wins: pk 0 survives as arrival 999...0 → id 900000
    assert(back.filter(col("pk") === 0L).select("arrival").collect()(0).getLong(0) == 900000L)
  }

  test("mergeCow at 1M rows / 50 partitions: only the touched partition's files change") {
    // 1M-row lake over 50 partitions; a change set confined to ONE
    // partition. Copy-on-write cost must be that partition, and the proof
    // is file identity: every other partition keeps the exact same files.
    val dir = java.nio.file.Files.createTempDirectory("graft_cow_").toString + "/t"
    spark.range(1000000L).select(col("id"), (col("id") % 50).cast("string").as("p"),
        (col("id") * 3).as("v"))
      .write.partitionBy("p").parquet(dir)
    def files(): Map[String, Set[String]] =
      new java.io.File(dir).listFiles().filter(_.getName.startsWith("p=")).map { pd =>
        pd.getName -> pd.listFiles().map(f => s"${f.getName}:${f.lastModified}").toSet
      }.toMap
    val before = files()
    val changes = spark.range(100L)
      .select((col("id") * 50 + 7).as("id"), lit("7").as("p"), lit(-1L).as("v"))
    FileSink.mergeCow(changes, dir, Seq("id"), "p")
    val after = files()
    assert(before.keySet == after.keySet)
    before.keySet.filterNot(_ == "p=7").foreach { p =>
      assert(before(p) == after(p), s"untouched partition $p rewritten")
    }
    assert(before("p=7") != after("p=7"), "touched partition not rewritten")
    // correctness at this scale: 100 updates landed, total row count kept
    val back = spark.read.parquet(dir)
    assert(back.count() == 1000000L)
    assert(back.filter(col("v") === -1L).count() == 100L)
  }

  test("bucketed tables co-locate the join: NO shuffle exchange in the plan") {
    spark.sql("DROP TABLE IF EXISTS buck_orders")
    spark.sql("DROP TABLE IF EXISTS buck_lines")
    spark.range(10000L).select(col("id").as("okey"), (col("id") % 7).as("status"))
      .write.bucketBy(8, "okey").sortBy("okey").saveAsTable("buck_orders")
    spark.range(30000L).select((col("id") % 10000L).as("okey"), col("id").as("line"))
      .write.bucketBy(8, "okey").saveAsTable("buck_lines")
    val joined = spark.table("buck_orders").join(spark.table("buck_lines"), "okey")
    assert(joined.count() == 30000L) // execute first: AQE finalizes the plan
    val plan = joined.queryExecution.executedPlan.toString
    // both sides pre-bucketed on the join key → SortMergeJoin with ZERO
    // shuffle Exchanges: the co-located layout a 100 TB fact-fact join needs
    // (broadcast of the small side is fine — no data moved by key)
    assert(!plan.contains("Exchange hashpartitioning"), plan)
  }

  test("AQE coalesces post-shuffle partitions on small data (runtime re-plan)") {
    assert(spark.conf.get("spark.sql.adaptive.enabled") == "true") // Spark 4 default
    val agg = spark.range(100000L)
      .groupBy((col("id") % 50L).as("k")).count()
    // materialize through an action that keeps the adaptive plan, then
    // inspect the FINAL (post-execution) plan
    agg.collect()
    val finalPlan = agg.queryExecution.executedPlan.toString
    assert(finalPlan.contains("AQEShuffleRead") || finalPlan.contains("isFinalPlan=true"),
      finalPlan.take(500))
  }

  test("decontaminate broadcasts the benchmark n-gram set (corpus never shuffles for the probe)") {
    import spark.implicits._
    val train = (1 to 50).map(i => (i.toLong, s"unique words number $i row and filler tokens here"))
      .toDF("doc_id", "text")
    val bench = Seq((1000L, "the held out benchmark sentence nobody should train on"))
      .toDF("doc_id", "text")
    val out = graft.llm.Corpus.decontaminate(train, bench, 5)
    val plan = out.queryExecution.executedPlan.toString
    // the contamination probe must be a broadcast join, not a shuffled one
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"), plan)
    assert(out.count() == 50)
  }

  test("chunkDedup at 200k docs: exact dup accounting, no pair blowup") {
    // docs 2j and 2j+1 share identical text (25 tokens → 2 chunks each):
    // the odd twin's chunks are all duplicates, the even one's never are
    val docs = spark.range(200000L).select(
      col("id").as("doc_id"),
      concat_ws(" ", (0 until 25).map(k =>
        concat(lit(s"w${k}_"), (col("id") / 2).cast("long"))): _*).as("text"))
    val out = graft.llm.Corpus.chunkDedup(docs, 20)
      .agg(sum(col("n_chunks")), sum(col("n_dup_chunks"))).collect()(0)
    assert(out.getLong(0) == 400000L)
    assert(out.getLong(1) == 200000L) // every odd doc: both chunks dup
  }

  test("as-of join at 1M left rows: one shuffle, exact row preservation") {
    val left = spark.range(1000000L).select(col("id"),
      (col("id") % 1000L).cast("string").as("k"), (col("id") % 5000L).as("ts"))
    val right = spark.range(10000L).select(
      (col("id") % 1000L).cast("string").as("k"),
      (col("id") % 5000L).as("ts0"), col("id").cast("double").as("v"))
      .groupBy("k", "ts0").agg(max(col("v")).as("v")).withColumnRenamed("ts0", "ts")
    val out = graft.ops.AsOf.join(left, right, "k", "ts", Seq("v"))
    assert(out.count() == 1000000L) // every left row exactly once — no blowup
  }

  test("chunkDedup plan: hash-keyed exchanges only, no pair join anywhere") {
    import spark.implicits._
    val d = (1 to 60).map(i => (i.toLong, (1 to 30).map(k => s"w${i}_$k").mkString(" "), "s"))
      .toDF("doc_id", "text", "source")
    val out = graft.llm.Corpus.chunkDedup(d, 20)
    val plan = out.queryExecution.executedPlan.toString
    // a repeated chunk must cost its group size, not a pair explosion: the
    // plan has NO join at all — and NO window either (the first-occurrence
    // pick is a map-side min_by aggregate, so a hot chunk hash never routes
    // every occurrence through one reducer's sort)
    assert(!plan.contains("Join"), plan)
    assert(!plan.contains("Window"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
    assert(out.count() == 60)
  }

  test("tfidf plan: keyed joins only, never a nested-loop pair product") {
    import spark.implicits._
    val d = (1 to 40).map(i => (i.toLong, s"common shared w$i extra tokens"))
      .toDF("doc_id", "text")
    val out = graft.llm.Corpus.tfidf(d, 40)
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"), plan)
    assert(out.count() > 0)
  }

  test("SCD2 + CDC apply at 1M events: exact run/entity accounting, no global sort") {
    // deterministic 1M-event stream, ts ascending with id, nanos physical
    // type (the Tables.events contract); type pattern gives closed-form runs
    val t0 = 1704067200000L
    val dir = java.nio.file.Files.createTempDirectory("graft_scale_ev_").toString
    spark.range(1000000L).select(
      col("id").as("event_id"),
      ((col("id") * 200 + t0) * 1000000L).as("ts"),
      (col("id") % 5000L).as("user_id"),
      when(col("id") % 7 === 0, "error")
        .otherwise(concat(lit("t"), ((col("id") / 5000).cast("long") / 4 % 3).cast("long")))
        .as("event_type"),
      (col("id") % 1000L).cast("double").as("value"),
      lit("{}").as("props"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")

    // driver replay of the same arithmetic (no data transfer)
    def typ(id: Long): String =
      if (id % 7 == 0) "error" else "t" + ((id / 5000) / 4 % 3)
    var expRuns = 0L
    var u = 0L
    while (u < 5000L) {
      var prev: String = null
      var k = 0L
      while (k < 200L) {
        val t = typ(u + 5000L * k)
        if (t != prev) { expRuns += 1; prev = t }
        k += 1
      }
      u += 1
    }
    val scd2 = graft.queries.EventOps.qScd2(spark, dir)
    assert(scd2.count() == expRuns)
    assert(!scd2.queryExecution.executedPlan.toString.contains("rangepartitioning"))

    var expLive = 0L
    var e = 0L
    while (e <= 333333L) {
      val latest = math.min(3 * e + 2, 999999L)
      if (typ(latest) != "error") expLive += 1
      e += 1
    }
    val cdc = graft.queries.EltOps.d6CdcApply(spark, dir)
    assert(cdc.count() == expLive)
    val cdcPlan = cdc.queryExecution.executedPlan.toString
    assert(!cdcPlan.contains("Window") && !cdcPlan.contains("rangepartitioning"), cdcPlan)
  }

  test("llm_build (full selection pipeline) plan: no global sort, no pair join") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_build_").toString
    val rnd = new scala.util.Random(5L)
    // english-ish docs so the quality/language gate keeps a population;
    // doc_id % 50 == 0 rows become the benchmark slice by construction
    (0 until 120).map { i =>
      val en = Seq("the", "of", "and", "to", "in", "a", "is", "that")
      val words = Seq.fill(40)(if (rnd.nextBoolean()) en(rnd.nextInt(en.length))
                               else s"w${rnd.nextInt(50)}")
      (i.toLong, (words :+ s"m$i").mkString(" "), "en", s"src${i % 3}")
    }.toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = graft.queries.LlmOps.qs("llm_build").fn(spark, dir)
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("rangepartitioning"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
    val rows = out.collect()
    assert(rows.nonEmpty)
    // every surviving doc is non-benchmark and sequences start at 0 per source
    assert(rows.forall(_.getLong(0) % 50 != 0))
    assert(rows.map(r => (r.getString(1), r.getLong(5))).groupBy(_._1)
      .forall { case (_, seqs) => seqs.map(_._2).min == 0L })
  }

  test("round-7 operators keep scale-safe plans: BPE encode, PQ encode, KMV set ops") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_r7scale_").toString
    val rnd = new scala.util.Random(11L)
    (0 until 400).map { i =>
      (i.toLong, (0 until 30).map(_ => s"w${rnd.nextInt(40)}").mkString(" "),
        "en", s"src${i % 3}")
    }.toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    (0 until 100).map(i => (i.toLong,
        Seq.tabulate(64)(k => ((i * 31 + k * 7) % 100) / 50.0f - 1.0f)))
      .toDF("vec_id", "embedding")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")

    // BPE encode: after the train collect, the encode itself is ONE narrow
    // projection (the kernel carries the merges — no join, no shuffle)
    val enc = graft.queries.BpeOps.qs("llm_bpe_encode").fn(spark, dir)
    val encPlan = enc.queryExecution.executedPlan.toString
    assert(!encPlan.contains("Join"), encPlan)
    assert(!encPlan.contains("rangepartitioning"), encPlan)
    assert(enc.count() == 400)

    // PQ encode: broadcast codebook join + map-side argmin — hash exchanges
    // only, never a nested-loop pair product over the corpus
    val pq = graft.queries.PqOps.qs("llm_pq_encode").fn(spark, dir)
    val pqPlan = pq.queryExecution.executedPlan.toString
    assert(!pqPlan.contains("rangepartitioning"), pqPlan)
    assert(!pqPlan.contains("CartesianProduct"), pqPlan)
    assert(!pqPlan.contains("BroadcastNestedLoop"), pqPlan)
    assert(pq.count() == 100 * 8)

    // IVF-PQ: cell restriction must stay an equi-join + literal probe
    // filter — no pair product; results are a subset of the full ADC scan
    // with IDENTICAL approximate distances
    // (the coarse-cell centroid cross is an INTENDED ≤16-row broadcast
    // nested loop — allowlisted in PlanSweep like ivf/kmeans; what must
    // never appear is an unbounded pair product)
    val ivfpq = graft.queries.PqOps.qs("llm_ann_ivfpq").fn(spark, dir)
    val ivfpqPlan = ivfpq.queryExecution.executedPlan.toString
    assert(!ivfpqPlan.contains("CartesianProduct"), ivfpqPlan)
    // the full ADC scan with the SAME seed codebook ivfpq uses (the
    // registry llm_pq_search runs a TRAINED codebook since round 8, so the
    // shared-pair invariant is pinned against an inline seed-codebook scan)
    val embDf = spark.read.parquet(s"$dir/embeddings.parquet")
    val seedRows = embDf.filter(col("vec_id") < 16)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray)).sortBy(_._1)
    val cbRows = for { (vid, e) <- seedRows.toSeq; j <- 0 until 8 }
      yield (j, vid, e.slice(j * 8, j * 8 + 8).map(_.toDouble))
    val qsv = seedRows.filter(_._1 < 4)
      .map { case (v, e) => (v, e.map(_.toDouble)) }.toSeq
    val cbDf = cbRows.map { case (j, v, sv) => (j, v, sv.map(_.toFloat).toSeq) }
      .toDF("sub", "code_id", "subvec")
    val seedCodes = graft.llm.Similarity.pqEncode(embDf, cbDf, 8, 64)
    val full = graft.llm.Similarity.pqSearchADC(qsv, seedCodes, cbRows, 8, 5)
      .collect().map(r => (r.getLong(0), r.getLong(2)) -> r.getDouble(3)).toMap
    val restricted = ivfpq.collect()
      .map(r => (r.getLong(0), r.getLong(2)) -> r.getDouble(3))
    assert(restricted.nonEmpty)
    // shared pairs carry identical adist (same dtab/decimal-sum path)...
    restricted.foreach { case (key, d) =>
      assert(full.get(key).forall(_ == d), s"adist mismatch at $key")
    }
    // ...and the gate is verified INDEPENDENTLY: every restricted neighbor
    // must sit in one of its query's nprobe=2 nearest cells, with cells and
    // probe lists recomputed here from the public pieces (an always-true
    // gate admitting out-of-cell neighbors fails this; an always-false one
    // fails nonEmpty above). restricted == full is the legitimate
    // high-recall outcome on this fixture, not a failure.
    val embRows = spark.read.parquet(s"$dir/embeddings.parquet")
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    val cellOf = graft.llm.Similarity.coarseCells(
        spark.read.parquet(s"$dir/embeddings.parquet"),
        spark.read.parquet(s"$dir/embeddings.parquet").filter(col("vec_id") < 16))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def probesOf(qid: Long): Set[Long] = {
      val qv = embRows(qid)
      (0L until 16L).map { cid =>
        val cv = embRows(cid)
        val acc = qv.indices.foldLeft(0d) { (a, i) =>
          val dd = qv(i).toDouble - cv(i).toDouble; a + dd * dd
        }
        (math.floor(acc * 1e6 + 0.5) / 1e6, cid)
      }.sorted.take(2).map(_._2).toSet
    }
    restricted.foreach { case ((q, n), _) =>
      assert(probesOf(q).contains(cellOf(n)),
        s"neighbor $n of query $q is outside the probed cells")
    }

    // semantic decontamination: bench buckets BROADCAST onto the corpus —
    // the corpus side never pair-shuffles for the probe
    val sd = graft.queries.LlmOps.qs("llm_sem_decontaminate").fn(spark, dir)
    val sdPlan = sd.queryExecution.executedPlan.toString
    assert(sdPlan.contains("BroadcastHashJoin"), sdPlan)
    assert(!sdPlan.contains("CartesianProduct"), sdPlan)
    assert(!sdPlan.contains("BroadcastNestedLoop"), sdPlan)
    assert(sd.count() == 100)

    // KMV set ops: bounded kmin_k partials, no rank window, no global sort
    val so = graft.queries.SketchOps.qs("llm_kmv_setops").fn(spark, dir)
    val soPlan = so.queryExecution.executedPlan.toString
    assert(!soPlan.contains("rangepartitioning"), soPlan)
    assert(!soPlan.toLowerCase.contains("window"), soPlan)
    assert(soPlan.contains("kmin_k"), soPlan)
    assert(so.count() == 1)

    // bounded grouped top-k: the top_k_by heap aggregate replaces the rank
    // window — groups × K entries shuffle, nothing sorts the input; answer
    // equals the window form on the same data
    (0 until 200).map(i => (i.toLong, i.toLong * 1000000L, i.toLong % 7,
        s"t${i % 4}", (i * 37 % 50).toDouble, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val gt = graft.queries.Relational.qs("q_group_topk_bounded").fn(spark, dir)
    val gtPlan = gt.queryExecution.executedPlan.toString
    assert(!gtPlan.contains("rangepartitioning"), gtPlan)
    assert(!gtPlan.toLowerCase.contains("window"), gtPlan)
    assert(gtPlan.contains("top_k_by"), gtPlan)
    assertSameRows(gt, graft.queries.Relational.qs("q_group_topk").fn(spark, dir))
  }

  test("fuzzy ER join: exact pairs, over-cap block dropped, equi-join plan") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_fuzzy_").toString
    val base = Seq("red widget", "red widget", "red widget", "red wodget",
      "blue bolt", "blue bolt", "blue bent", "green gear")
    // an over-cap first-token block: 101 distinct names that WOULD pair on
    // Levenshtein (mega n1 ~ mega n2) but must be dropped by the block cap
    val mega = (0 to 100).map(i => s"mega n$i")
    (base ++ mega).zipWithIndex.map { case (nm, i) => (i.toLong, nm) }
      .toDF("p_partkey", "p_name")
      .write.mode("overwrite").parquet(s"$dir/part.parquet")
    val out = graft.queries.Relational.qFuzzyJoin(spark, dir)
    val got = out.collect()
      .map(r => (r.getString(0), r.getString(1), r.getInt(2), r.getLong(3), r.getLong(4)))
      .toSet
    assert(got == Set(
      ("blue bent", "blue bolt", 2, 1L, 2L),
      ("red widget", "red wodget", 1, 3L, 1L)), got.toString)
    // blocked ER: candidates come from equi-joins on blocking keys only
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoop"), plan)
    assert(!plan.contains("rangepartitioning"), plan)
  }

  test("distributed PageRank at 200k edges: bit-identical to the driver replay") {
    import spark.implicits._
    val rnd = new scala.util.Random(13L)
    // 50k-node power-law-ish multigraph, far above the driver edge cap
    val raw = (0 until 200000).map { _ =>
      val src = rnd.nextInt(50000)
      val dst = if (rnd.nextInt(4) == 0) rnd.nextInt(100) else rnd.nextInt(50000)
      (s"n$src", s"n$dst")
    }
    val edges = raw.groupBy(identity).map { case ((s0, d0), es) =>
      (s0, d0, es.size.toLong) }.toSeq
    val iters = 5 // arithmetic identical per round; 5 bounds test runtime
    val driver = graft.queries.GraphOps.pageRankDriver(edges, iters)
    val dist = graft.queries.GraphOps.pageRankDistributed(
        edges.toDF("src", "dst", "w"), iters)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(dist.size == driver.size)
    assert(dist == driver)
    // fixed-point truncation only ever LOSES mass
    val total = dist.values.map(BigInt(_)).sum
    assert(total <= BigInt(graft.queries.GraphOps.PrUnit) &&
      total > BigInt(graft.queries.GraphOps.PrUnit) * 9 / 10, total.toString)
  }

  test("round-8 operators keep scale-safe plans: golden record, stratified A-ES, streaming CMS") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_r8scale_").toString

    // --- q_er_golden: exact election on the fuzzy-ER fixture ------------
    // clusters are min-label over UTF-8 order; the canonical spelling wins
    // by (cnt DESC, name ASC); unmatched names never appear
    val base = Seq("red widget", "red widget", "red widget", "red wodget",
      "blue bolt", "blue bolt", "blue bent", "green gear")
    val mega = (0 to 100).map(i => s"mega n$i") // over-cap block: must drop
    (base ++ mega).zipWithIndex.map { case (nm, i) => (i.toLong, nm) }
      .toDF("p_partkey", "p_name")
      .write.mode("overwrite").parquet(s"$dir/part.parquet")
    val g = graft.queries.Relational.qs("q_er_golden").fn(spark, dir)
    val got = g.collect().map(r =>
      (r.getString(0), r.getLong(1), r.getString(2), r.getString(3), r.getLong(4))).toSet
    assert(got == Set(
      ("red widget", 3L, "red widget", "red widget", 3L),
      ("red wodget", 1L, "red widget", "red widget", 3L),
      ("blue bolt", 2L, "blue bent", "blue bolt", 2L),
      ("blue bent", 1L, "blue bent", "blue bolt", 2L)), got.toString)
    // candidates come from blocked equi-joins; the election is a min_by
    // aggregate + broadcast join — never a pair product or a global sort
    val gPlan = g.queryExecution.executedPlan.toString
    assert(!gPlan.contains("CartesianProduct"), gPlan)
    assert(!gPlan.contains("BroadcastNestedLoop"), gPlan)
    assert(!gPlan.contains("rangepartitioning"), gPlan)

    // --- llm_group_weighted_sample: bounded heap, never a rank window ---
    val rnd = new scala.util.Random(17L)
    val en = Seq("the", "of", "and", "to", "in", "a", "is", "that")
    (0 until 60).map { i =>
      val words = Seq.fill(30)(if (rnd.nextBoolean()) en(rnd.nextInt(en.length))
                               else s"w${rnd.nextInt(40)}")
      (i.toLong, words.mkString(" "), "en", s"src${i % 3}")
    }.toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val gw = graft.queries.LlmOps.qs("llm_group_weighted_sample").fn(spark, dir)
    val gwPlan = gw.queryExecution.executedPlan.toString
    assert(gwPlan.contains("top_k_by"), gwPlan)
    assert(!gwPlan.toLowerCase.contains("window"), gwPlan)
    assert(!gwPlan.contains("rangepartitioning"), gwPlan)
    val gwRows = gw.collect().map(r =>
      (r.getString(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    assert(gwRows.length == 30) // 3 sources × K=10, 20 candidates each
    assert(gwRows.map(r => (r._1, r._2)).distinct.length == 30)
    gwRows.groupBy(_._1).foreach { case (src, rs) =>
      assert(rs.map(_._4).sorted.toSeq == (1L to 10L), s"ranks in $src")
      // rank order is (key_q DESC, doc_id ASC) — a total order
      val byRank = rs.sortBy(_._4)
      byRank.sliding(2).foreach { case Array(a, b) =>
        assert(a._3 > b._3 || (a._3 == b._3 && a._2 < b._2), s"order in $src")
      }
      // stratum isolation: every pick belongs to its own source
      rs.foreach(r => assert(r._2 % 3 == src.stripPrefix("src").toLong))
    }

    // --- q_stream_cms: streamed cells == batch sketch, bounded state ----
    // cell counts are order-independent sums, so the micro-batched fold
    // must reproduce the one-shot batch heavy hitters EXACTLY
    val t0 = 1704067200000L
    spark.range(500L).select(
      col("id").as("event_id"),
      ((col("id") * 1000 + t0) * 1000000L).as("ts"),
      ((col("id") * col("id")) % 37L).as("user_id"), // skewed keyspace
      lit("t0").as("event_type"),
      col("id").cast("double").as("value"),
      lit("{}").as("props"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val sc = graft.queries.StreamOps.qs("q_stream_cms").fn(spark, dir)
    assertSameRows(sc, graft.queries.SketchOps.qs("q_heavy_hitters").fn(spark, dir))
    // the ENTIRE streaming state is the d×w counter matrix — bounded by
    // construction no matter how long the stream runs
    assert(spark.table("graft_scms_cells").count() <= 4L * 256L)
  }

  test("packSequences never globally sorts: the only exchange is the shard hash partition") {
    import spark.implicits._
    val d = (1 to 100).map(i => (i.toLong, "a b c d e", s"shard${i % 4}"))
      .toDF("doc_id", "text", "source")
    val out = graft.llm.Corpus.packSequences(d, "source", "doc_id", 16L)
    val plan = out.queryExecution.executedPlan.toString
    // per-shard window → hashpartitioning exchange; a global order-by would
    // show rangepartitioning (the single-partition scale-killer)
    assert(!plan.contains("rangepartitioning"), plan)
    assert(plan.contains("hashpartitioning"), plan)
    assert(out.count() == 100)
  }
}
