package graft.queries

import org.apache.spark.sql.functions._
import graft.SparkSuite
import graft.llm.TextOps

/** C4-style gate + hashed quality scorer: exact Scala references and the
  * narrow-plan guarantee (one scan, no exchange). */
class FilterOpsSpec extends SparkSuite {
  import spark.implicits._

  private def writeDocs(rows: Seq[(Long, String, String, String)]): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_filter_").toString
    rows.toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("urlFilter flags blocklist, short docs, and bad-word ratio exactly") {
    val long20 = (1 to 20).map(i => s"w$i").mkString(" ")
    val rows = Seq(
      (1L, long20, "en", "src1"),                        // clean → kept
      (2L, long20, "en", "src7"),                        // blocked domain
      (3L, "just nine tokens here so it is too short", "en", "src2"), // 9 words
      (4L, ("slow " * 20).trim, "en", "src3"))           // bad_ratio 1.0
    val out = FilterOps.urlFilter(spark, writeDocs(rows)).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getDouble(3),
        r.getBoolean(4), r.getBoolean(5), r.getBoolean(6), r.getBoolean(7)))).toMap
    assert(out(1L) == (("src1.example.com", 20L, 0.0, false, false, false, true)))
    assert(out(2L)._4 && !out(2L)._7)                    // blocked, not kept
    assert(out(3L)._2 == 9L && out(3L)._5 && !out(3L)._7) // short, not kept
    assert(out(4L)._3 == 1.0 && out(4L)._6 && !out(4L)._7) // bad, not kept
  }

  test("qualityScore margin equals the mean hashed-feature weight (exact replay)") {
    val rows = Seq((1L, "alpha beta gamma", "en", "s0"), (2L, "delta", "en", "s0"))
    val out = FilterOps.qualityScore(spark, writeDocs(rows)).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2), r.getBoolean(3)))).toMap
    def weight(s: String): Double = {
      val h = TextOps.hash60Str(s)
      (h % 8192L - 4096L).toDouble / 4096L
    }
    def expect(toks: Seq[String]): (Long, Double, Boolean) = {
      val feats = toks ++ (if (toks.length >= 2)
        toks.sliding(2).map(_.mkString(" ")).toSeq else Seq(toks.mkString(" ")))
      var acc = 0.0
      feats.foreach(f => acc += weight(f)) // same left-fold order as the query
      val margin = math.floor(acc / feats.length * 1e6 + 0.5) / 1e6
      (feats.length.toLong, margin, margin > 0)
    }
    assert(out(1L) == expect(Seq("alpha", "beta", "gamma")), s"${out(1L)}")
    assert(out(2L) == expect(Seq("delta")), s"${out(2L)}")
  }

  test("both gates are one narrow pass: no shuffle-by-key, no join, no window") {
    val d = writeDocs(Seq((1L, "a b c d e", "en", "s0")))
    for (q <- Seq(FilterOps.urlFilter(spark, d), FilterOps.qualityScore(spark, d))) {
      // the only exchange allowed is Tables.spread's round-robin fan-out of
      // the single-row-group test parquet — never a keyed repartition
      val plan = q.queryExecution.executedPlan.toString
      assert(!plan.contains("hashpartitioning"), plan)
      assert(!plan.contains("rangepartitioning"), plan)
      assert(!plan.contains("Join"), plan)
      assert(!plan.toLowerCase.contains("window"), plan)
    }
  }
}
