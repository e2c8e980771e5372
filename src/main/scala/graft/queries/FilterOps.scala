package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType
import graft.core.Tables
import graft.llm.TextOps
import LlmOps.{hashSql, qSql, toksSql}

/** Corpus gating the standard web-scale cleaning recipes run before any
  * dedup or selection pass: C4/RefinedWeb-style URL + content filtering
  * (Raffel et al. 2020 §2.2; Penedo et al. 2023 §3) and a fasttext-style
  * hashed linear quality scorer (Joulin et al. 2016 — the CCNet/LLaMA
  * quality-classifier shape).
  *
  * Scale shape: both operators are ONE narrow projection per document — the
  * domain blocklist is a literal `isin` (pure filter, not even a broadcast
  * join), the rule columns are in-row arithmetic, and the scorer folds its
  * hashed features in-row over a materialized, codegen-hashed feature
  * array. No shuffle anywhere; the plan is a scan + project + filter.
  */
object FilterOps {

  // documents carry no URL column: derive the canonical synthetic URL from
  // the source id (documented stand-in — a real corpus supplies the real
  // column and NOTHING else changes). Blocklist and rule thresholds are the
  // operator's static config.
  private val BlockedSources = Seq("src7", "src13")
  private val MinWords = 20
  private val BadWords = Seq("slow", "dup")
  private val BadMax = 0.04

  /** C4-style URL + line-rule gate: domain blocklist, minimum word count,
    * bad-word ratio. Emits every document with its rule flags and the
    * combined keep decision (the gate a pipeline applies is
    * `filter(col("kept"))` — emitting flags keeps the oracle strong and the
    * reject-reason statistics queryable). */
  def urlFilter(s: SparkSession, d: String): DataFrame = {
    val toks = TextOps.tokens(col("text"))
    Tables.documents(s, d)
      .filter(length(trim(col("text"))) > 0)
      .withColumn("domain", concat(col("source"), lit(".example.com")))
      .withColumn("__toks", toks)
      .withColumn("n_words", size(col("__toks")).cast(LongType))
      .withColumn("bad_ratio", TextOps.quant(
        size(filter(col("__toks"), t => t.isin(BadWords.map(_.asInstanceOf[Any]): _*)))
          * lit(1.0) / col("n_words"), 6))
      .withColumn("blocked_domain",
        col("source").isin(BlockedSources.map(_.asInstanceOf[Any]): _*))
      .withColumn("too_short", col("n_words") < MinWords)
      .withColumn("too_bad", col("bad_ratio") > BadMax)
      .select(col("doc_id"), col("domain"), col("n_words"), col("bad_ratio"),
        col("blocked_domain"), col("too_short"), col("too_bad"),
        (!col("blocked_domain") && !col("too_short") && !col("too_bad")).as("kept"))
  }

  private val urlFilterOracle = {
    val blocked = BlockedSources.map(s0 => s"'$s0'").mkString(", ")
    val bad = BadWords.map(w => s"'$w'").mkString(", ")
    s"""
    WITH t AS (
      SELECT doc_id, source, $toksSql AS toks FROM documents
      WHERE length(trim(text)) > 0),
    r AS (
      SELECT doc_id, source || '.example.com' AS domain,
        CAST(len(toks) AS BIGINT) AS n_words,
        ${qSql(s"len(list_filter(toks, x -> x IN ($bad))) * 1.0 / len(toks)", 6)} AS bad_ratio,
        source IN ($blocked) AS blocked_domain,
        len(toks) < $MinWords AS too_short
      FROM t)
    SELECT doc_id, domain, n_words, bad_ratio, blocked_domain, too_short,
      bad_ratio > $BadMax AS too_bad,
      (NOT blocked_domain AND NOT too_short AND NOT (bad_ratio > $BadMax)) AS kept
    FROM r"""
  }

  // ---- hashed linear quality scorer -------------------------------------

  private val HashBuckets = 8192L

  /** fasttext-style scorer: features = word unigrams + (non-distinct) word
    * bigrams, hashed by the portable 60-bit hash in ONE codegen'd pass
    * ([[graft.functions.Hash60Array]]); each feature's weight is a fixed
    * deterministic projection of its hash (`(h mod B - B/2) / (B/2)` — the
    * stand-in for a trained weight vector, which would ship as a broadcast
    * map and change nothing about the plan); the document margin is the
    * in-row mean of its feature weights (a single left fold in array order,
    * so both engines run the identical IEEE addition sequence). */
  def qualityScore(s: SparkSession, d: String): DataFrame = {
    val toks = TextOps.tokens(col("text"))
    val half = lit(HashBuckets / 2)
    Tables.documents(s, d)
      .filter(length(trim(col("text"))) > 0)
      .withColumn("__toks", toks)
      .withColumn("__hs", TextOps.hash60Array(
        concat(col("__toks"), TextOps.ngrams(col("__toks"), 2))))
      .withColumn("n_feats", size(col("__hs")).cast(LongType))
      .withColumn("margin", TextOps.quant(
        aggregate(col("__hs"), lit(0.0),
          (acc, h) => acc + (h % lit(HashBuckets) - half).cast("double") / half)
          / col("n_feats"), 6))
      .select(col("doc_id"), col("n_feats"), col("margin"),
        (col("margin") > 0d).as("keep"))
  }

  private val qualityOracle = {
    val b = HashBuckets
    val ngrams2 = """CASE WHEN len(toks) >= 2
          THEN [array_to_string(toks[i:i+1],' ') for i in range(1, len(toks))]
          ELSE [array_to_string(toks,' ')] END"""
    s"""
    WITH t AS (
      SELECT doc_id, $toksSql AS toks FROM documents
      WHERE length(trim(text)) > 0),
    f AS (
      SELECT doc_id,
        list_transform(list_concat(toks, $ngrams2), x -> ${hashSql("x")}) AS hs
      FROM t),
    m AS (
      SELECT doc_id, CAST(len(hs) AS BIGINT) AS n_feats,
        list_reduce(
          list_prepend(CAST(0.0 AS DOUBLE),
            list_transform(hs, h -> CAST(h % $b - ${b / 2} AS DOUBLE) / ${b / 2})),
          (acc, x) -> acc + x) AS msum
      FROM f)
    SELECT doc_id, n_feats, ${qSql("msum / n_feats", 6)} AS margin,
      ${qSql("msum / n_feats", 6)} > 0 AS keep
    FROM m"""
  }

  def qs: Map[String, Q] = Map(
    "llm_url_filter"    -> Q(urlFilter, Some(urlFilterOracle)),
    "llm_quality_score" -> Q(qualityScore, Some(qualityOracle)))
}
