package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType
import graft.core.Tables
import graft.llm.{Bpe, TextOps}
import LlmOps.toksSql

/** Distributed BPE tokenizer queries — the subword-tokenization capability a
  * training-data pipeline needs beyond word-level vocab encoding
  * (reference scope: corpus preparation; the reference engine itself stops
  * at ELT, so this derives from the published algorithm, Sennrich et al.
  * 2016, arXiv:1508.07909).
  *
  * Scale analysis (the part that matters at 100 TB):
  *  - `llm_bpe_train`: ONE corpus-scale pass — the map-side-combined word
  *    count — then a TakeOrdered collect of the top-`VocabCap` model rows.
  *    Training over that bounded model is control-plane work (the same
  *    treatment kmeans gives centroids); [[Bpe.trainDistributed]] is the
  *    executor-resident per-round variant for uncapped vocabularies,
  *    spec-proven identical.
  *  - `llm_bpe_encode`: merges broadcast inside the codegen'd
  *    [[graft.functions.BpePieces]] kernel — a narrow projection per
  *    document, no shuffle at all after the train step.
  *
  * The oracle replays training EXACTLY: a chained CTE per merge round (pair
  * count → deterministic argmax → fold-apply), then a recursive CTE that
  * re-encodes every distinct word through the learned ranks. Nothing is
  * sampled or approximated on either side.
  */
object BpeOps {

  val NMerges = 40
  private[queries] val VocabCap = 8192
  private val Sep = "\u001f" // joins pieces for checksums; never in tokens

  /** The one corpus-scale pass: word frequencies, map-side combined. */
  private def wordCounts(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .filter(length(trim(col("text"))) > 0)
      .select(explode(TextOps.tokens(col("text"))).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy("word").agg(count(lit(1)).as("freq"))

  /** Bounded model collect + driver training (see object doc). */
  def trainedMerges(s: SparkSession, d: String): Seq[Bpe.Merge] = {
    val wc = wordCounts(s, d)
      .orderBy(col("freq").desc, col("word").asc).limit(VocabCap) // TakeOrdered
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    Bpe.train(wc, NMerges)
  }

  def bpeTrain(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    trainedMerges(s, d).toDF("rank", "lhs", "rhs", "merged", "weight")
  }

  def bpeEncode(s: SparkSession, d: String): DataFrame = {
    val rules = trainedMerges(s, d).map(m => (m.lhs, m.rhs))
    Tables.documents(s, d)
      .filter(length(trim(col("text"))) > 0)
      .select(col("doc_id"),
        TextOps.bpePieces(TextOps.tokens(col("text")), rules, perWord = true)
          .as("pieces"))
      .select(col("doc_id"),
        size(col("pieces")).cast(LongType).as("n_pieces"),
        md5(concat_ws(Sep, col("pieces"))).as("checksum"))
  }

  // ---- oracle: exact replay of the training loop in SQL -----------------

  // word-frequency model + initial per-word character state (w0/s0)
  private def modelCtes = s"""w0 AS MATERIALIZED (
      SELECT word, CAST(count(*) AS BIGINT) AS freq
      FROM (SELECT unnest($toksSql) AS word FROM documents
            WHERE length(trim(text)) > 0) t
      WHERE length(word) > 0 GROUP BY 1
      ORDER BY freq DESC, word LIMIT $VocabCap),
    s0 AS MATERIALIZED (SELECT word, freq, regexp_extract_all(word, '.') AS syms FROM w0)"""

  // the fold-apply of one merge rule over a symbol list: accumulate into a
  // chr(31)-joined string (append rhs WITHOUT a separator when the previous
  // symbol is exactly lhs), then split back — the same left-to-right single
  // pass Bpe.applyRule runs
  private def applySql(syms: String, lhs: String, rhs: String) = s"""string_split(
          list_reduce($syms, (acc, x) -> CASE
            WHEN x = $rhs AND (acc = $lhs OR ends_with(acc, chr(31) || $lhs))
            THEN acc || x ELSE acc || chr(31) || x END), chr(31))"""

  // one training round: weighted adjacent-pair count → deterministic argmax
  // → guarded apply (an exhausted-vocabulary round leaves state unchanged)
  private def roundCtes(i: Int) = s"""p$i AS (
      SELECT syms[k] AS lhs, syms[k+1] AS rhs, CAST(sum(freq) AS BIGINT) AS w
      FROM s$i, unnest(range(1, len(syms))) AS u(k) GROUP BY 1, 2),
    b$i AS MATERIALIZED (SELECT lhs, rhs, w FROM p$i ORDER BY w DESC, lhs, rhs LIMIT 1),
    s${i + 1} AS MATERIALIZED (
      SELECT word, freq,
        CASE WHEN b.lhs IS NULL THEN syms
        ELSE ${applySql("syms", "b.lhs", "b.rhs")} END AS syms
      FROM s$i LEFT JOIN b$i b ON TRUE)"""

  private def trainCtes: String =
    (Seq(modelCtes) ++ (0 until NMerges).map(roundCtes)).mkString(",\n    ")

  private val mergesSelect = (0 until NMerges)
    .map(i => s"SELECT $i AS rank, lhs, rhs, lhs || rhs AS merged, w AS weight FROM b$i")
    .mkString("\n    UNION ALL ")

  private[queries] val bpeTrainOracle = s"WITH $trainCtes\n    $mergesSelect"

  private[queries] val bpeEncodeOracle = s"""WITH RECURSIVE $trainCtes,
    merges AS MATERIALIZED ($mergesSelect),
    docs AS (SELECT doc_id, $toksSql AS toks FROM documents
             WHERE length(trim(text)) > 0),
    dw AS MATERIALIZED (SELECT doc_id, k AS pos, toks[k] AS word
           FROM docs, unnest(range(1, len(toks) + 1)) AS u(k)
           WHERE length(toks[k]) > 0),
    words AS MATERIALIZED (SELECT DISTINCT word FROM dw),
    enc AS (
      SELECT word, 0 AS r, regexp_extract_all(word, '.') AS syms FROM words
      UNION ALL
      SELECT e.word, e.r + 1,
        CASE WHEN m.lhs IS NULL THEN e.syms
        ELSE ${applySql("e.syms", "m.lhs", "m.rhs")} END
      FROM enc e LEFT JOIN merges m ON m.rank = e.r
      WHERE e.r < $NMerges),
    final AS (SELECT word, syms FROM enc WHERE r = $NMerges)
    SELECT dw.doc_id, CAST(sum(len(f.syms)) AS BIGINT) AS n_pieces,
           md5(string_agg(array_to_string(f.syms, chr(31)), chr(31) ORDER BY dw.pos)) AS checksum
    FROM dw JOIN final f USING (word) GROUP BY 1"""

  def qs: Map[String, Q] = Map(
    "llm_bpe_train"  -> Q(bpeTrain, Some(bpeTrainOracle)),
    "llm_bpe_encode" -> Q(bpeEncode, Some(bpeEncodeOracle)))
}
