package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Corpus-level training-data operators: benchmark decontamination,
  * deterministic stratified sampling, and sequence packing — the set a
  * 100 TB pretraining pipeline runs after dedup/quality filtering.
  * Query-layer wrappers with DuckDB oracles live in
  * [[graft.queries.LlmOps]]; these take plain DataFrames so they compose
  * with any upstream source.
  */
object Corpus {

  /** Drop every training document sharing ANY `n`-gram with `bench` (the
    * standard eval-overlap filter; GPT-3 appendix C uses 13-grams).
    *
    * Scale shape: a benchmark is tiny by definition → its distinct n-gram
    * set broadcasts; the corpus explodes to (id, gram) ONCE and semi-joins
    * that broadcast, so the corpus itself never shuffles and nothing is
    * quadratic. Returns the surviving training rows, all columns. */
  def decontaminate(train: DataFrame, bench: DataFrame, n: Int,
                    idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    def grams(c: Column) = explode(TextOps.shingles(TextOps.tokens(c), n))
    val benchGrams = bench.select(grams(col(textCol)).as("__g")).distinct()
    val contaminated = train.select(col(idCol), grams(col(textCol)).as("__g"))
      .join(broadcast(benchGrams), Seq("__g"), "left_semi")
      .select(idCol).distinct()
    train.join(contaminated, Seq(idCol), "left_anti")
  }

  /** Keep a row iff `hash(id) mod 1000 < perMille(stratum)` — reproducible
    * hash-gated sampling with per-stratum rates (the corpus-mixing knob).
    * A narrow filter: zero shuffles, stable under re-partitioning and
    * re-runs, identical on every engine — unlike `TABLESAMPLE`/`rand()`. */
  def sampleStratified(docs: DataFrame, strataCol: String,
                       perMille: Seq[(String, Long)], defaultPerMille: Long,
                       idCol: String = "doc_id", salt: String = ":sample"): DataFrame = {
    val bucket = TextOps.hash60(concat(col(idCol).cast(StringType), lit(salt))) % 1000
    val rate = perMille.foldRight(lit(defaultPerMille): Column) {
      case ((s, r), acc) => when(col(strataCol) === s, lit(r)).otherwise(acc)
    }
    docs.filter(bucket < rate)
  }

  /** GPT-style sequence packing with boundary splitting: documents
    * concatenate in `orderCol` order and each gets the index of the
    * `windowTokens`-token context window its FIRST token lands in.
    * Packing is order-dependent, so the parallel unit is the `shardCol`
    * shard (cumulative sum per shard) — exactly how a 100 TB corpus packs;
    * never a global sort. Output adds `n_tokens` and `seq_id`. */
  def packSequences(docs: DataFrame, shardCol: String, orderCol: String,
                    windowTokens: Long, textCol: String = "text"): DataFrame = {
    val w = Window.partitionBy(shardCol).orderBy(orderCol)
      .rowsBetween(Window.unboundedPreceding, -1)
    docs
      .withColumn("n_tokens", size(TextOps.tokens(col(textCol))).cast(LongType))
      .withColumn("seq_id",
        coalesce(sum(col("n_tokens")).over(w), lit(0L)).divide(windowTokens)
          .cast(LongType))
  }
}
