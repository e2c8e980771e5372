package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** In-batch primary-key deduplication.
  *
  * Reference semantics (implementations/sql/abstract_transactional.go:439-496):
  * while a batch accumulates, rows are keyed by PK; a later occurrence wins,
  * unless a `discriminatorField` is set, in which case the row with the
  * highest discriminator wins and ties fall to the newest row.
  *
  * Spark-first rendering: a `max_by` hash aggregate keyed on the PK —
  * a single map-side-combinable shuffle, no driver-side state, no window
  * sort. At 100 TB this is the canonical "keep one row per key" plan:
  * shuffle once on pk, no join, hot keys collapse before the exchange.
  */
object Dedup {

  /** Keep exactly one row per `pk`:
    *   - highest `discriminators` (in order) wins;
    *   - ties (or no discriminator) → highest `arrival` (newest) wins.
    *
    * When no explicit `arrival` column is given, an arrival sequence is
    * stamped from the incoming partition layout BEFORE the pk shuffle
    * (monotonically_increasing_id over the source order), which reproduces
    * the reference's "later occurrence wins" for any source with a stable
    * read order (files, Kafka offsets). Callers with a real arrival column
    * (offset, line number) should pass it for cross-run determinism.
    */
  def inBatch(df: DataFrame, pk: Seq[String],
              discriminators: Seq[String] = Nil,
              arrival: Option[Column] = None): DataFrame = {
    // Stamp arrival order on the un-shuffled input: after the pk shuffle
    // the id would reflect shuffle layout, not source order.
    val arrCol = "__graft_arrival"
    val stamped = arrival match {
      case Some(a) => df.withColumn(arrCol, a)
      case None    => df.withColumn(arrCol, monotonically_increasing_id())
    }
    // max_by keeps the winning row per pk in ONE map-side combinable
    // aggregate — a hot key (one entity hammered by updates) collapses per
    // input partition instead of routing every occurrence through one
    // reducer's window sort (the same skew discipline as [[exact]]). The
    // ordering key replays `desc_nulls_last` per discriminator —
    // (isNotNull, value) maximized puts non-null above null — with the
    // arrival stamp as the newest-wins tiebreak.
    val key = struct(
      discriminators.flatMap(c => Seq(col(c).isNotNull, col(c))) :+ col(arrCol): _*)
    val cols = df.columns.toSeq
    stamped.groupBy(pk.map(col): _*)
      .agg(max_by(struct(cols.map(col): _*), key).as("__row"))
      .select(cols.map(c => col("__row").getField(c).as(c)): _*)
  }

  /** Exact duplicate detection on arbitrary content columns: groups rows by a
    * collision-free hash of `contentCols` and keeps the row with the smallest
    * `keepBy`. Returns the survivors plus the duplicate count per group.
    *
    * The hash encodes each column null-tagged inside a JSON struct so that
    * ("ab","c"), ("a","bc") and ("abc", NULL) hash differently — a bare
    * separator-less concat would collide and silently delete distinct rows.
    */
  def exact(df: DataFrame, contentCols: Seq[String], keepBy: String): DataFrame = {
    val h = contentHash(contentCols)
    // min_by keeps the smallest-keepBy row per content group in ONE
    // MAP-SIDE COMBINABLE aggregate: an N-doc identical-text clique
    // (boilerplate pages, license stubs) collapses to one candidate row per
    // input partition BEFORE the shuffle. The previous row_number window
    // shuffled every clique member to one reducer and sorted N rows there —
    // the skew that makes giant cliques a scale-killer (SkewStressSpec
    // plants one and pins this stage's collapse).
    val cols = df.columns.toSeq
    df.groupBy(h.as("__h"))
      // null-safe ordering key: min_by SKIPS rows whose key is null, so a
      // group with an all-NULL keepBy would collapse to an all-NULL payload;
      // (isNotNull, keepBy) is never null and ranks null keepBy FIRST
      // (false < true) — the window form's asc_nulls_first election
      .agg(min_by(struct(cols.map(col): _*),
          struct(col(keepBy).isNotNull, col(keepBy))).as("__row"),
        count(lit(1)).as("dup_count"))
      .select(cols.map(c => col("__row").getField(c).as(c)) :+ col("dup_count"): _*)
  }

  /** Collision-free content fingerprint: JSON-encodes the columns (null vs
    * empty vs boundary-shift all distinct) then md5s the text. Stays inside
    * whole-stage codegen (to_json + md5 are both codegen'd). */
  def contentHash(contentCols: Seq[String]): Column =
    md5(to_json(struct(contentCols.map(col): _*)))
}
