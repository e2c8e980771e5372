package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** In-batch primary-key deduplication.
  *
  * Reference semantics (implementations/sql/abstract_transactional.go:439-496):
  * while a batch accumulates, rows are keyed by PK; a later occurrence wins,
  * unless a `discriminatorField` is set, in which case the row with the
  * highest discriminator wins and ties fall to the newest row.
  *
  * Spark-first rendering: a window `row_number` partitioned by the PK —
  * a single hash-shuffle on the PK columns, map-side combinable by AQE, no
  * driver-side state. At 100 TB this is the canonical "keep one row per key"
  * plan: shuffle once on pk, no join, skew handled by AQE.
  */
object Dedup {

  /** Keep exactly one row per `pk`:
    *   - highest `discriminators` (in order) wins;
    *   - ties (or no discriminator) → highest `arrivalCol` (newest) wins.
    *
    * `arrivalCol` defaults to a synthetic arrival sequence when the frame
    * already carries one; callers on unordered batches should pass an
    * explicit tiebreak column for determinism.
    */
  def inBatch(df: DataFrame, pk: Seq[String],
              discriminators: Seq[String] = Nil,
              arrival: Option[Column] = None): DataFrame = {
    val order: Seq[Column] =
      discriminators.map(c => col(c).desc_nulls_last) ++ arrival.map(_.desc)
    val ord = if (order.nonEmpty) order else Seq(monotonically_increasing_id().desc)
    val w = Window.partitionBy(pk.map(col): _*).orderBy(ord: _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Exact duplicate detection on arbitrary content columns: groups rows by a
    * stable hash of `contentCols` and keeps the row with the smallest
    * `keepBy`. Returns the survivors plus the duplicate count per group. */
  def exact(df: DataFrame, contentCols: Seq[String], keepBy: String): DataFrame = {
    val h = md5(concat_ws("", contentCols.map(col): _*))
    val w = Window.partitionBy(h)
    val ordered = Window.partitionBy(h).orderBy(col(keepBy).asc)
    df.withColumn("__grp_n", count(lit(1)).over(w))
      .withColumn("__rn", row_number().over(ordered))
      .filter(col("__rn") === 1)
      .withColumnRenamed("__grp_n", "dup_count")
      .drop("__rn")
  }
}
