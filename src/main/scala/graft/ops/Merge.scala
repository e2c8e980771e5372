package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Cross-batch merge (upsert) with an optional merge window.
  *
  * Reference semantics: `CopyTables(target, tmp, mergeWindow)` issues a
  * per-warehouse MERGE / DELETE-USING / ON CONFLICT statement keyed on the PK
  * (implementations/sql/sql_adapter.go:42; e.g. bigquery.go:197-267,
  * redshift.go:260-309). The merge window (options.go:41-45, default 365 d)
  * restricts which *target* rows are eligible for replacement:
  * `T.ts >= now - window` becomes a partition-pruning predicate, so old
  * duplicates outside the window survive.
  *
  * Spark-first rendering for lake-style targets: an anti-join of the target
  * against the source keys (restricted to the window) unioned with the
  * deduplicated source. The source-key side is small relative to the target
  * (one batch vs the full table) → broadcast the key set; the target is
  * never shuffled, and on a partitioned table the window predicate prunes
  * partitions before the join. For warehouse targets the SQL text is
  * generated instead (graft.sql.Dialect#mergeInto).
  */
object Merge {

  /** Upsert `source` into `target` on `pk`. Rows of `target` whose pk appears
    * in `source` AND which fall inside the merge window are replaced; the
    * remainder of `target` is kept; all `source` rows are inserted.
    * `source` must already be pk-unique (run Dedup.inBatch first). */
  def upsert(target: DataFrame, source: DataFrame, pk: Seq[String],
             window: Option[Column] = None): DataFrame = {
    val keys = broadcast(source.select(pk.map(col): _*).distinct())
    val eligible = window.getOrElse(lit(true))
    val joined = target.join(keys, pk, "left_anti")
    val kept = window match {
      case None => joined
      case Some(_) =>
        // outside the window: keep even when the pk matches the source
        target.filter(!eligible).unionByName(
          target.filter(eligible).join(keys, pk, "left_anti"))
    }
    kept.unionByName(source.select(target.columns.map(col): _*))
  }

  /** Effective merge window (transactional_stream.go:91-100): shrink the
    * configured window to `ceil(now - min(batch ts))` days, clamped to
    * [1, window]. Computes the min without a separate job by letting the
    * caller pass the already-known batch minimum. */
  def effectiveWindowDays(configuredDays: Int, batchMinTsMs: Long, nowMs: Long): Int = {
    val daysBack = math.ceil((nowMs - batchMinTsMs).toDouble / 86400000d).toInt
    math.max(1, math.min(configuredDays, daysBack))
  }
}
