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
  * deduplicated source. The target is never shuffled when the key side is
  * broadcast, and on a partitioned table the window predicate prunes
  * partitions before the join. For warehouse targets the SQL text is
  * generated instead (see graft.sql.Dialect).
  */
object Merge {

  /** Above this estimated source-key count the broadcast is skipped and the
    * anti-join falls back to a shuffle join — a backfill-sized source would
    * otherwise blow up the driver (micro-batches broadcast; backfills shuffle). */
  val BroadcastKeyLimit = 2L * 1000 * 1000

  /** Upsert `source` into `target` on `pk`. Rows of `target` whose pk appears
    * in `source` AND which fall inside the merge window are replaced; the
    * remainder of `target` is kept; all `source` rows are inserted.
    * `source` must already be pk-unique (run Dedup.inBatch first).
    *
    * A NULL window predicate (e.g. null timestamp on a target row) counts as
    * OUTSIDE the window — the row is kept, never silently dropped: the
    * reference's merge window only restricts which rows may be replaced.
    *
    * `sourceKeyCountHint`: pass the (approximate) source row count when known
    * — a count at or under [[BroadcastKeyLimit]] forces a broadcast of the
    * key set. With NO hint the SAFE path is taken: a plain join, letting AQE
    * convert it to broadcast at runtime if the key side turns out small. A
    * forced broadcast of an unhinted backfill-sized source would OOM the
    * driver; AQE's runtime decision costs nothing and is never wrong.
    */
  def upsert(target: DataFrame, source: DataFrame, pk: Seq[String],
             window: Option[Column] = None,
             sourceKeyCountHint: Option[Long] = None): DataFrame = {
    val keyDf = source.select(pk.map(col): _*).distinct()
    val keys =
      if (sourceKeyCountHint.exists(_ <= BroadcastKeyLimit)) broadcast(keyDf)
      else keyDf
    val kept = window match {
      case None => target.join(keys, pk, "left_anti")
      case Some(w) =>
        // NULL window predicate == outside the window == not replaceable.
        val inWin = coalesce(w, lit(false))
        target.filter(!inWin).unionByName(
          target.filter(inWin).join(keys, pk, "left_anti"))
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
