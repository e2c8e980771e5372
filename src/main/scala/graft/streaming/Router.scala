package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** Event routing (B5): the reference maintains one Kafka topic per
  * (destination, mode, table) — `in.id.<dest>.m.<mode>.t.<table>` — and a
  * consumer per topic (bulkerapp/app/topic_manager.go:726-787,167-423).
  *
  * The Spark-native inversion: ONE stream carries all events; each
  * micro-batch fans out by the routing column inside `foreachBatch`. The
  * distinct-table probe is control-plane (bounded by the table universe, not
  * the row count); each per-table slice flows through the distributed load
  * path. At 100 TB the slice filters all read one shuffle-free scan of the
  * cached batch.
  */
object Router {

  /** Fan one batch out by `tableCol`: `load(table, slice)` per distinct
    * routing value. Rows with a NULL table route to `defaultTable`. */
  def routeBatch(df: DataFrame, tableCol: String, defaultTable: String)
                (load: (String, DataFrame) => Unit): Unit = {
    val batch = df.persist()
    try {
      val tables = batch.select(tableCol).distinct().collect()
        .map(r => Option(r.getString(0)).getOrElse(defaultTable)).distinct.sorted
      tables.foreach { t =>
        val slice =
          if (t == defaultTable)
            batch.filter(col(tableCol).isNull || col(tableCol) === t)
          else batch.filter(col(tableCol) === t)
        load(t, slice.drop(tableCol))
      }
    } finally { batch.unpersist(); () }
  }
}
