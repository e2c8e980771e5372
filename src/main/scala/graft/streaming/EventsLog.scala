package graft.streaming

import org.apache.spark.sql.{SaveMode, SparkSession}

/** Per-batch load accounting (B7): the reference posts a `State` with
  * processed/successful row counts and status to its events log after every
  * batch (bulkerlib/bulker.go:153-176, batch_consumer.go:403-418,
  * eventslog/). The Spark rendering is an append-only parquet log — queryable
  * with the same engine that produced it; a warehouse/Redis sink is one
  * writer swap away.
  */
final case class LoadState(
    streamId: String,
    table: String,
    batchId: Long,
    status: String, // ok | failed | retried | dead_lettered
    rows: Long,
    error: String,
    tsMs: Long)

final case class EventsLog(dir: String) {

  def post(spark: SparkSession, state: LoadState): Unit = {
    import spark.implicits._
    Seq(state).toDF().write.mode(SaveMode.Append).parquet(dir)
  }

  def read(spark: SparkSession): Option[org.apache.spark.sql.DataFrame] =
    try {
      val fs = org.apache.hadoop.fs.FileSystem.get(
        new java.net.URI(dir), spark.sparkContext.hadoopConfiguration)
      if (fs.exists(new org.apache.hadoop.fs.Path(dir))) Some(spark.read.parquet(dir))
      else None
    } catch { case _: Throwable => None }
}
