package graft.http

import org.apache.spark.sql.SparkSession
import scala.jdk.CollectionConverters._
import graft.streaming.RetryQueue

/** Failed-events read-back (`bulkerapp/app/router.go:370-433`
  * `FailedHandler`): stream a destination's parked retry queue or its
  * dead-letter queue back to the operator as NDJSON — the first thing one
  * reaches for when loads fail. The reference replays the `retry.<dest>` /
  * dead-letter Kafka topic through a throwaway consumer; the Spark twin
  * reads the queue's parquet folder.
  *
  * Scale posture: the queues hold FAILURES plus bookkeeping, not the
  * firehose — bounded ops telemetry, like the events log. Rows stream
  * through `toJSON.toLocalIterator` (one partition in flight on the
  * driver, never a full materialization), ordered by batch then row so
  * replays are deterministic.
  */
object FailedReadback {

  val Statuses = Set("retry", "dead")

  /** NDJSON lines for `?status=retry|dead`; unknown status throws
    * IllegalArgumentException (the endpoint 400s). Ordering: batch id,
    * retry depth, then the first event column, so the stream is stable
    * across replays. */
  def lines(spark: SparkSession, queue: RetryQueue, status: String): Iterator[String] = {
    require(Statuses.contains(status),
      s"unknown status: $status (should be 'retry' or 'dead')")
    val frame = if (status == "retry") queue.queued(spark) else queue.dlq(spark)
    frame match {
      case None => Iterator.empty
      case Some(df) =>
        val orderCols = Seq("__batch_id", "__retries") ++
          df.columns.find(c => !c.startsWith("__")).toSeq
        df.orderBy(orderCols.map(org.apache.spark.sql.functions.col): _*)
          .toJSON.toLocalIterator().asScala
    }
  }
}
