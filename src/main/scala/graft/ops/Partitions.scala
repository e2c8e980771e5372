package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Set-level replacement operators.
  *
  * - ReplacePartition (implementations/sql/replacepartition_stream.go:78-161):
  *   every incoming row is stamped with `__partition_id`; on commit the
  *   target partition is cleared and the batch appended — an empty batch
  *   still clears the partition.
  * - ReplaceTable (replacetable_stream.go:51-117): load to a tmp table then
  *   atomically swap; an empty batch truncates.
  * - Delete/Truncate (sql_adapter_base.go:299-411).
  * - Date granularity (delete_condition.go:64-187).
  *
  * On a lake table ReplacePartition is `INSERT OVERWRITE` with dynamic
  * partition overwrite (`spark.sql.sources.partitionOverwriteMode=dynamic`)
  * — only the touched partitions rewrite, which is the 100 TB-safe path.
  * The DataFrame-level forms below express the same final state for the
  * correctness oracle.
  */
object Partitions {

  val PartitionCol = "__partition_id"

  /** Stamp a batch with its partition id (replacepartition_stream.go:78-83). */
  def stamp(batch: DataFrame, partitionId: String): DataFrame =
    batch.withColumn(PartitionCol, lit(partitionId))

  /** Final state of the target after replacing one partition. */
  def replacePartition(target: DataFrame, batch: DataFrame, partitionId: String): DataFrame =
    target.filter(col(PartitionCol) =!= lit(partitionId))
      .unionByName(stamp(batch.drop(PartitionCol), partitionId))

  /** Final state after ReplaceTable: the new batch, whatever was there before. */
  def replaceTable(target: DataFrame, batch: DataFrame): DataFrame = batch

  /** DELETE FROM target WHERE cond. */
  def delete(target: DataFrame, cond: Column): DataFrame = target.filter(!cond)

  /** Date-granularity truncation (delete_condition.go:64-187): HOUR, DAY,
    * WEEK, MONTH, QUARTER, YEAR. Spark `date_trunc` implements all of them. */
  def truncate(ts: Column, granularity: String): Column = {
    val g = granularity.toUpperCase match {
      case "HOUR" => "hour"; case "DAY" => "day"; case "WEEK" => "week"
      case "MONTH" => "month"; case "QUARTER" => "quarter"; case "YEAR" => "year"
      case other => other.toLowerCase
    }
    date_trunc(g, ts)
  }
}
