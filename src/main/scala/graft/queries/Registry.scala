package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One driver-checkable query: a Spark implementation plus (where the
  * semantics are ANSI-SQL-expressible) a DuckDB oracle over the same parquet
  * tables. Column names/types must agree exactly between the two. */
final case class Q(fn: (SparkSession, String) => DataFrame, oracle: Option[String])

object Registry {
  def all: Map[String, Q] = Relational.qs ++ EltOps.qs ++ LlmOps.qs ++ SketchOps.qs ++ SinkOps.qs ++ StreamOps.qs ++ EventOps.qs ++ BpeOps.qs ++ FilterOps.qs ++ PqOps.qs ++ GraphOps.qs ++ AirbyteOps.qs ++ ReprocessOps.qs
}
