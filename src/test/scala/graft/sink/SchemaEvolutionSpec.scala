package graft.sink

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions.col
import graft.core.DataKind
import graft.sql.{ColumnSpec, TableSpec}
import graft.SparkSuite

/** Schema evolution against a live table spec (abstract.go:422-553):
  * existing-type-wins casts, `_unmapped_data` overflow, schemaFreeze,
  * maxColumns — the schema_freeze_test.go / existing_table_test.go family. */
class SchemaEvolutionSpec extends SparkSuite {

  private val existing = TableSpec("t", Seq(
    ColumnSpec("id", DataKind.Int64), ColumnSpec("m", DataKind.Int64)))

  test("convertible values cast to the existing type") {
    val batch = df("id BIGINT, m STRING", Seq(Row(1L, "42")))
    val out = SchemaEvolution.evolve(batch, existing).projected
    assert(canon(out) == Seq(Seq("1", "42", "∅")))
    assert(out.schema("m").dataType == org.apache.spark.sql.types.LongType)
  }

  test("unconvertible values null the column and land in _unmapped_data") {
    val batch = df("id BIGINT, m STRING", Seq(Row(1L, "not-a-number")))
    val out = SchemaEvolution.evolve(batch, existing).projected
    assert(canon(out) == Seq(Seq("1", "∅", """{"m":"not-a-number"}""")))
  }

  test("new columns are added with their batch kind") {
    val batch = df("id BIGINT, extra DOUBLE", Seq(Row(1L, 2.5)))
    val plan = SchemaEvolution.evolve(batch, existing)
    assert(plan.newColumns == Seq(ColumnSpec("extra", DataKind.Float64)))
    assert(plan.projected.columns.toSeq == Seq("id", "m", "extra", "_unmapped_data"))
  }

  test("schemaFreeze: new columns rejected, values routed to _unmapped_data") {
    val batch = df("id BIGINT, extra DOUBLE", Seq(Row(1L, 2.5)))
    val plan = SchemaEvolution.evolve(batch, existing, schemaFreeze = true)
    assert(plan.newColumns.isEmpty)
    assert(canon(plan.projected.select("_unmapped_data")) == Seq(Seq("""{"extra":"2.5"}""")))
  }

  test("maxColumns cap: columns beyond the cap overflow, not added") {
    val batch = df("id BIGINT, m BIGINT, c1 BIGINT, c2 BIGINT", Seq(Row(1L, 2L, 3L, 4L)))
    val plan = SchemaEvolution.evolve(batch, existing, maxColumns = 3)
    assert(plan.newColumns.map(_.name) == Seq("c1"))
    assert(canon(plan.projected.select("_unmapped_data")) == Seq(Seq("""{"c2":"4"}""")))
  }

  test("existing columns absent from the batch null-fill") {
    val batch = df("id BIGINT", Seq(Row(1L)))
    val out = SchemaEvolution.evolve(batch, existing).projected
    assert(canon(out) == Seq(Seq("1", "∅", "∅")))
  }

  test("a live _unmapped_data column does NOT duplicate on later batches") {
    val live = TableSpec("t", existing.columns :+ ColumnSpec("_UNMAPPED_DATA", DataKind.Json))
    val batch = df("id BIGINT, m STRING", Seq(Row(1L, "x")))
    val out = SchemaEvolution.evolve(batch, live).projected
    assert(out.columns.count(_.equalsIgnoreCase("_unmapped_data")) == 1)
    // and it takes the LIVE table's spelling
    assert(out.columns.contains("_UNMAPPED_DATA"))
  }

  test("incoming _unmapped_data values carry through when no fresh overflow") {
    val live = TableSpec("t", existing.columns :+ ColumnSpec("_unmapped_data", DataKind.Json))
    val batch = df("id BIGINT, m BIGINT, _unmapped_data STRING",
      Seq(Row(1L, 2L, """{"old":"v"}""")))
    val out = SchemaEvolution.evolve(batch, live).projected
    assert(canon(out.select("_unmapped_data")) == Seq(Seq("""{"old":"v"}""")))
  }

  test("date-string into existing TIMESTAMP column casts (abstract.go:500-511)") {
    val liveTs = TableSpec("t", Seq(ColumnSpec("id", DataKind.Int64),
      ColumnSpec("ts", DataKind.Timestamp)))
    val batch = df("id BIGINT, ts STRING", Seq(Row(1L, "2024-01-02 03:04:05")))
    val out = SchemaEvolution.evolve(batch, liveTs).projected
    assert(out.schema("ts").dataType == org.apache.spark.sql.types.TimestampType)
    assert(canon(out.select(col("ts").cast("string"))) == Seq(Seq("2024-01-02 03:04:05")))
  }
}
