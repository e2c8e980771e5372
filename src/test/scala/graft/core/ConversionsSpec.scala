package graft.core

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.SparkSuite

/** Value conversions along the typecast tree (types/converter.go:45-365,
  * timestamp sniff guards datatype.go:169-215). */
class ConversionsSpec extends SparkSuite {
  import spark.implicits._

  private def sniff(ss: String*): Seq[Option[String]] =
    ss.toSeq.toDF("v")
      .select(Conversions.sniffTimestamp(col("v")).cast("string"))
      .collect().toSeq.map(r => Option(r.getString(0)))

  test("timestamp sniff accepts the reference layouts") {
    val r = sniff(
      "2024-01-02T03:04:05.123Z",
      "2024-01-02T03:04:05+02:00",
      "2024-01-02 03:04:05",
      "1999-12-31 23:59:59")
    assert(r.forall(_.isDefined), r)
    assert(r.head.get.startsWith("2024-01-02 03:04:05"))
  }

  test("timestamp sniff guards: length 19..35 and first char 1|2") {
    assert(sniff("2024-01-02").head.isEmpty)          // too short (10)
    assert(sniff("3024-01-02 03:04:05").head.isEmpty) // first char '3'
    assert(sniff("not a timestamp here").head.isEmpty)
    assert(sniff("12345678901234567890").head.isEmpty) // right shape, not a date
  }

  test("string to number accepts comma/space grouping") {
    val r = Seq("1,234", "1 234 567", "x").toDF("v")
      .select(Conversions.stringToLong(col("v"))).collect().toSeq
    assert(r.map(x => if (x.isNullAt(0)) -1L else x.getLong(0)) == Seq(1234L, 1234567L, -1L))
  }

  test("anyToBoolean maps 1/0/true/false in any case") {
    val r = Seq("1", "0", "true", "FALSE", "True", "yes").toDF("v")
      .select(Conversions.anyToBoolean(col("v"))).collect().toSeq
      .map(x => if (x.isNullAt(0)) null else x.getBoolean(0))
    assert(r == Seq(true, false, true, false, true, null))
  }

  test("float to int only when integral (else null → unmapped route)") {
    val r = Seq(3.0, 3.5).toDF("v")
      .select(Conversions.doubleToLongIfIntegral(col("v"))).collect().toSeq
    assert(!r(0).isNullAt(0) && r(0).getLong(0) == 3L)
    assert(r(1).isNullAt(0))
  }

  test("timestamps format as RFC3339-millis on the way to text") {
    val r = df("ts TIMESTAMP", Seq(Row(java.sql.Timestamp.valueOf("2024-01-02 03:04:05.007"))))
      .select(Conversions.toText(col("ts"), DataKind.Timestamp)).collect()(0).getString(0)
    assert(r == "2024-01-02T03:04:05.007Z")
  }

  test("NUL bytes strip for text-typed sinks (postgres.go:122-149)") {
    val r = Seq(("a" + "\u0000" + "b")).toDF("v")
      .select(Conversions.stripNulBytes(col("v"))).collect()(0).getString(0)
    assert(r == "ab")
  }

  test("composite pk joins with the reference separator") {
    val r = Seq(("a", "b")).toDF("x", "y")
      .select(Conversions.compositePk(Seq(col("x"), col("y")))).collect()(0).getString(0)
    assert(r == "a_###_b")
  }

  test("convert matrix: the value-level lattice edges") {
    val r1 = Seq("2024-01-02 03:04:05").toDF("v")
      .select(Conversions.convert(col("v"), DataKind.Str, DataKind.Timestamp).cast("string"))
      .collect()(0).getString(0)
    assert(r1.startsWith("2024-01-02 03:04:05"))
    val r2 = Seq(true).toDF("v")
      .select(Conversions.convert(col("v"), DataKind.Bool, DataKind.Int64)).collect()(0).getLong(0)
    assert(r2 == 1L)
    val r3 = Seq(7L).toDF("v")
      .select(Conversions.convert(col("v"), DataKind.Int64, DataKind.Bool)).collect()(0).getBoolean(0)
    assert(r3 == true)
  }
}
