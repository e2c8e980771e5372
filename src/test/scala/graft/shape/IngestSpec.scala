package graft.shape

import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._
import graft.core.DataKind
import graft.SparkSuite

/** The shaping pipeline end-to-end over adversarial NDJSON — the reference's
  * types.ndjson / types_collision / date_mix / schema_option fixture
  * semantics (bulker_test.go:291 matrix, types_test.go:16). */
class IngestSpec extends SparkSuite {
  import spark.implicits._

  private def shapeOf(opts: Ingest.ShapeOptions, lines: String*): Ingest.Shaped =
    Ingest.shape(spark, lines.toSeq.toDS(), opts)

  test("types: bool/int/float/string/timestamp infer per batch") {
    val out = jsonDf(
      """{"b":true,"i":1,"f":1.5,"s":"x","t":"2024-01-02 03:04:05"}""").df
    val types = out.schema.fields.map(f => f.name -> f.dataType).toMap
    assert(types("b") == BooleanType)
    assert(types("i") == LongType)
    assert(types("f") == DoubleType)
    assert(types("s") == StringType)
    assert(types("t") == TimestampType) // sniffed from the string shape
  }

  test("type collision int+float widens to double (LCA)") {
    val out = jsonDf("""{"m":1}""", """{"m":1.5}""").df
    assert(out.schema("m").dataType == DoubleType)
    assert(canon(out) == Seq(Seq("1.0"), Seq("1.5")))
  }

  test("type collision number+string widens to string (LCA root)") {
    val out = jsonDf("""{"m":1}""", """{"m":"x"}""").df
    assert(out.schema("m").dataType == StringType)
  }

  test("type collision bool+int resolves DOWN the lattice to INT64 (converter.go:13-34)") {
    val out = jsonDf("""{"m":true}""", """{"m":3}""", """{"m":false}""").df
    assert(out.schema("m").dataType == LongType)
    assert(canon(out) == Seq(Seq("0"), Seq("1"), Seq("3")))
  }

  test("type collision bool+float resolves to FLOAT64") {
    val out = jsonDf("""{"m":true}""", """{"m":1.5}""").df
    assert(out.schema("m").dataType == DoubleType)
    assert(canon(out) == Seq(Seq("1.0"), Seq("1.5")))
  }

  test("quoted digit strings STAY strings (no bool/number mix — reference keeps quoted values)") {
    val out = jsonDf("""{"zip":"01234"}""", """{"zip":"99999"}""").df
    assert(out.schema("zip").dataType == StringType)
    assert(canon(out) == Seq(Seq("01234"), Seq("99999")))
  }

  test("quoted bool strings STAY strings") {
    val out = jsonDf("""{"b":"true"}""", """{"b":"false"}""").df
    assert(out.schema("b").dataType == StringType)
  }

  test("date_mix: a column with one non-timestamp value stays string") {
    val out = jsonDf(
      """{"w":"2024-01-02 03:04:05"}""",
      """{"w":"not a date"}""").df
    assert(out.schema("w").dataType == StringType)
  }

  test("all-null column is dropped under omitNils (default)") {
    val out = jsonDf("""{"a":1,"gone":null}""", """{"a":2,"gone":null}""").df
    assert(out.columns.toSeq == Seq("a"))
  }

  test("omitNils=false keeps the null column") {
    val out = shapeOf(Ingest.ShapeOptions(omitNils = false),
      """{"a":1,"gone":null}""").df
    assert(out.columns.contains("gone"))
  }

  test("identifiers sanitize and collide-last like the reference corpus") {
    val out = jsonDf("""{"$part key!":5,"café":6}""").df
    assert(out.columns.toSeq.sorted == Seq("$part key_", "café"))
  }

  test("length-truncation collisions also merge (63-char cap, naming_test.go corpus)") {
    val prefix = "p" * 70 // truncates to the same 63-char identifier
    val out = jsonDf(s"""{"${prefix}_a":1,"${prefix}_b":2}""").df
    assert(out.columns.length == 1)
    assert(out.columns.head.length == 63)
    assert(canon(out) == Seq(Seq("2"))) // last writer wins
  }

  test("sanitization collisions merge to ONE column, last writer wins") {
    // "a!" and "a?" both sanitize to "a_" — the reference's ordered-map put
    // keeps the later field; two same-named columns would poison every
    // downstream select
    val out = jsonDf("""{"a!":1,"a?":2,"x":0}""").df
    assert(out.columns.count(_ == "a_") == 1)
    assert(canon(out.select("a_")) == Seq(Seq("2")))
  }

  test("maxColumns overflow routes to _unmapped_data, never drops (abstract.go:422-553)") {
    val out = shapeOf(Ingest.ShapeOptions(maxColumns = 2),
      """{"a":1,"b":2,"c":3,"d":4}""").df
    assert(out.columns.toSeq == Seq("a", "b", "_unmapped_data"))
    assert(canon(out.select("_unmapped_data")) == Seq(Seq("""{"c":"3","d":"4"}""")))
  }

  test("columnTypes stream option overrides the inferred kind (options.go:13-39)") {
    val out = shapeOf(Ingest.ShapeOptions(columnTypes = Map("n" -> DataKind.Int64)),
      """{"n":"1,234"}""").df
    assert(out.schema("n").dataType == LongType)
    assert(canon(out) == Seq(Seq("1234")))
  }

  test("declaredFields are excluded from flattening (options.go:149-166)") {
    val out = shapeOf(Ingest.ShapeOptions(declaredFields = Seq("obj")),
      """{"obj":{"a":1},"x":2}""").df
    assert(out.columns.toSeq.sorted == Seq("obj", "x"))
    assert(canon(out.select("obj")) == Seq(Seq("""{"a":1}""")))
  }

  test("case normalization applies before sanitization (T3)") {
    val out = shapeOf(Ingest.ShapeOptions(caseMode = Names.LowerCase),
      """{"MiXeD":1}""").df
    assert(out.columns.toSeq == Seq("mixed"))
  }

  test("known timestamp field names convert even in MIXED columns (converter.go:36-44)") {
    val out = jsonDf(
      """{"_timestamp":"2024-01-02 03:04:05","id":1}""",
      """{"_timestamp":"not a date","id":2}""").df
    assert(out.schema("_timestamp").dataType == TimestampType)
    // the parsing value converts, the junk value nulls
    assert(canon(out.select(col("id"), col("_timestamp").cast("string"))) == Seq(
      Seq("1", "2024-01-02 03:04:05"), Seq("2", "∅")))
    // an ORDINARY mixed column stays string (the lattice: TS ∨ STRING = STRING)
    val out2 = jsonDf("""{"w":"2024-01-02 03:04:05"}""", """{"w":"junk"}""").df
    assert(out2.schema("w").dataType == StringType)
  }

  test("known timestamp layouts parse; sub-second precision survives") {
    val out = jsonDf("""{"t":"2024-01-02T03:04:05.123456+00:00"}""").df
    assert(out.schema("t").dataType == TimestampType)
    assert(canon(out) == Seq(Seq("2024-01-02 03:04:05.123456")))
  }
}
