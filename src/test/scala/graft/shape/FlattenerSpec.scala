package graft.shape

import graft.SparkSuite

/** JSON flattening (T1, implementations/flattener.go:41-151) through the
  * public Ingest entry: nesting, arrays, empty keys, path collisions,
  * not-flattening targets. Mirrors the reference's `nested` fixture family. */
class FlattenerSpec extends SparkSuite {

  test("nested objects flatten with underscore-joined keys") {
    val out = jsonDf("""{"a":{"b":{"c":1}},"top":2}""").df
    assert(out.columns.toSeq == Seq("a_b_c", "top"))
    assert(canon(out) == Seq(Seq("1", "2")))
  }

  test("arrays stringify to JSON text") {
    val out = jsonDf("""{"tags":["x","y"],"n":1}""").df
    assert(canon(out.select("tags")) == Seq(Seq("""["x","y"]""")))
  }

  test("array of objects stringifies too") {
    val out = jsonDf("""{"items":[{"a":1},{"a":2}]}""").df
    assert(canon(out) == Seq(Seq("""[{"a":1},{"a":2}]""")))
  }

  test("empty key becomes _unnamed (flattener.go:48-52)") {
    val out = jsonDf("""{"":7,"x":1}""").df
    assert(out.columns.contains("_unnamed"))
    assert(canon(out.select("_unnamed")) == Seq(Seq("7")))
  }

  test("path collision {a:{b}} vs {a_b}: one column, last non-null value wins") {
    val out = jsonDf(
      """{"a":{"b":1}}""",
      """{"a_b":2}""").df
    assert(out.columns.count(_ == "a_b") == 1)
    assert(canon(out.select("a_b")) == Seq(Seq("1"), Seq("2")))
  }

  test("a __sql_type_ hint suppresses flattening of its object (T5)") {
    val shaped = jsonDf("""{"id":1,"payload":{"k":1,"s":"x"},"__sql_type_payload":"json"}""")
    assert(shaped.df.columns.toSeq == Seq("id", "payload"))
    assert(canon(shaped.df.select("payload")) == Seq(Seq("""{"k":1,"s":"x"}""")))
    assert(shaped.hints.map(h => (h.target, h.castType)) == Seq(("payload", "json")))
  }

  test("hint with [castType, ddlType] array — comma-bearing DDL survives") {
    val shaped = jsonDf(
      """{"v":"1.5","__sql_type_v":["string","numeric(38,18)"]}""")
    assert(shaped.hints.map(h => (h.target, h.castType, h.ddlType)) ==
      Seq(("v", "string", Some("numeric(38,18)"))))
  }

  test("map-typed columns stringify to JSON like arrays do") {
    import org.apache.spark.sql.functions._
    val in = spark.range(1).select(
      lit(1L).as("id"),
      map(lit("k1"), lit("v1"), lit("k2"), lit("v2")).as("attrs"))
    val out = graft.shape.Ingest.shapeDf(in).df
    assert(out.schema("attrs").dataType == org.apache.spark.sql.types.StringType)
    assert(canon(out.select("attrs")) == Seq(Seq("""{"k1":"v1","k2":"v2"}""")))
  }

  test("deep nesting flattens fully and keeps sibling order") {
    val out = jsonDf("""{"a":{"x":1,"y":{"z":2}},"b":3}""").df
    assert(out.columns.toSeq == Seq("a_x", "a_y_z", "b"))
  }
}
