package graft.core

import org.apache.spark.sql.functions._
import graft.SparkSuite

/** Physical-type-drift guard for `Tables.events` (the round-9 lesson).
  *
  * The driver regenerates /root/testdata between rounds and has already
  * switched `events.ts` from parquet TIMESTAMP(NANOS) to TIMESTAMP(MICROS,
  * isAdjustedToUTC=false). These specs write REAL parquet fixtures in every
  * encoding Spark can produce (long nanos — the nanosAsLong read shape —
  * TIMESTAMP_NTZ micros, and UTC-adjusted TIMESTAMP micros) and assert the
  * loader yields bit-identical `ts_ns`/`ts_ms`/`ts` for the same instants.
  * A final spec drives the loader over the actual driver testdata so an
  * encoding the fixtures don't model still fails HERE, not in 50 registry
  * queries at verify time.
  */
class TablesSpec extends SparkSuite {
  import spark.implicits._

  // instants with sub-ms micros to prove flooring, incl. a pre-epoch one
  private val microsInstants: Seq[Long] = Seq(
    0L,                      // epoch
    1704067200123456L,       // 2024-01-01T00:00:00.123456Z
    1704067200999999L,       // .999999 → floors to .999
    -123457L,                // pre-epoch, sub-second (floorDiv territory)
    4102444800000001L)       // 2100-01-01 + 1µs

  private def writeDir(): String =
    java.nio.file.Files.createTempDirectory("graft_tsfix_").toString

  /** Fixture rows with `ts` expressed from epoch-micros via the given column
    * transform, written to parquet, read back through Tables.events. */
  private def roundtrip(tsCol: org.apache.spark.sql.Column,
                        outputTsType: Option[String] = None): Seq[(Long, Long, Long, java.sql.Timestamp)] = {
    val dir = writeDir()
    val src = microsInstants.zipWithIndex
      .map { case (us, i) => (i.toLong, us) }.toDF("event_id", "us")
      .withColumn("ts", tsCol).drop("us")
    val writer = src.write.mode("overwrite")
    outputTsType.foreach(t => spark.conf.set("spark.sql.parquet.outputTimestampType", t))
    try writer.parquet(s"$dir/events.parquet")
    finally spark.conf.unset("spark.sql.parquet.outputTimestampType")
    Tables.events(spark, dir)
      .select($"event_id", $"ts_ns", $"ts_ms", $"ts")
      .collect().toSeq
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getTimestamp(3)))
      .sortBy(_._1)
  }

  private lazy val fromLongNanos =
    roundtrip(col("us") * lit(1000L))
  private lazy val fromNtzMicros =
    // NTZ wall time == the UTC rendering of the instant (driver semantics)
    roundtrip(timestamp_micros(col("us")).cast("timestamp_ntz"))
  private lazy val fromLtzMicros =
    roundtrip(timestamp_micros(col("us")), outputTsType = Some("TIMESTAMP_MICROS"))

  test("loader contract: long-nanos fixture yields floor-ms semantics") {
    val expected = microsInstants.zipWithIndex.map { case (us, i) =>
      val ns = us * 1000L
      val ms = Math.floorDiv(ns, 1000000L)
      (i.toLong, ns, ms)
    }.sortBy(_._1)
    assert(fromLongNanos.map(t => (t._1, t._2, t._3)) == expected)
  }

  test("TIMESTAMP_NTZ(micros) fixture reads identically to long nanos") {
    assert(fromNtzMicros == fromLongNanos)
  }

  test("UTC-adjusted TIMESTAMP(micros) fixture reads identically to long nanos") {
    assert(fromLtzMicros == fromLongNanos)
  }

  test("NTZ read is session-timezone independent") {
    val prev = spark.conf.get("spark.sql.session.timeZone")
    try {
      spark.conf.set("spark.sql.session.timeZone", "America/New_York")
      val shifted = roundtrip(
        // build the NTZ wall time arithmetically (no tz involved anywhere)
        // so the fixture itself doesn't depend on the session tz we just set
        expr("timestampadd(MICROSECOND, us, TIMESTAMP_NTZ '1970-01-01 00:00:00')"))
      assert(shifted.map(t => (t._1, t._2, t._3)) ==
        fromLongNanos.map(t => (t._1, t._2, t._3)))
    } finally spark.conf.set("spark.sql.session.timeZone", prev)
  }

  test("driver testdata (sf0.001) loads: ts_ns/ts_ms/ts present, typed, plausible") {
    val dir = "/root/testdata/sf0.001"
    assume(new java.io.File(s"$dir/events.parquet").exists())
    val ev = Tables.events(spark, dir)
    val dt = ev.schema.fields.map(f => f.name -> f.dataType.simpleString).toMap
    assert(dt("ts_ns") == "bigint" && dt("ts_ms") == "bigint" && dt("ts") == "timestamp")
    val probe = ev.select(
      count(lit(1)),
      sum(when($"ts_ms" =!= expr("ts_ns div 1000000"), 1L).otherwise(0L)),
      min(year($"ts")), max(year($"ts"))).collect()(0)
    assert(probe.getLong(0) > 0, "events table empty")
    assert(probe.getLong(1) == 0L, "ts_ms must be floor(ts_ns/1e6)")
    assert(probe.getInt(2) >= 2000 && probe.getInt(3) <= 2100,
      s"implausible event years ${probe.getInt(2)}..${probe.getInt(3)} — encoding drift?")
  }

  test("driver testdata: embeddings/documents physical types are what the operators assume") {
    // The driver REGENERATES /root/testdata between rounds and physical
    // encodings have drifted before (events.ts). The vector kernels
    // (CosineSim, MinHashSig consumers, SQ8/PQ) and every oracle assume
    // FLOAT[] embeddings and ASCII VARCHAR text — if a regeneration drifts
    // these, fail HERE with a pointer instead of as 90 hash mismatches.
    val dir = "/root/testdata/sf0.001"
    assume(new java.io.File(s"$dir/embeddings.parquet").exists())
    val emb = Tables.embeddings(spark, dir)
    assert(emb.schema("embedding").dataType.simpleString == "array<float>",
      s"embedding dtype drifted to ${emb.schema("embedding").dataType.simpleString} — " +
        "add an encoding-agnostic branch in Tables.embeddings (see Tables.events)")
    assert(emb.schema("vec_id").dataType.simpleString == "bigint")
    val docs = Tables.documents(spark, dir)
    assert(docs.schema("text").dataType.simpleString == "string")
    // ASCII contract: mm/blockhash oracles use ord(substr(...)) as BYTE value
    val nonAscii = docs.filter(not($"text".rlike("^[\\x00-\\x7F]*$"))).count()
    assert(nonAscii == 0L,
      s"$nonAscii docs contain non-ASCII text — byte-level oracles (ord=byte) now diverge")
  }
}
