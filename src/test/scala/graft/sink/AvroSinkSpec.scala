package graft.sink

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{Row, SaveMode}
import org.apache.spark.sql.types._
import graft.SparkSuite

/** Avro container-file leg of the K8 sink (types/marshaller.go:309-325):
  * schema mapping, value conversion, container conformance, and the
  * FileSink integration — all against the `org.apache.avro` core library
  * that ships with Spark. */
class AvroSinkSpec extends SparkSuite {

  private def tmp(): String =
    Files.createTempDirectory("graft_avro_").toString

  private val allTypes = StructType(Seq(
    StructField("l", LongType), StructField("i", IntegerType),
    StructField("d", DoubleType), StructField("f", FloatType),
    StructField("b", BooleanType), StructField("s", StringType),
    StructField("bin", BinaryType), StructField("ts", TimestampType),
    StructField("dt", DateType)))

  private def allTypesData = {
    val ts = java.sql.Timestamp.from(java.time.Instant.parse("2024-03-01T12:34:56.789012Z"))
    val dt = java.sql.Date.valueOf("2024-03-01")
    spark.createDataFrame(
      java.util.List.of(
        Row(7L, 42, 2.5, 1.25f, true, "héllo", Array[Byte](1, 2, -3), ts, dt),
        Row(null, null, null, null, null, null, null, null, null),
        Row(-9L, -1, -0.5, 0f, false, "", Array.empty[Byte],
          java.sql.Timestamp.from(java.time.Instant.EPOCH),
          java.sql.Date.valueOf("1969-12-31")),
        // PRE-epoch with a sub-second part: getTime truncates toward zero
        // while getNanos stays non-negative — the writer must floorDiv or
        // this round-trips one second late with a flipped fraction
        Row(3L, 3, 3.0, 3f, true, "pre", Array[Byte](9),
          java.sql.Timestamp.from(java.time.Instant.parse("1969-12-31T23:59:59.5Z")),
          java.sql.Date.valueOf("1969-12-31"))),
      allTypes)
  }

  test("every supported type round-trips through the container, nulls included") {
    val dir = tmp()
    AvroSink.write(allTypesData.repartition(2), dir, codec = "deflate")
    val back = AvroSink.read(spark, dir, allTypes)
    // Array[Byte] compares by identity in canon — render it as hex
    val hx = (d: org.apache.spark.sql.DataFrame) =>
      d.withColumn("bin", org.apache.spark.sql.functions.hex(
        org.apache.spark.sql.functions.col("bin")))
    assertSameRows(hx(back), hx(allTypesData))
  }

  test("objects are spec-conformant containers: magic, deflate codec, null-union schema") {
    val dir = tmp()
    val n = AvroSink.write(allTypesData.coalesce(1), dir, codec = "deflate")
    assert(n == 4)
    val f = new java.io.File(dir).listFiles().filter(_.getName.endsWith(".avro")).head
    val bytes = Files.readAllBytes(Paths.get(f.getPath))
    // Avro 1.11 spec §Object Container Files: magic = 'O','b','j',1
    assert(bytes.take(4).toSeq == Seq[Byte]('O', 'b', 'j', 1))
    // the library's own reader sees our metadata + embedded schema
    val r = new org.apache.avro.file.DataFileReader[org.apache.avro.generic.GenericRecord](
      f, new org.apache.avro.generic.GenericDatumReader[org.apache.avro.generic.GenericRecord]())
    try {
      assert(r.getMetaString("avro.codec") == "deflate")
      val sch = r.getSchema
      assert(sch.getType == org.apache.avro.Schema.Type.RECORD)
      val lf = sch.getField("l").schema()
      assert(lf.getType == org.apache.avro.Schema.Type.UNION &&
        lf.getTypes.get(0).getType == org.apache.avro.Schema.Type.NULL,
        s"nullable field must be a null union: $lf")
      assert(sch.getField("ts").schema().getTypes.get(1).getLogicalType
        .isInstanceOf[org.apache.avro.LogicalTypes.TimestampMicros])
      assert(r.iterator().asInstanceOf[java.util.Iterator[_]].hasNext)
    } finally r.close()
  }

  test("FileSink format=avro: in-file pk dedup, overwrite and append modes") {
    val dir = tmp()
    val cfg = FileSink.Config(format = "avro", gzip = true,
      pk = Seq("id"), discriminators = Seq("v"))
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("v", DoubleType),
      StructField("s", StringType)))
    val batch1 = df("id BIGINT, v DOUBLE, s STRING",
      Seq(Row(1L, 1.5, "x"), Row(1L, 9.5, "keep"), Row(2L, 2.5, "y")))
    FileSink.write(batch1, dir, SaveMode.Overwrite, cfg)
    val after1 = FileSink.read(spark, dir, schema, cfg)
    assertSameRows(after1, df("id BIGINT, v DOUBLE, s STRING",
      Seq(Row(1L, 9.5, "keep"), Row(2L, 2.5, "y"))))
    // append lands new objects beside the old (batch mode)
    FileSink.write(df("id BIGINT, v DOUBLE, s STRING", Seq(Row(3L, 3.5, "z"))),
      dir, SaveMode.Append, cfg)
    assert(FileSink.read(spark, dir, schema, cfg).count() == 3)
    // overwrite replaces the folder
    FileSink.write(batch1, dir, SaveMode.Overwrite, cfg)
    assert(FileSink.read(spark, dir, schema, cfg).count() == 2)
  }

  test("reader aligns by field NAME to the caller's column order") {
    val dir = tmp()
    AvroSink.write(df("a BIGINT, b STRING", Seq(Row(1L, "x"), Row(2L, "y"))), dir)
    val flipped = StructType(Seq(
      StructField("b", StringType), StructField("a", LongType)))
    val back = AvroSink.read(spark, dir, flipped)
    assertSameRows(back, df("b STRING, a BIGINT", Seq(Row("x", 1L), Row("y", 2L))))
  }

  test("reading a missing or empty dir returns an empty frame, not NPE") {
    // Hadoop globStatus returns NULL for a nonexistent dir; the write path
    // legitimately produces zero objects for an empty frame
    val schema = StructType(Seq(StructField("a", LongType)))
    val missing = AvroSink.read(spark, s"${tmp()}/never_written", schema)
    assert(missing.count() == 0L && missing.schema == schema)
    val emptyDir = tmp()
    val back = AvroSink.read(spark, emptyDir, schema)
    assert(back.count() == 0L)
  }

  test("unsupported types and partitioned layout are rejected loudly") {
    intercept[IllegalArgumentException] {
      AvroSink.avroSchema(StructType(Seq(
        StructField("m", MapType(StringType, LongType)))))
    }
    intercept[IllegalArgumentException] {
      FileSink.write(df("id BIGINT, p STRING", Seq(Row(1L, "a"))), tmp(),
        SaveMode.Overwrite, FileSink.Config(format = "avro", partitionBy = Seq("p")))
    }
  }
}
