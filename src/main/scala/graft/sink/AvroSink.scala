package graft.sink

import java.nio.ByteBuffer
import scala.jdk.CollectionConverters._

import org.apache.avro.{LogicalTypes, Schema}
import org.apache.avro.file.{CodecFactory, DataFileStream, DataFileWriter}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Avro Object Container File batch format for the file sink (K8).
  *
  * The reference's marshaller negotiates NDJSON / CSV / JSON-array / Avro
  * (+Snappy) per destination (types/marshaller.go:37-50,309-325); this is
  * the Avro leg. Built on the `org.apache.avro` core library that ships
  * with Spark itself (avro-1.12.x is a Spark runtime dependency — only the
  * `spark-avro` DataSource connector is absent here), so the engineering
  * surface is the Spark-side mapping: StructType ⇄ Avro schema (nullable
  * fields as `["null", T]` unions, timestamps as `timestamp-micros`, dates
  * as `date` logical types per the Avro 1.11 spec) and Row ⇄ GenericRecord
  * value conversion, with the container writer running per partition on the
  * executors — one object per partition, no driver-side byte shuffling,
  * exactly like the NDJSON/CSV legs.
  *
  * Codec: `deflate` (RFC 1951, the spec's required codec — the reference's
  * Snappy is an optional codec whose jar is not on this classpath) or
  * `null`. Block boundaries and sync markers are the library's, so any
  * Avro-conformant consumer can read the objects.
  */
object AvroSink {

  // ---- StructType → Avro schema ----------------------------------------

  private def avroBase(dt: DataType): Schema = dt match {
    case LongType    => Schema.create(Schema.Type.LONG)
    case IntegerType | ShortType | ByteType => Schema.create(Schema.Type.INT)
    case DoubleType  => Schema.create(Schema.Type.DOUBLE)
    case FloatType   => Schema.create(Schema.Type.FLOAT)
    case BooleanType => Schema.create(Schema.Type.BOOLEAN)
    case StringType  => Schema.create(Schema.Type.STRING)
    case BinaryType  => Schema.create(Schema.Type.BYTES)
    case TimestampType =>
      LogicalTypes.timestampMicros().addToSchema(Schema.create(Schema.Type.LONG))
    case DateType =>
      LogicalTypes.date().addToSchema(Schema.create(Schema.Type.INT))
    case other =>
      throw new IllegalArgumentException(
        s"avro sink: unsupported Spark type $other (supported: integral, " +
          "float/double, boolean, string, binary, timestamp, date)")
  }

  /** Record schema for a frame: every nullable field becomes the spec's
    * `["null", T]` union with a null default. Field names must already be
    * Avro-legal (`[A-Za-z_][A-Za-z0-9_]*`) — the engine's name sanitizer
    * (T2) guarantees that for shaped frames; the library rejects others. */
  def avroSchema(st: StructType, name: String = "graft_record"): Schema = {
    val rec = Schema.createRecord(name, null, "graft", false)
    rec.setFields(st.fields.map { f =>
      if (f.nullable)
        new Schema.Field(f.name,
          Schema.createUnion(List(Schema.create(Schema.Type.NULL), avroBase(f.dataType)).asJava),
          null, Schema.Field.NULL_DEFAULT_VALUE)
      else new Schema.Field(f.name, avroBase(f.dataType), null, null.asInstanceOf[AnyRef])
    }.toList.asJava)
    rec
  }

  // ---- value conversion -------------------------------------------------

  /** External Row value → Avro generic value (runs on executors). */
  private def toAvro(v: Any): AnyRef = v match {
    case null                     => null
    case ts: java.sql.Timestamp   => // → micros since epoch (timestamp-micros)
      // floorDiv, not /: getTime truncates toward zero but getNanos is
      // always non-negative, so pre-epoch values need the floored second
      Long.box(math.multiplyExact(Math.floorDiv(ts.getTime, 1000L), 1000000L) +
        ts.getNanos / 1000L)
    case i: java.time.Instant     =>
      Long.box(math.multiplyExact(i.getEpochSecond, 1000000L) + i.getNano / 1000L)
    case d: java.sql.Date         => Int.box(d.toLocalDate.toEpochDay.toInt)
    case ld: java.time.LocalDate  => Int.box(ld.toEpochDay.toInt)
    case b: Array[Byte]           => ByteBuffer.wrap(b)
    case s: java.lang.Short       => Int.box(s.intValue)
    case b: java.lang.Byte        => Int.box(b.intValue)
    case other                    => other.asInstanceOf[AnyRef]
  }

  /** Avro generic value → external Row value for the caller's Spark type. */
  private def fromAvro(v: AnyRef, dt: DataType): Any = (v, dt) match {
    case (null, _)                  => null
    case (s: CharSequence, StringType) => s.toString // Utf8 included
    case (b: ByteBuffer, BinaryType) =>
      val a = Array.ofDim[Byte](b.remaining()); b.duplicate().get(a); a
    case (l: java.lang.Long, TimestampType) =>
      java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(
        Math.floorDiv(l.longValue, 1000000L),
        Math.floorMod(l.longValue, 1000000L) * 1000L))
    case (i: java.lang.Integer, DateType) =>
      java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(i.longValue))
    case (i: java.lang.Integer, ShortType) => i.shortValue
    case (i: java.lang.Integer, ByteType)  => i.byteValue
    case (other, _)                 => other
  }

  // ---- writer -----------------------------------------------------------

  /** Write `df` as one `.avro` container object per non-empty partition
    * under `dir`. `runTag` isolates concurrent appends (batch mode writes
    * new objects beside the old, like the NDJSON leg). Executors resolve
    * the filesystem from the classpath Hadoop configuration — the standard
    * propagation path for connector credentials on a cluster. */
  def write(df: DataFrame, dir: String, codec: String = "deflate",
            runTag: String = ""): Long = {
    require(codec == "deflate" || codec == "null", s"avro codec: $codec")
    val st = df.schema
    val schemaJson = avroSchema(st).toString
    val tag = if (runTag.isEmpty) "" else s"$runTag-"
    val counts = df.rdd.mapPartitionsWithIndex { (pid, rows) =>
      if (rows.isEmpty) Iterator.empty
      else {
        val schema = new Schema.Parser().parse(schemaJson)
        val fs = FileSystem.get(new java.net.URI(dir), new Configuration())
        val out = fs.create(new Path(dir, f"part-$tag$pid%05d.avro"), true)
        val w = new DataFileWriter[GenericRecord](new GenericDatumWriter[GenericRecord](schema))
        if (codec == "deflate") w.setCodec(CodecFactory.deflateCodec(6))
        w.create(schema, out)
        var n = 0L
        try rows.foreach { r =>
          val rec = new GenericData.Record(schema)
          var i = 0
          while (i < st.length) {
            rec.put(i, toAvro(if (r.isNullAt(i)) null else r.get(i))); i += 1
          }
          w.append(rec); n += 1
        } finally w.close() // closes `out`; flushes the final block + sync
        Iterator.single(n)
      }
    }
    counts.fold(0L)(_ + _)
  }

  // ---- reader -----------------------------------------------------------

  /** Read a folder of `.avro` container objects back as a DataFrame with
    * `schema`. Decoding uses each file's EMBEDDED writer schema (the
    * container's self-description — column order may differ per object);
    * values align to the caller's schema by field name. One task per
    * object, matching the sink's one-object-per-partition layout. */
  def read(spark: SparkSession, dir: String, schema: StructType): DataFrame = {
    val fs = FileSystem.get(new java.net.URI(dir),
      spark.sparkContext.hadoopConfiguration)
    // globStatus returns NULL (not empty) for a nonexistent dir; an empty
    // frame write legitimately produces zero objects — both read back empty
    val files = Option(fs.globStatus(new Path(dir, "*.avro")))
      .getOrElse(Array.empty).map(_.getPath.toString).sorted
    val st = schema
    if (files.isEmpty)
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[Row], schema)
    val rdd = spark.sparkContext
      .parallelize(files.toSeq, math.max(1, files.length))
      .flatMap { f =>
        val in = FileSystem.get(new java.net.URI(f), new Configuration())
          .open(new Path(f))
        val r = new DataFileStream[GenericRecord](in, new GenericDatumReader[GenericRecord]())
        val buf = scala.collection.mutable.ArrayBuffer.empty[Row]
        try while (r.hasNext) {
          val rec = r.next()
          buf += Row.fromSeq(st.fields.toSeq.map(fld =>
            fromAvro(rec.get(fld.name), fld.dataType)))
        } finally r.close()
        buf
      }
    spark.createDataFrame(rdd, schema)
  }
}
