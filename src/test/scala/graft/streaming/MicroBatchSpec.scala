package graft.streaming

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._
import graft.SparkSuite

/** End-to-end micro-batch runtime (B1): checkpointed file-source stream,
  * one batch per segment, failed batches parked without killing the stream
  * (batch_consumer.go:56-267). */
class MicroBatchSpec extends SparkSuite {

  private val schema = StructType(Seq(StructField("id", LongType)))

  private def writeSegment(ids: Seq[Long], dir: String, name: String): Unit = {
    val f = new java.io.File(dir); f.mkdirs()
    val w = new java.io.PrintWriter(new java.io.File(f, name))
    try ids.foreach(i => w.println(s"""{"id":$i}""")) finally w.close()
  }

  test("each segment becomes one micro-batch; offsets advance through the checkpoint") {
    val base = java.nio.file.Files.createTempDirectory("graft_mb_").toString
    writeSegment(Seq(1L, 2L), s"$base/in", "001.json")
    writeSegment(Seq(3L), s"$base/in", "002.json")
    val retry = RetryQueue(s"$base/retry", s"$base/dlq")
    val batches = scala.collection.mutable.ArrayBuffer.empty[Seq[Long]]
    MicroBatch.runFileStream(spark, s"$base/in", schema, s"$base/ckpt",
      retry, clock = () => 0L) { dfIn =>
      batches += dfIn.collect().toSeq.map(_.getLong(0)).sorted
    }
    assert(batches.map(_.toSet).toSet == Set(Set(1L, 2L), Set(3L)))
    // a SECOND run with the same checkpoint re-reads nothing (WAL offsets)
    val again = scala.collection.mutable.ArrayBuffer.empty[Long]
    MicroBatch.runFileStream(spark, s"$base/in", schema, s"$base/ckpt",
      retry, clock = () => 0L)(dfIn => again ++= dfIn.collect().toSeq.map(_.getLong(0)))
    assert(again.isEmpty)
    // but NEW segments arriving later are picked up
    writeSegment(Seq(9L), s"$base/in", "003.json")
    MicroBatch.runFileStream(spark, s"$base/in", schema, s"$base/ckpt",
      retry, clock = () => 0L)(dfIn => again ++= dfIn.collect().toSeq.map(_.getLong(0)))
    assert(again.toSeq == Seq(9L))
  }

  test("a failing batch parks in the retry queue; the stream keeps going") {
    val base = java.nio.file.Files.createTempDirectory("graft_mb2_").toString
    writeSegment(Seq(1L), s"$base/in", "001.json")
    writeSegment(Seq(666L), s"$base/in", "002.json")
    writeSegment(Seq(3L), s"$base/in", "003.json")
    val retry = RetryQueue(s"$base/retry", s"$base/dlq")
    val ok = scala.collection.mutable.ArrayBuffer.empty[Long]
    MicroBatch.runFileStream(spark, s"$base/in", schema, s"$base/ckpt",
      retry, clock = () => 1000L) { dfIn =>
      val ids = dfIn.collect().toSeq.map(_.getLong(0))
      if (ids.contains(666L)) throw new RuntimeException("poison")
      ok ++= ids
    }
    assert(ok.toSet == Set(1L, 3L)) // batches after the failure still ran
    val parked = retry.queued(spark).get
    assert(canon(parked.select("id", "__retries", "__error")) ==
      Seq(Seq("666", "1", "poison")))
  }
}
