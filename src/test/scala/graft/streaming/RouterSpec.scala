package graft.streaming

import org.apache.spark.sql.{DataFrame, Row}
import graft.SparkSuite

/** Event routing fan-out (B5, topic_manager.go:726-787) and the per-batch
  * events log (B7). */
class RouterSpec extends SparkSuite {

  test("routeBatch slices a batch per routing value") {
    val batch = df("t STRING, id BIGINT", Seq(
      Row("a", 1L), Row("b", 2L), Row("a", 3L), Row(null, 4L)))
    val got = scala.collection.mutable.Map.empty[String, Seq[Long]]
    Router.routeBatch(batch, "t", defaultTable = "dflt") { (table, slice) =>
      got(table) = slice.collect().toSeq.map(_.getLong(0)).sorted
    }
    assert(got.toMap == Map("a" -> Seq(1L, 3L), "b" -> Seq(2L), "dflt" -> Seq(4L)))
  }

  test("routed slices drop the routing column (it lives in the table name)") {
    val batch = df("t STRING, id BIGINT", Seq(Row("a", 1L)))
    var cols: Seq[String] = Nil
    Router.routeBatch(batch, "t", "d") { (_, slice) => cols = slice.columns.toSeq }
    assert(cols == Seq("id"))
  }

  test("events log records ok and failed batches with counts (B7)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_el_").toString
    val log = EventsLog(s"$dir/log")
    log.post(spark, LoadState("s1", "t", 0L, "ok", 10L, "", 1000L))
    log.post(spark, LoadState("s1", "t", 1L, "failed", 5L, "boom", 2000L))
    val back = log.read(spark).get
    assert(canon(back.select("batchId", "status", "rows", "error")) == Seq(
      Seq("0", "ok", "10", "∅").map(_.replace("∅", "")),
      Seq("1", "failed", "5", "boom")))
  }

  test("the micro-batch runner posts per-batch states (B7 wiring)") {
    val base = java.nio.file.Files.createTempDirectory("graft_mb3_").toString
    val w = new java.io.File(s"$base/in"); w.mkdirs()
    val pw = new java.io.PrintWriter(new java.io.File(w, "001.json"))
    try pw.println("""{"id":1}""") finally pw.close()
    val pw2 = new java.io.PrintWriter(new java.io.File(w, "002.json"))
    try pw2.println("""{"id":666}""") finally pw2.close()
    val log = EventsLog(s"$base/log")
    MicroBatch.runFileStream(spark, s"$base/in",
      org.apache.spark.sql.types.StructType.fromDDL("id BIGINT"),
      s"$base/ckpt", RetryQueue(s"$base/retry", s"$base/dlq"),
      clock = () => 42L, eventsLog = Some(log), streamId = "s", table = "t") { dfIn =>
      if (dfIn.collect().exists(_.getLong(0) == 666L)) throw new RuntimeException("poison")
    }
    val states = log.read(spark).get
    assert(states.count() == 2)
    assert(canon(states.select("status")).flatten.sorted == Seq("failed", "ok"))
  }
}
