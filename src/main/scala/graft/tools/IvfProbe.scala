package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.sink.JdbcSink
import graft.sql.DerbyDialect

/** Scratch perf probe (not part of the driver contract). */
object IvfProbe {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id)").collect()
    def time(tag: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[probe] $tag%-30s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
    }
    val ev = graft.core.Tables.events(spark, d)
      .select("event_id", "user_id", "event_type", "value").localCheckpoint(true)
    println("rows=" + ev.count())
    Seq(16, 4, 1).foreach { conns =>
      val sink = JdbcSink(s"jdbc:derby:memory:probe_$conns;create=true", DerbyDialect,
        maxWriteConnections = conns)
      val spec = sink.specFor(ev, "t")
      sink.ensureTable(spec)
      time(s"append 100k conns=$conns")(sink.append(ev, spec.name))
      time(s"append again conns=$conns")(sink.append(ev, spec.name))
    }
    spark.stop()
  }
}
