package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch diagnostic main: shapes an adversarial NDJSON fixture through the
  * public Ingest entry and prints the resulting schema + rows. Not part of
  * the driver contract. */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val nasty = Seq(
      """{"":1,"a":{"b":2},"a_b":3,"!!!":"x","price":"1,234","when":"2024-01-02 03:04:05"}""",
      """{"":9,"a":{"b":8},"nested":{"__sql_type_":"json","k":1},"when":"2024-06-07T08:09:10.111Z"}"""
    ).toDS()
    val shaped = graft.shape.Ingest.shape(spark, nasty)
    shaped.df.printSchema()
    shaped.df.show(false)
    println("hints=" + shaped.hints)
    spark.stop()
  }
}
