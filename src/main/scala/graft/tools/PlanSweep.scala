package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch sweep: flag scale red-flags (rangepartitioning = global sort,
  * CartesianProduct / BroadcastNestedLoop = pair blowup) in every
  * registry query's executed plan. Not part of the driver contract. */
object PlanSweep {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.queries.Registry.all.toSeq.sortBy(_._1).foreach { case (name, q) =>
      try {
        val plan = q.fn(spark, sfDir).queryExecution.executedPlan.toString
        val flags = Seq(
          "rangepartitioning" -> plan.contains("rangepartitioning"),
          "CartesianProduct" -> plan.contains("CartesianProduct"),
          "BroadcastNestedLoop" -> plan.contains("BroadcastNestedLoop"))
          .collect { case (f, true) => f }
        println(s"[sweep] $name: ${if (flags.isEmpty) "clean" else flags.mkString(",")}")
      } catch { case e: Throwable =>
        println(s"[sweep] $name: ERROR ${Option(e.getMessage).getOrElse(e.toString).take(80)}")
      }
    }
    spark.stop()
  }
}
