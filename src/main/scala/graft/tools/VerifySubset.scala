package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch diagnostic main: run a NAMED SUBSET of registry queries through
  * the same dump shape as [[graft.Verify]] (per-query parquet +
  * oracle_sql.json) for fast iteration on new operators. Not part of the
  * driver contract.
  *
  * Usage: runMain graft.tools.VerifySubset <sfDir> <outDir> <q1,q2,...>
  */
object VerifySubset {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir, names) = args
    val spark = SparkSession.builder().master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC") // match Verify exactly
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs() // oracle_sql.json writes even when every query fails
    val wanted = names.split(",").toSeq
    val qs = graft.queries.Registry.all.filter(kv => wanted.contains(kv._1))
    qs.foreach { case (name, q) =>
      try q.fn(spark, sfDir).coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
      catch { case e: Throwable => println(s"[subset] $name failed: $e") }
    }
    val json = qs.collect { case (n, q) if q.oracle.isDefined =>
      s""""$n": ${graft.Verify.jsonStr(q.oracle.get)}"""
    }.mkString("{", ",\n", "}")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
