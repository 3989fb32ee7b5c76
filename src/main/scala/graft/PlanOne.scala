package graft

import org.apache.spark.sql.SparkSession

/** Dev scratch: write one named query's `explain("formatted")` output to a
  * file (the plans/<round>/ evidence artifacts). args: query sfDir outFile
  * [k=v session confs].
  */
object PlanOne {
  def main(args: Array[String]): Unit = {
    val name = args(0); val sfDir = args(1); val outFile = args(2)
    val builder = SessionDefaults(SparkSession.builder()
      .master("local[32]").config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false"))
    args.drop(3).foreach { kv =>
      val Array(k, v) = kv.split("=", 2); builder.config(k, v)
    }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    GraftExtensions.registerAll(spark)
    val df = SparkEntry.queries(name)(spark, sfDir)
    val formatted = df.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get(outFile).getParent)
    java.nio.file.Files.writeString(java.nio.file.Paths.get(outFile), formatted)
    println(s"[planone] $name -> $outFile (${formatted.length} chars)")
    spark.stop()
  }
}
