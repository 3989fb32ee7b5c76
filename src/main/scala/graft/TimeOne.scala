package graft

import org.apache.spark.sql.SparkSession
/** Dev scratch: time one named query at a given SF, best of N. */
object TimeOne {
  def main(args: Array[String]): Unit = {
    val name = args(0); val sfDir = args(1)
    val n = if (args.length > 2) args(2).toInt else 2
    // args(3..): extra k=v session confs for A/B experiments
    val builder = SessionDefaults(SparkSession.builder()
      .master("local[32]").config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false"))
    args.drop(3).foreach { kv =>
      val Array(k, v) = kv.split("=", 2); builder.config(k, v)
    }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // deterministic extension install: every query sees the same
    // registry + optimizer rules regardless of its position in the run
    GraftExtensions.registerAll(spark)
    val fn = SparkEntry.queries(name)
    val times = (1 to n).map { _ =>
      val t0 = System.nanoTime()
      graft.operators.CacheScope.scoped {
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      }
      (System.nanoTime() - t0) / 1e9
    }
    println(f"[timeone] $name best=${times.min}%.3f all=${times.map(t => f"$t%.2f").mkString(",")}")
    spark.stop()
  }
}
