package graft

import org.apache.spark.sql.SparkSession

/** Dev scratch: interleaved A/B of one SQL conf on one named query —
  * alternating arms in a single warm JVM so machine-load bursts hit both
  * arms equally. args: name sfDir confKey valA valB [pairs]
  */
object AbOne {
  def main(args: Array[String]): Unit = {
    val name = args(0); val sfDir = args(1)
    val key = args(2); val valA = args(3); val valB = args(4)
    val pairs = if (args.length > 5) args(5).toInt else 3
    val spark = SessionDefaults(SparkSession.builder()
      .master("local[32]").config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // deterministic extension install: every query sees the same
    // registry + optimizer rules regardless of its position in the run
    GraftExtensions.registerAll(spark)
    val fn = SparkEntry.queries(name)
    def run(): Double = {
      val t0 = System.nanoTime()
      graft.operators.CacheScope.scoped {
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      }
      (System.nanoTime() - t0) / 1e9
    }
    spark.conf.set(key, valA); run() // warmup, discarded
    val a = collection.mutable.ArrayBuffer[Double]()
    val b = collection.mutable.ArrayBuffer[Double]()
    (1 to pairs).foreach { _ =>
      spark.conf.set(key, valA); a += run()
      spark.conf.set(key, valB); b += run()
    }
    println(f"[ab] $name $key A=$valA best=${a.min}%.3f all=${a.map(t => f"$t%.2f").mkString(",")}")
    println(f"[ab] $name $key B=$valB best=${b.min}%.3f all=${b.map(t => f"$t%.2f").mkString(",")}")
    spark.stop()
  }
}
