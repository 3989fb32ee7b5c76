package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

import scala.collection.mutable

/** Dev scratch: run one named query and report per-job wall time from a
  * listener — where does a small-data query's fixed overhead go?
  */
object ProfileOne {
  def main(args: Array[String]): Unit = {
    val name = args(0); val sfDir = args(1)
    val spark = SessionDefaults(SparkSession.builder()
      .master("local[32]").config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // deterministic extension install: every query sees the same
    // registry + optimizer rules regardless of its position in the run
    GraftExtensions.registerAll(spark)
    val starts = mutable.Map[Int, (Long, String)]()
    val rows = mutable.ArrayBuffer[(Int, Double, String)]()
    var stages = 0
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit =
        starts(e.jobId) = (e.time, Option(e.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .orElse(Option(e.properties).flatMap(p => Option(p.getProperty("callSite.short"))))
          .getOrElse(""))
      override def onJobEnd(e: SparkListenerJobEnd): Unit =
        starts.remove(e.jobId).foreach { case (t0, d) =>
          rows += ((e.jobId, (e.time - t0) / 1e3, d)) }
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit =
        stages += 1
    })
    val fn = SparkEntry.queries(name)
    // warm run first (class loading, codegen compile), then the measured one
    graft.operators.CacheScope.scoped {
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
    }
    rows.clear(); stages = 0
    val t0 = System.nanoTime()
    graft.operators.CacheScope.scoped {
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
    }
    val total = (System.nanoTime() - t0) / 1e9
    Thread.sleep(1000) // let the listener bus drain
    val jobSum = rows.map(_._2).sum
    println(f"[profile] $name total=$total%.3f jobs=${rows.size} stages=$stages jobTimeSum=$jobSum%.3f planGap=${total - jobSum}%.3f")
    rows.sortBy(-_._2).take(25).foreach { case (id, s, d) =>
      println(f"[profile]   job $id%3d ${s}%7.3f s  ${d.take(110)}")
    }
    spark.stop()
  }
}
