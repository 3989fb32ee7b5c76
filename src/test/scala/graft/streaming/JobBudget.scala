package graft.streaming

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Counts Spark jobs fired while a closure runs — the STRUCTURAL guard
  * for the streaming-ingest gates' per-batch overhead (r11 verdict:
  * wall-clock targets flap with machine load, but the jobs-per-batch
  * count is load-independent, so pinning a job BUDGET catches overhead
  * creep — a reintroduced per-batch driver job, an extra probe pass —
  * the way a seconds target never reliably can).
  *
  * The listener bus is asynchronous: after the closure returns, the
  * count is polled until it stops moving before being reported.
  */
object JobBudget {

  def count(spark: SparkSession)(f: => Unit): Int = {
    val n = new AtomicInteger()
    val listener = new SparkListener {
      override def onJobStart(jobStart: SparkListenerJobStart): Unit = {
        n.incrementAndGet(); ()
      }
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      f
      var prev = -1
      var cur = n.get()
      var spins = 0
      while (cur != prev && spins < 50) {
        Thread.sleep(200)
        prev = cur
        cur = n.get()
        spins += 1
      }
      cur
    } finally spark.sparkContext.removeSparkListener(listener)
  }
}
