package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener

import graft.{SessionDefaults, SparkEntry}

/** Dev scratch: drain one streaming query and dump per-batch progress
  * (durationMs breakdown) from the streaming listener.
  */
object ProfileStream {
  def main(args: Array[String]): Unit = {
    val name = args(0); val sfDir = args(1)
    val spark = SessionDefaults(SparkSession.builder()
      .master("local[32]").config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.streams.addListener(new StreamingQueryListener {
      override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit =
        println(s"[profile] started ${e.id}")
      override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit =
        println(s"[profile] batch=${e.progress.batchId} rows=${e.progress.numInputRows} " +
          s"durations=${e.progress.durationMs}")
      override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit =
        println(s"[profile] terminated")
    })
    val fn = SparkEntry.queries(name)
    (1 to 2).foreach { i =>
      val t0 = System.nanoTime()
      graft.operators.CacheScope.scoped {
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      }
      println(f"[profile] run$i total=${(System.nanoTime() - t0) / 1e9}%.2f s")
      Thread.sleep(500) // let listener events drain
    }
    spark.stop()
  }
}
