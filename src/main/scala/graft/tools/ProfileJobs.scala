package graft.tools

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

import graft.{SessionDefaults, SparkEntry}

/** Dev scratch: run one named query (2 runs — cold, warm) with a listener
  * that records every Spark job's wall-clock and description, then dump
  * the warm run's jobs sorted by duration. Answers "how many jobs does
  * this query launch and which ones cost".
  */
object ProfileJobs {
  def main(args: Array[String]): Unit = {
    val name = args(0); val sfDir = args(1)
    val spark = SessionDefaults(SparkSession.builder()
      .master("local[32]").config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val starts = new ConcurrentHashMap[Int, (Long, String)]()
    val jobs = new java.util.concurrent.ConcurrentLinkedQueue[(Int, Double, String)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = {
        val site = e.stageInfos.lastOption.map(_.name).getOrElse("?")
        val nStages = e.stageInfos.size
        val nTasks = e.stageInfos.map(_.numTasks).sum
        starts.put(e.jobId, (e.time, s"stages=$nStages tasks=$nTasks $site"))
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit = {
        Option(starts.get(e.jobId)).foreach { case (t0, desc) =>
          jobs.add((e.jobId, (e.time - t0) / 1e3, desc))
        }
      }
    })
    val fn = SparkEntry.queries(name)
    (1 to 2).foreach { i =>
      jobs.clear()
      val t0 = System.nanoTime()
      graft.operators.CacheScope.scoped {
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      }
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300)
      import scala.jdk.CollectionConverters._
      val js = jobs.asScala.toSeq.sortBy(_._1)
      println(f"[pj] run$i wall=$wall%.2f s jobs=${js.size} " +
        f"jobSum=${js.map(_._2).sum}%.2f s")
      if (i == 2) js.sortBy(-_._2).take(30).foreach { case (id, d, desc) =>
        println(f"[pj]   job=$id%-4d ${d}%7.3f s  ${desc.take(110)}")
      }
    }
    spark.stop()
  }
}
