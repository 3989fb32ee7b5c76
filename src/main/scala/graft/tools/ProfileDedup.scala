package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiling harness for the dedup family (dev tool, not part of
  * the query surface). Times each stage of the Jaccard pipelines at the
  * given SF dir.
  */
object ProfileDedup {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.SessionDefaults(SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.{Ann, Dedup}
    import graft.functions.expr.HashFunctions._

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[profile] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    // stage-level attribution
    val stages = scala.collection.mutable.ArrayBuffer.empty[(Int, String, Long, Int)]
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val ms = (for { s <- si.submissionTime; c <- si.completionTime } yield c - s).getOrElse(-1L)
        stages.synchronized {
          stages += ((si.stageId, si.name.takeWhile(_ != '\n').take(60), ms, si.numTasks))
        }
      }
    })
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    (1 to 2).foreach { i =>
      stages.synchronized(stages.clear())
      val df = Ann.lshTopK(emb, emb.filter(col("vec_id") < 10), 5)
      time(s"q27 full #$i")(noop(df))
      stages.synchronized(stages.sortBy(-_._3).take(8).foreach { case (id, n, ms, t) =>
        println(f"[profile]   stage $id%4d $ms%6d ms tasks=$t%3d  $n") })
      if (i == 2) println(df.queryExecution.executedPlan.toString
        .linesIterator.map("[plan] " + _).mkString("\n"))
    }
    spark.stop()
  }
}
