package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

import graft.SessionDefaults
import graft.operators.Pq
import graft.sources.Segments

/** Dev scratch: per-phase timing of one q102 micro-batch — search write
  * vs append vs compaction — against a throwaway index copy.
  */
object ProfileQ102Batch {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SessionDefaults(SparkSession.builder()
      .master("local[32]").config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t[A](label: String)(body: => A): A = {
      val t0 = System.nanoTime()
      val out = body
      println(f"[pqb] $label%-16s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
      out
    }
    val idxStage = graft.SparkEntry.stages("ivfpq_index_corpus")(spark, sfDir)
    val feedDir = graft.SparkEntry.stages("emb_feed")(spark, sfDir)
    val feedPath = new org.apache.hadoop.fs.Path(feedDir)
    val feedFiles = feedPath.getFileSystem(spark.sessionState.newHadoopConf())
      .listStatus(feedPath).map(_.getPath.toString)
      .filter(_.endsWith(".parquet")).sorted
    (1 to 3).foreach { run =>
      println(s"[pqb] --- run $run ---")
      val scratch = s"/tmp/pqb-$run-${System.nanoTime()}"
      val conf = spark.sessionState.newHadoopConf()
      val src = new org.apache.hadoop.fs.Path(idxStage)
      val dst = new org.apache.hadoop.fs.Path(s"$scratch/idx")
      org.apache.hadoop.fs.FileUtil.copy(
        src.getFileSystem(conf), src, src.getFileSystem(conf), dst, false, conf)
      val idx = dst.toString
      val st = Pq.loadIvfPqState(spark, idx)
      feedFiles.zipWithIndex.foreach { case (f, i) =>
        graft.operators.CacheScope.scoped {
          val batch = spark.read.parquet(f)
          t(s"b$i search+write")(
            Pq.searchIvfPqIndexWith(st, spark, idx, batch, 5,
                "vec_id", "embedding", 4,
                excludeIds = Some(batch.select(col("vec_id"))))
              .write.mode("overwrite").parquet(s"$scratch/out/batch=$i"))
          t(s"b$i append")(
            Pq.appendToIvfPqIndexWith(st, batch, idx, "vec_id", "embedding",
              seg = Some(s"batch-$i")))
          if ((i + 1) % 2 == 0)
            t(s"b$i compact")(Segments.compact(spark, idx,
              Seq("codes" -> Seq("cell"), "vecs" -> Nil)))
        }
      }
    }
    spark.stop()
  }
}
