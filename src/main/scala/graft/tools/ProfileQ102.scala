package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types.{ArrayType, FloatType, LongType, StructField, StructType}

import graft.SessionDefaults

/** Dev scratch: phase-level wall-clock of the q102 shape — index copy,
  * stream drain, readback — to separate micro-batch cost from harness
  * overhead. Mirrors the query site against the same staged inputs.
  */
object ProfileQ102 {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SessionDefaults(SparkSession.builder()
      .master("local[32]").config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t[A](label: String)(body: => A): A = {
      val t0 = System.nanoTime()
      val out = body
      println(f"[pq102] $label%-14s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
      out
    }
    val idxStage = graft.SparkEntry.stages("ivfpq_index_corpus")(spark, sfDir)
    val feed = graft.SparkEntry.stages("emb_feed")(spark, sfDir)
    val embFeedSchema = StructType(Seq(
      StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType))))
    (1 to 3).foreach { i =>
      println(s"[pq102] --- run $i ---")
      val scratch = s"/tmp/pq102-$i-${System.nanoTime()}"
      graft.operators.CacheScope.scoped {
        val idx = t("copy index") {
          val conf = spark.sessionState.newHadoopConf()
          val src = new org.apache.hadoop.fs.Path(idxStage)
          val dst = new org.apache.hadoop.fs.Path(s"$scratch/idx")
          val fs = src.getFileSystem(conf)
          org.apache.hadoop.fs.FileUtil.copy(fs, src, fs, dst, false, conf)
          dst.toString
        }
        val res = t("drain") {
          graft.streaming.AnnIngestStream.ingest(
            spark, feed, embFeedSchema, idx,
            s"$scratch/out", s"$scratch/ckpt",
            k = 5, nprobe = 4, maxFilesPerTrigger = Some(1), compactEvery = 2)
        }
        t("readback")(res.orderBy("query_id", "rank")
          .write.format("noop").mode("overwrite").save())
      }
    }
    spark.stop()
  }
}
