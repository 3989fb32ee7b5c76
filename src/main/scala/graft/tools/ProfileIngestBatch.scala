package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

import graft.{SessionDefaults, Tables}
import graft.operators.Dedup
import graft.sources.Segments

/** Dev scratch: phase-level timing of the q92 ingest loop — probe vs
  * append vs compact per batch, against a throwaway index copy.
  */
object ProfileIngestBatch {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SessionDefaults(SparkSession.builder()
      .master("local[32]").config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t[A](label: String)(body: => A): A = {
      val t0 = System.nanoTime()
      val out = body
      println(f"[pib] $label%-22s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
      out
    }
    val docs = Tables.table(spark, sfDir, "documents")
    val base = s"/tmp/pib-${System.nanoTime()}"
    (1 to 2).foreach { round =>
      val idx = s"$base/idx$round"
      val out = s"$base/out$round"
      t("index build")(Dedup.writeMinhashIndex(
        docs.filter(col("doc_id") < 250), idx))
      val splits = Seq((250L, 1834L), (1834L, 3417L), (3417L, 5000L))
      splits.zipWithIndex.foreach { case ((lo, hi), i) =>
        val batch = docs.filter(col("doc_id") >= lo && col("doc_id") < hi)
          .select("doc_id", "text")
        t(s"b$i probe+write")(graft.operators.CacheScope.scoped {
          Dedup.incrementalNearDupPairs(spark, idx, batch)
            .write.mode("overwrite").parquet(s"$out/batch=$i")
        })
        t(s"b$i append")(
          Dedup.appendToMinhashIndex(batch, idx, seg = Some(s"batch-$i")))
        if ((i + 1) % 2 == 0)
          t(s"b$i compact")(Segments.compact(spark, idx,
            Seq("buckets" -> Nil, "sets" -> Nil)))
      }
      val n = t("readback")(spark.read.parquet(out).count())
      println(s"[pib] round $round pairs=$n")
    }
    spark.stop()
  }
}
