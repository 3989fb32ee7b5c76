package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

import graft.SparkTestBase
import graft.operators.{CacheScope, Dsir}

/** [[SketchStream.dsirScoreStreaming]] — the serving half of streaming
  * DSIR: per-batch scoring against a frozen score table must equal the
  * single-shot batch scoring (weights are batch-independent), the
  * drained selection must equal the batch selection, and a full replay
  * under a fresh checkpoint must add ZERO duplicate weight rows (the
  * txn-ledger exactly-once discipline).
  */
class DsirScoreStreamSpec extends SparkTestBase {
  import spark.implicits._

  private val feedSchema = StructType(Seq(
    StructField("doc_id", LongType), StructField("text", StringType)))

  private lazy val docs = Seq(
    (0L, "the party of the first part shall indemnify the party"),
    (1L, "the party of the second part shall hold harmless"),
    (2L, "the party of the first part shall indemnify everyone"),
    (3L, "9x7 q2z 8w1 v5k 3j6 p0m 4h8 r2t"),
    (4L, "zz9 yy8 xx7 ww6 vv5 uu4 tt3 ss2"),
    (5L, "")
  ).toDF("doc_id", "text")

  private def tmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_dsirserve_$tag").toString

  // three feed files => three micro-batches under maxFilesPerTrigger=1
  private def stageFeed(): String = {
    val dir = tmp("feed")
    (0 until 3).foreach { i =>
      docs.filter(pmod(col("doc_id"), lit(3)) === i)
        .write.mode("append").parquet(dir)
    }
    dir
  }

  private def scores = Dsir.scoreTable(
    Dsir.bucketCounts(docs, pmod(col("doc_id"), lit(2)) === 0), dim = 1024)

  private def weightRows(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Long)] =
    df.select("doc_id", "n_grams", "w_micro").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  test("drained weights == single-shot batch weights; selection identical") {
    CacheScope.scoped {
      val feed = stageFeed()
      val table = tmp("tbl")
      val drained = SketchStream.dsirScoreStreaming(
        spark, feed, feedSchema, scores, table, tmp("ckpt"),
        maxFilesPerTrigger = Some(1))
      val batch = Dsir.weightsAgainst(docs, scores)
      assert(weightRows(drained) == weightRows(batch),
        "per-batch scoring against a frozen table must be batch-invisible")
      val got = Dsir.flagByThreshold(drained, 3).collect()
        .map(r => r.getLong(0) -> r.getBoolean(3)).toMap
      val want = Dsir.flagByThreshold(
        graft.operators.CacheScope.pin(batch,
          org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK), 3)
        .collect().map(r => r.getLong(0) -> r.getBoolean(3)).toMap
      assert(got == want)
    }
  }

  test("a FULL REPLAY under a fresh checkpoint adds zero duplicate weights") {
    CacheScope.scoped {
      val feed = stageFeed()
      val table = tmp("tbl")
      val first = SketchStream.dsirScoreStreaming(
        spark, feed, feedSchema, scores, table, tmp("ckpt1"),
        maxFilesPerTrigger = Some(1))
      val n1 = first.count()
      // same feed, same writer id, FRESH checkpoint: every batch replays
      // and every one must be skipped by the txn ledger
      val second = SketchStream.dsirScoreStreaming(
        spark, feed, feedSchema, scores, table, tmp("ckpt2"),
        maxFilesPerTrigger = Some(1))
      assert(second.count() == n1, "replayed batches must not duplicate rows")
      assert(weightRows(second) == weightRows(first))
    }
  }

  test("an empty feed drains to an empty weight frame, not an error") {
    val out = SketchStream.dsirScoreStreaming(
      spark, tmp("emptyfeed"), feedSchema, scores, tmp("tbl"), tmp("ckpt"))
    assert(out.count() == 0L)
    assert(out.columns.toSeq == Seq("doc_id", "n_grams", "w_micro"))
  }
}
