package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.operators.Scd

/** Streaming SCD2 upsert protocol ([[Scd2Stream]]): multi-batch
  * equivalence with the batch rebuild, crash-replay convergence of the
  * versioned-snapshot commit, and torn-snapshot invisibility.
  */
case class Obs(k: Long, status: String, ts: Int, tie: Int)

class Scd2StreamSpec extends SparkTestBase {
  import spark.implicits._

  private val feed = Seq(
    Obs(1L, "A", 10, 1), Obs(2L, "X", 12, 2),
    Obs(1L, "A", 20, 3), Obs(1L, "B", 25, 4),
    Obs(2L, "X", 30, 5), Obs(3L, "N", 32, 6),
    Obs(1L, "A", 40, 7), Obs(2L, "Y", 45, 8))

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private def collectDim(df: org.apache.spark.sql.DataFrame) =
    df.orderBy("k", "version").collect().map(_.toSeq).toSeq

  test("a time-sliced stream converges to the batch rebuild, batch by batch") {
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[Obs]
    val dimDir = tmp("graft_scd2_dim")
    val q = source.toDF().writeStream
      .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
        Scd2Stream.scd2UpsertBatch(b.toDF(), dimDir, id,
          Seq("k"), Seq("status"), "ts", Seq("tie"))
      }
      .option("checkpointLocation", tmp("graft_scd2_ckpt"))
      .start()
    try {
      // time-ordered slices — the CDC contract the protocol documents
      source.addData(feed.filter(_.ts <= 20)); q.processAllAvailable()
      source.addData(feed.filter(o => o.ts > 20 && o.ts <= 32)); q.processAllAvailable()
      source.addData(feed.filter(_.ts > 32)); q.processAllAvailable()
    } finally q.stop()
    val streamed = collectDim(Scd2Stream.latestSnapshot(spark, dimDir).get)
    val rebuilt = collectDim(Scd.scd2History(
      feed.toDF(), Seq("k"), Seq("status"), "ts", Seq("tie")))
    assert(streamed == rebuilt, s"streamed $streamed vs rebuilt $rebuilt")
  }

  test("a replayed batch converges: same predecessor, same output snapshot") {
    val dimDir = tmp("graft_scd2_replay")
    val b0 = feed.filter(_.ts <= 20).toDF()
    val b1 = feed.filter(_.ts > 20).toDF()
    Scd2Stream.scd2UpsertBatch(b0, dimDir, 0L, Seq("k"), Seq("status"), "ts", Seq("tie"))
    Scd2Stream.scd2UpsertBatch(b1, dimDir, 1L, Seq("k"), Seq("status"), "ts", Seq("tie"))
    val first = collectDim(Scd2Stream.latestSnapshot(spark, dimDir).get)
    // crash-replay: batch 1 re-runs with the same id and data; it must
    // anti-select its own prior write (merge into v=0, not v=1)
    Scd2Stream.scd2UpsertBatch(b1, dimDir, 1L, Seq("k"), Seq("status"), "ts", Seq("tie"))
    val replayed = collectDim(Scd2Stream.latestSnapshot(spark, dimDir).get)
    assert(replayed == first)
    assert(replayed == collectDim(Scd.scd2History(
      feed.toDF(), Seq("k"), Seq("status"), "ts", Seq("tie"))))
  }

  test("a torn snapshot (no _SUCCESS) is invisible to readers and to the next merge") {
    val dimDir = tmp("graft_scd2_torn")
    Scd2Stream.scd2UpsertBatch(feed.filter(_.ts <= 20).toDF(), dimDir, 0L,
      Seq("k"), Seq("status"), "ts", Seq("tie"))
    // fake a torn v=1: files but no _SUCCESS marker
    val torn = new java.io.File(s"$dimDir/v=1")
    torn.mkdirs()
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dimDir/v=1/part-zzz.parquet"),
      Array[Byte](1, 2, 3))
    assert(Scd2Stream.latestSnapshot(spark, dimDir).get.inputFiles.forall(_.contains("v=0")))
    // the replayed batch 1 merges from v=0 and overwrites the torn dir
    Scd2Stream.scd2UpsertBatch(feed.filter(_.ts > 20).toDF(), dimDir, 1L,
      Seq("k"), Seq("status"), "ts", Seq("tie"))
    assert(collectDim(Scd2Stream.latestSnapshot(spark, dimDir).get) ==
      collectDim(Scd.scd2History(feed.toDF(), Seq("k"), Seq("status"), "ts", Seq("tie"))))
  }

  test("retention is bounded at two snapshots: the latest and its replay predecessor") {
    val dimDir = tmp("graft_scd2_retain")
    def upsert(rows: Seq[Obs], id: Long) =
      Scd2Stream.scd2UpsertBatch(rows.toDF(), dimDir, id,
        Seq("k"), Seq("status"), "ts", Seq("tie"))
    upsert(feed.filter(_.ts <= 20), 0L)
    upsert(feed.filter(o => o.ts > 20 && o.ts <= 32), 1L)
    upsert(feed.filter(_.ts > 32), 2L)
    val versions = new java.io.File(dimDir).listFiles().map(_.getName)
      .filter(_.startsWith("v=")).sorted.toSeq
    assert(versions == Seq("v=1", "v=2"), s"got $versions")
    // the survivors still serve a batch-2 replay correctly
    upsert(feed.filter(_.ts > 32), 2L)
    assert(collectDim(Scd2Stream.latestSnapshot(spark, dimDir).get) ==
      collectDim(Scd.scd2History(feed.toDF(), Seq("k"), Seq("status"), "ts", Seq("tie"))))
  }

  test("scd2UpsertStream drains the source and returns the final dimension") {
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[Obs]
    source.addData(feed)
    val dim = Scd2Stream.scd2UpsertStream(source.toDF(),
      tmp("graft_scd2_all"), tmp("graft_scd2_all_ckpt"),
      Seq("k"), Seq("status"), "ts", Seq("tie"))
    assert(collectDim(dim) == collectDim(Scd.scd2History(
      feed.toDF(), Seq("k"), Seq("status"), "ts", Seq("tie"))))
    // current rows: one per key
    assert(dim.filter(col("is_current")).count() == 3)
  }
}
