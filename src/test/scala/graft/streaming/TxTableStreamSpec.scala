package graft.streaming

import org.apache.spark.sql.types.{LongType, StructField, StructType}

import graft.SparkTestBase
import graft.sources.TxTable

/** [[TxTableStream]] — exactly-once streaming append into the
  * transactional table: txn-ledger replay skips, crash-window
  * idempotence, per-writer ledger independence, and the full-replay
  * drain (fresh checkpoint, same writer) landing zero duplicates.
  */
class TxTableStreamSpec extends SparkTestBase {
  import spark.implicits._

  private val feedSchema = StructType(Seq(StructField("id", LongType)))

  private def fresh(): String =
    java.nio.file.Files.createTempDirectory("txstream").toString

  private def ids(dir: String): Seq[Long] =
    TxTable.snapshot(spark, dir).select("id").collect().map(_.getLong(0)).sorted.toSeq

  test("a replayed batch is skipped whole: at-least-once in, exactly-once out") {
    val dir = fresh()
    val batch = Seq(1L, 2L).toDF("id")
    TxTableStream.ingestBatch(batch, batchId = 0L, dir, writerId = "w")
    // the crash-replay shape: same batch, same id, run again
    TxTableStream.ingestBatch(batch, batchId = 0L, dir, writerId = "w")
    assert(ids(dir) == Seq(1L, 2L))
    assert(TxTable.versions(spark, dir) == Seq(1L))
    assert(TxTable.lastTxn(spark, dir, "w").contains(0L))
  }

  test("crash between data write and publish: orphan invisible, replay lands once") {
    val dir = fresh()
    TxTableStream.ingestBatch(Seq(1L).toDF("id"), 0L, dir, "w")
    // a crashed attempt of batch 1 left its data but never published
    Seq(7L, 8L).toDF("id").write.parquet(s"$dir/data/crashed-batch-1")
    assert(ids(dir) == Seq(1L))
    TxTableStream.ingestBatch(Seq(7L, 8L).toDF("id"), 1L, dir, "w")
    assert(ids(dir) == Seq(1L, 7L, 8L), "exactly one copy of batch 1")
    // the debris reclaims past the horizon, the committed copy stays
    assert(TxTable.vacuum(spark, dir, horizonMs = -1L) == Seq("data/crashed-batch-1"))
    assert(ids(dir) == Seq(1L, 7L, 8L))
  }

  test("the txn ledger is per-writer: another writer's ids do not mask mine") {
    val dir = fresh()
    TxTableStream.ingestBatch(Seq(1L).toDF("id"), 5L, dir, "writer-a")
    TxTableStream.ingestBatch(Seq(2L).toDF("id"), 0L, dir, "writer-b")
    assert(ids(dir) == Seq(1L, 2L))
    assert(TxTable.lastTxn(spark, dir, "writer-a").contains(5L))
    assert(TxTable.lastTxn(spark, dir, "writer-b").contains(0L))
    assert(TxTable.lastTxn(spark, dir, "writer-c").isEmpty)
  }

  test("full drain, then a FULL REPLAY under a fresh checkpoint: zero duplicates") {
    val dir = fresh()
    val feed = fresh()
    Seq(10L, 11L).toDF("id").coalesce(1).write.mode("append").parquet(feed)
    Seq(12L).toDF("id").coalesce(1).write.mode("append").parquet(feed)
    TxTable.append(spark, dir, Seq(1L).toDF("id")) // the batch-side seed
    val out1 = TxTableStream.ingest(spark, feed, feedSchema, dir, fresh(),
      writerId = "drain", maxFilesPerTrigger = Some(1), compactEvery = 2)
    assert(out1.select("id").collect().map(_.getLong(0)).sorted.toSeq ==
      Seq(1L, 10L, 11L, 12L))
    // lose the checkpoint entirely: the stream replays EVERY batch with
    // the same ids — the table's txn ledger must absorb all of them
    val out2 = TxTableStream.ingest(spark, feed, feedSchema, dir, fresh(),
      writerId = "drain", maxFilesPerTrigger = Some(1))
    assert(out2.select("id").collect().map(_.getLong(0)).sorted.toSeq ==
      Seq(1L, 10L, 11L, 12L), "fresh-checkpoint replay must add nothing")
    // mid-stream compaction was log-transacted and snapshot-neutral
    assert(TxTable.liveDirs(spark, dir).nonEmpty)
  }

  test("followChanges: the table as a CDC source — exactly-once slices, ledger is the offset") {
    val src = fresh()
    val sink = fresh()
    TxTable.append(spark, src, Seq((1L, 10L), (2L, 20L)).toDF("id", "v"))  // v1
    TxTable.append(spark, src, Seq((3L, 30L)).toDF("id", "v"))             // v2
    // first drain: initial content arrives as the v1 slice
    assert(TxTableStream.followChanges(spark, src, sink) == 2L)
    def feed() = TxTable.snapshot(spark, sink)
      .collect().map(r => (r.getLong(0), r.getString(r.fieldIndex("_change_type")),
        r.getLong(r.fieldIndex("_commit_version")))).sortBy(identity).toSeq
    assert(feed() == Seq((1L, "insert", 1L), (2L, "insert", 1L), (3L, "insert", 2L)))
    // an immediate re-drain is a no-op: the ledger is the offset store
    assert(TxTableStream.followChanges(spark, src, sink) == 2L)
    assert(feed().size == 3)
    // the source moves on: a layout commit (empty slice) + a delete
    TxTable.compact(spark, src)                        // v3 — change-invisible
    TxTable.delete(spark, src, $"id" === 1L)       // v4
    assert(TxTableStream.followChanges(spark, src, sink) == 4L)
    assert(feed() == Seq((1L, "delete", 4L), (1L, "insert", 1L),
      (2L, "insert", 1L), (3L, "insert", 2L)))
    assert(TxTable.lastTxn(spark, sink, "follow").contains(4L))
    // replayed drain after the catch-up: still nothing new
    assert(TxTableStream.followChanges(spark, src, sink) == 4L)
    assert(feed().size == 4)
  }

  test("followChanges(maxVersions): a far-behind follower catches up in bounded " +
      "rate-limited invocations, each restartable through the ledger") {
    val src = fresh()
    val sink = fresh()
    (0 until 5).foreach(i =>
      TxTable.append(spark, src, Seq((i.toLong, i * 10L)).toDF("id", "v")))
    // each invocation drains AT MOST two source versions
    assert(TxTableStream.followChanges(spark, src, sink, maxVersions = Some(2)) == 2L)
    def versionsSeen() = TxTable.snapshot(spark, sink)
      .select("_commit_version").distinct()
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(versionsSeen() == Seq(1L, 2L))
    assert(TxTable.lastTxn(spark, sink, "follow").contains(2L))
    assert(TxTableStream.followChanges(spark, src, sink, maxVersions = Some(2)) == 4L)
    assert(versionsSeen() == Seq(1L, 2L, 3L, 4L))
    // the last invocation clamps to the tip; caught-up returns the tip
    assert(TxTableStream.followChanges(spark, src, sink, maxVersions = Some(2)) == 5L)
    assert(TxTableStream.followChanges(spark, src, sink, maxVersions = Some(2)) == 5L)
    assert(versionsSeen() == Seq(1L, 2L, 3L, 4L, 5L))
    // the rate-limited drains together equal one unlimited drain
    val sink2 = fresh()
    TxTableStream.followChanges(spark, src, sink2)
    val a = TxTable.snapshot(spark, sink).orderBy("_commit_version", "id").collect().toSeq
    val b = TxTable.snapshot(spark, sink2).orderBy("_commit_version", "id").collect().toSeq
    assert(a == b)
  }

  test("maintainEvery: the OPTIMIZE-daemon pass under the ingest keeps the table " +
      "bounded without weakening exactly-once") {
    val dir = fresh()
    val feed = fresh()
    Seq(10L, 11L).toDF("id").coalesce(1).write.mode("append").parquet(feed)
    Seq(12L).toDF("id").coalesce(1).write.mode("append").parquet(feed)
    Seq(13L, 14L).toDF("id").coalesce(1).write.mode("append").parquet(feed)
    TxTable.append(spark, dir, Seq(1L).toDF("id"))
    // aggressive maintenance on every batch: compactSmall + forced
    // checkpoint + vacuum + cleanupLog at horizon 0
    val out1 = TxTableStream.ingest(spark, feed, feedSchema, dir, fresh(),
      writerId = "daemon", maxFilesPerTrigger = Some(1),
      maintainEvery = 1, maintainSmallBytes = 1L << 30, maintainHorizonMs = 0L)
    assert(out1.select("id").collect().map(_.getLong(0)).sorted.toSeq ==
      Seq(1L, 10L, 11L, 12L, 13L, 14L))
    // the daemon bounded all three axes: one live dir, a log whose
    // below-pointer history was reclaimed
    assert(TxTable.liveDirs(spark, dir).size == 1)
    val logDir = java.nio.file.Paths.get(dir, "_log")
    val files = {
      val st = java.nio.file.Files.list(logDir)
      try {
        val it = st.iterator()
        var acc = List.empty[String]
        while (it.hasNext) acc = it.next().getFileName.toString :: acc
        acc.filterNot(_.startsWith(".tmp"))
      } finally st.close()
    }
    assert(files.size <= 4, s"log not bounded by the daemon: $files")
    // the txn ledger rode the forced checkpoints through cleanupLog: a
    // FULL replay under a fresh stream checkpoint lands zero duplicates
    assert(TxTable.lastTxn(spark, dir, "daemon").contains(2L))
    val out2 = TxTableStream.ingest(spark, feed, feedSchema, dir, fresh(),
      writerId = "daemon", maxFilesPerTrigger = Some(1),
      maintainEvery = 1, maintainSmallBytes = 1L << 30, maintainHorizonMs = 0L)
    assert(out2.select("id").collect().map(_.getLong(0)).sorted.toSeq ==
      Seq(1L, 10L, 11L, 12L, 13L, 14L),
      "retention must never weaken the exactly-once ledger")
  }
}
