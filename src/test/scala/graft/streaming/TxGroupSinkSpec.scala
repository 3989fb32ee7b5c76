package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.SparkTestBase
import graft.sources.{TxGroup, TxTable}

/** `writeStream.format("txgroup")` ([[TxGroupSink]]) — a multiplexed
  * feed routed to member tables by a discriminator column, every
  * micro-batch ONE atomic multi-table commit through the group's txn
  * ledger (batch id = txn id): exactly-once AND skew-free (no version
  * shows one member's slice without the others').
  */
class TxGroupSinkSpec extends SparkTestBase {
  import spark.implicits._

  private def freshDir(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private val feedSchema = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("table",
      org.apache.spark.sql.types.StringType),
    org.apache.spark.sql.types.StructField("id",
      org.apache.spark.sql.types.LongType)))

  /** One multiplexed slice: every id lands in `docs` AND a mirror row
    * in `meta` — so any version where one table's slice committed
    * without the other is detectable as a count mismatch.
    */
  private def muxRows(lo: Long, hi: Long) =
    (lo until hi).flatMap(i => Seq(("docs", i), ("meta", i)))
      .toDF("table", "id")

  private def drain(feed: String, group: String, checkpoint: String,
      opts: Map[String, String] = Map.empty): Unit = {
    var w = spark.readStream.schema(feedSchema)
      .option("maxFilesPerTrigger", 1).parquet(feed)
      .writeStream.format("txgroup")
      .option("checkpointLocation", checkpoint)
    opts.foreach { case (k, v) => w = w.option(k, v) }
    val q = w.trigger(Trigger.AvailableNow()).start(group)
    q.awaitTermination()
  }

  test("each micro-batch is ONE atomic two-table commit; at EVERY " +
      "version the members' slices match; a FULL fresh-checkpoint " +
      "replay under the same explicit writerId commits nothing") {
    val feed = freshDir("gsinkfeed"); val group = freshDir("gsinkgrp")
    muxRows(0, 4).coalesce(1).write.mode("append").parquet(feed)
    muxRows(4, 9).coalesce(1).write.mode("append").parquet(feed)
    muxRows(9, 12).coalesce(1).write.mode("append").parquet(feed)
    drain(feed, group, freshDir("gsinkck"), Map("writerId" -> "mux"))
    val versions = TxTable.versions(spark, group)
    assert(versions.size == 3, s"one version per micro-batch: $versions")
    // the skew-free property: at EVERY version both members agree
    versions.foreach { v =>
      val d = TxGroup.snapshot(spark, group, "docs", Some(v))
        .select("id").collect().map(_.getLong(0)).sorted.toSeq
      val m = TxGroup.snapshot(spark, group, "meta", Some(v))
        .select("id").collect().map(_.getLong(0)).sorted.toSeq
      assert(d == m, s"version $v shows a skewed commit: docs=$d meta=$m")
    }
    assert(TxGroup.snapshot(spark, group, "docs").select("id")
      .collect().map(_.getLong(0)).sorted.toSeq == (0L until 12L))
    assert(TxGroup.lastTxn(spark, group, "mux").contains(2L),
      "batch id is the transaction id")
    // lose the stream checkpoint entirely; re-offer the whole feed —
    // the group's OWN ledger skips every batch whole
    drain(feed, group, freshDir("gsinkck2"), Map("writerId" -> "mux"))
    assert(TxTable.versions(spark, group) == versions)
    assert(TxGroup.snapshot(spark, group, "docs").count() == 12L)
  }

  test("DEFAULT ledger key is the streaming query id (two default-keyed " +
      "queries never collide); statsCols record prunable stats on every " +
      "member slice; the routed group composes with group maintenance") {
    val group = freshDir("gsinkgrp")
    val feedA = freshDir("gsinkfeedA"); val feedB = freshDir("gsinkfeedB")
    muxRows(0, 5).coalesce(1).write.mode("append").parquet(feedA)
    muxRows(5, 8).coalesce(1).write.mode("append").parquet(feedB)
    drain(feedA, group, freshDir("gsinkckA"), Map("statsCols" -> "id"))
    drain(feedB, group, freshDir("gsinkckB"), Map("statsCols" -> "id"))
    assert(TxGroup.snapshot(spark, group, "docs").select("id")
      .collect().map(_.getLong(0)).sorted.toSeq == (0L until 8L),
      "both default-keyed queries' rows must land")
    // stats recorded per member directory → snapshotRange prunes
    val pruned = TxGroup.snapshotRange(spark, group, "docs", "id", 0L, 4L)
    assert(pruned.inputFiles.length <
      TxGroup.snapshot(spark, group, "docs").inputFiles.length,
      "per-slice stats must prune the member read")
    assert(pruned.select("id").collect().map(_.getLong(0)).sorted.toSeq ==
      (0L until 5L))
    // and the routed group is a NORMAL group: the daemon pass folds it
    val m = TxGroup.maintain(spark, group, smallBytes = Long.MaxValue,
      horizonMs = 3600 * 1000L)
    assert(m.compacted.values.forall(_.isDefined))
    assert(TxGroup.snapshot(spark, group, "docs").count() == 8L)
  }

  test("setup rejects non-append modes; a batch without the routing " +
      "column fails with guidance naming tableCol") {
    val feed = freshDir("gsinkfeed"); val group = freshDir("gsinkgrp")
    muxRows(0, 3).coalesce(1).write.mode("append").parquet(feed)
    val e = intercept[Exception] {
      var w = spark.readStream.schema(feedSchema)
        .parquet(feed)
        .writeStream.format("txgroup")
        .option("checkpointLocation", freshDir("gsinkck"))
        .option("tableCol", "nope")
      val q = w.trigger(Trigger.AvailableNow()).start(group)
      q.awaitTermination()
    }
    assert(e.getMessage.contains("nope") ||
      Option(e.getCause).exists(_.getMessage.contains("nope")),
      s"must name the missing routing column: $e")
  }

  test("a NULL discriminator value rejects the batch LOUD, before any " +
      "write (a === null filter matches nothing, so the rows would " +
      "otherwise silently vanish); the group stays empty") {
    val feed = freshDir("gsinkfeed"); val group = freshDir("gsinkgrp")
    Seq((Some("docs"), 0L), (None, 1L), (Some("docs"), 2L))
      .toDF("table", "id").coalesce(1).write.mode("append").parquet(feed)
    val e = intercept[Exception] {
      drain(feed, group, freshDir("gsinkck"), Map("writerId" -> "mux"))
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("NULL in discriminator")),
      s"must name the null route: $e")
    assert(TxTable.tipOrZero(spark, group) == 0L, "nothing may commit")
  }
}
