package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.SparkTestBase
import graft.sources.TxTable

/** `writeStream.format("txtable")` ([[TxTableSink]]) — exactly-once
  * micro-batch appends through the table's own txn ledger (batch id =
  * txn id), resume/replay semantics, option plumbing, and the
  * append-only contract.
  */
class TxTableSinkSpec extends SparkTestBase {
  import spark.implicits._

  private def freshDir(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private val feedSchema = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("id",
      org.apache.spark.sql.types.LongType),
    org.apache.spark.sql.types.StructField("v",
      org.apache.spark.sql.types.StringType)))

  private def rows(lo: Long, hi: Long) =
    (lo until hi).map(i => (i, s"v$i")).toDF("id", "v")

  private def stageFeed(feed: String): Unit = {
    rows(0, 4).coalesce(1).write.mode("append").parquet(feed)
    rows(4, 9).coalesce(1).write.mode("append").parquet(feed)
    rows(9, 12).coalesce(1).write.mode("append").parquet(feed)
  }

  private def drain(feed: String, table: String, checkpoint: String,
      opts: Map[String, String] = Map.empty): Unit = {
    var w = spark.readStream.schema(feedSchema)
      .option("maxFilesPerTrigger", 1).parquet(feed)
      .writeStream.format("txtable")
      .option("checkpointLocation", checkpoint)
    opts.foreach { case (k, v) => w = w.option(k, v) }
    val q = w.trigger(Trigger.AvailableNow()).start(table)
    q.awaitTermination()
  }

  test("three micro-batches land as three ledgered versions; a FULL " +
      "replay under a fresh stream checkpoint with an EXPLICIT writerId " +
      "commits nothing (the ledger is in the table, not the checkpoint)") {
    val feed = freshDir("sinkfeed"); val table = freshDir("sinktbl")
    stageFeed(feed)
    drain(feed, table, freshDir("sinkck"), Map("writerId" -> "loader"))
    assert(TxTable.snapshot(spark, table).select("id").as[Long]
      .collect().sorted.toSeq == (0L until 12L))
    val versions = TxTable.versions(spark, table)
    assert(versions.size == 3, s"one version per micro-batch: $versions")
    assert(TxTable.lastTxn(spark, table, "loader").contains(2L),
      "batch id is the transaction id")
    // the exactly-once half the checkpoint CANNOT give: lose the stream
    // checkpoint entirely, re-offer the whole feed under the SAME
    // explicit writerId — every batch skips at the table's ledger
    drain(feed, table, freshDir("sinkck2"), Map("writerId" -> "loader"))
    assert(TxTable.versions(spark, table) == versions)
    assert(TxTable.snapshot(spark, table).count() == 12L)
  }

  test("DEFAULT ledger key is the streaming query id: two distinct " +
      "default-keyed queries feeding one table both land their data — " +
      "a shared-constant default would make the second query's batches " +
      "replay into the first's high-water mark and silently vanish") {
    val table = freshDir("sinktbl")
    val feedA = freshDir("sinkfeedA"); val feedB = freshDir("sinkfeedB")
    rows(0, 5).coalesce(1).write.mode("append").parquet(feedA)
    rows(5, 8).coalesce(1).write.mode("append").parquet(feedB)
    // two separate queries (fresh checkpoints), both on the default key:
    // each query's id keys its own ledger, so query B's batch 0 is NOT
    // at-or-below query A's mark — nothing is dropped
    drain(feedA, table, freshDir("sinkckA"))
    drain(feedB, table, freshDir("sinkckB"))
    assert(TxTable.snapshot(spark, table).select("id").as[Long]
      .collect().sorted.toSeq == (0L until 8L),
      "both default-keyed queries' rows must land")
    // and each query's ledger survives under its own id, not a shared one
    assert(TxTable.lastTxn(spark, table, "stream-sink").isEmpty,
      "no shared-constant ledger key may exist")
  }

  test("checkpoint resume: a restarted stream appends ONLY the new feed " +
      "files (the TxTableSourceSpec resume discipline, sink side)") {
    val feed = freshDir("sinkfeed"); val table = freshDir("sinktbl")
    val ck = freshDir("sinkck")
    rows(0, 5).coalesce(1).write.mode("append").parquet(feed)
    drain(feed, table, ck)
    assert(TxTable.versions(spark, table).size == 1)
    rows(5, 8).coalesce(1).write.mode("append").parquet(feed)
    drain(feed, table, ck) // SAME checkpoint: only the new file drains
    assert(TxTable.versions(spark, table).size == 2)
    assert(TxTable.snapshot(spark, table).select("id").as[Long]
      .collect().sorted.toSeq == (0L until 8L))
  }

  test("statsCols option records pruning stats; compactEvery compacts " +
      "mid-stream without changing answers") {
    val feed = freshDir("sinkfeed"); val table = freshDir("sinktbl")
    stageFeed(feed)
    drain(feed, table, freshDir("sinkck"),
      Map("writerId" -> "w1", "statsCols" -> "id", "compactEvery" -> "2"))
    assert(TxTable.snapshot(spark, table).select("id").as[Long]
      .collect().sorted.toSeq == (0L until 12L))
    // recorded stats prune a point read to fewer files than the tip scan
    val pruned = TxTable.snapshotWhere(spark, table,
      Seq(TxTable.LongRange("id", 10L, 11L)))
    assert(pruned.select("id").as[Long].collect().sorted.toSeq == Seq(10L, 11L))
    assert(pruned.inputFiles.length <
      TxTable.snapshot(spark, table).inputFiles.length)
    assert(TxTable.lastTxn(spark, table, "w1").contains(2L))
  }

  test("the sink rejects non-append output modes and partition columns " +
      "at setup") {
    val feed = freshDir("sinkfeed"); val table = freshDir("sinktbl")
    stageFeed(feed)
    val agg = spark.readStream.schema(feedSchema).parquet(feed)
      .groupBy("v").count()
    val e = intercept[Exception] {
      agg.writeStream.format("txtable")
        .outputMode("complete")
        .option("checkpointLocation", freshDir("sinkck"))
        .trigger(Trigger.AvailableNow()).start(table)
        .awaitTermination()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("append-only")))
    val e2 = intercept[Exception] {
      spark.readStream.schema(feedSchema).parquet(feed)
        .writeStream.format("txtable")
        .partitionBy("v")
        .option("checkpointLocation", freshDir("sinkck2"))
        .trigger(Trigger.AvailableNow()).start(table)
        .awaitTermination()
    }
    assert(messages(e2).exists(_.contains("statsCols")))
  }

  test("round-trip: a txtable-to-txtable pipe through format source AND " +
      "sink preserves content exactly-once") {
    val src = freshDir("pipesrc"); val dst = freshDir("pipedst")
    TxTable.append(spark, src, rows(0, 4))
    TxTable.append(spark, src, rows(4, 7))
    val q = spark.readStream.format("txtable").load(src)
      .filter(col("_change_type") === "insert").select("id", "v")
      .writeStream.format("txtable")
      .option("writerId", "pipe")
      .option("checkpointLocation", freshDir("pipeck"))
      .trigger(Trigger.AvailableNow()).start(dst)
    q.awaitTermination()
    assert(TxTable.snapshot(spark, dst).select("id").as[Long]
      .collect().sorted.toSeq == (0L until 7L))
  }
}
