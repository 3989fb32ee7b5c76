package graft.streaming

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.SparkTestBase
import graft.sources.TxTable

/** `readStream.format("txtable")` ([[TxTableSource]]) — the commit log
  * as a REAL Structured Streaming source: version offsets, per-version
  * change slices, checkpoint-resume exactly-once, rate limiting.
  */
class TxTableSourceSpec extends SparkTestBase {
  import spark.implicits._

  private def freshDir(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private def rows(lo: Long, hi: Long) =
    (lo until hi).map(i => (i, i * 10)).toDF("id", "v")

  /** Drain every available version into a buffer via foreachBatch,
    * one-shot (AvailableNow), and return the collected (batchRows,
    * versionsInBatch) plus the query's own row view.
    */
  private def drain(src: String, checkpoint: String,
      sink: scala.collection.mutable.ArrayBuffer[Row],
      batches: scala.collection.mutable.ArrayBuffer[Seq[Long]],
      maxVersionsPerTrigger: Option[Int] = None): Unit = {
    var reader = spark.readStream.format("txtable")
    maxVersionsPerTrigger.foreach(m =>
      reader = reader.option("maxVersionsPerTrigger", m.toString))
    val q = reader.load(src)
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val got = batch.collect()
        sink.synchronized {
          sink ++= got
          batches += got.map(_.getLong(got.head.fieldIndex("_commit_version")))
            .distinct.sorted.toSeq
        }
        ()
      }
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  test("an AvailableNow drain equals the whole per-version change feed") {
    val src = freshDir("txsrc")
    TxTable.append(spark, src, rows(0, 4))
    TxTable.append(spark, src, rows(4, 8))
    TxTable.delete(spark, src, col("id") === 1L)
    val sink = scala.collection.mutable.ArrayBuffer.empty[Row]
    val batches = scala.collection.mutable.ArrayBuffer.empty[Seq[Long]]
    drain(src, freshDir("txck"), sink, batches)
    val want = TxTable.tableChangesByVersion(spark, src, 0L, 3L)
      .select("id", "v", "_change_type", "_commit_version").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
      .sortBy(identity).toSeq
    val got = sink
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
      .sortBy(identity).toSeq
    assert(got == want, "the drained stream must equal the change feed")
    assert(got.count(_._3 == "delete") == 1)
  }

  test("checkpoint resume: a restarted stream emits ONLY versions past " +
      "the committed offset — exactly-once across restarts") {
    val src = freshDir("txsrc")
    val ck = freshDir("txck")
    TxTable.append(spark, src, rows(0, 3))
    TxTable.append(spark, src, rows(3, 6))
    val sink = scala.collection.mutable.ArrayBuffer.empty[Row]
    val batches = scala.collection.mutable.ArrayBuffer.empty[Seq[Long]]
    drain(src, ck, sink, batches)
    assert(sink.size == 6)
    // the source moves on while the stream is down
    TxTable.append(spark, src, rows(6, 9))
    TxTable.delete(spark, src, col("id") === 0L)
    drain(src, ck, sink, batches)
    val byVersion = sink.groupBy(_.getLong(3)).view.mapValues(_.size).toMap
    assert(byVersion == Map(1L -> 3, 2L -> 3, 3L -> 3, 4L -> 1),
      s"no version may re-emit after resume: $byVersion")
    // an idle restart (nothing new) emits nothing
    drain(src, ck, sink, batches)
    assert(sink.size == 10)
  }

  test("maxVersionsPerTrigger rate-limits the catch-up: one version per " +
      "micro-batch once the offset floor is known") {
    val src = freshDir("txsrc")
    val ck = freshDir("txck")
    TxTable.append(spark, src, rows(0, 2))
    val sink = scala.collection.mutable.ArrayBuffer.empty[Row]
    val batches = scala.collection.mutable.ArrayBuffer.empty[Seq[Long]]
    // first drain pins the floor at v1
    drain(src, ck, sink, batches, maxVersionsPerTrigger = Some(1))
    // a 3-version backlog then arrives one commit per batch
    TxTable.append(spark, src, rows(2, 4))
    TxTable.append(spark, src, rows(4, 6))
    TxTable.append(spark, src, rows(6, 8))
    drain(src, ck, sink, batches, maxVersionsPerTrigger = Some(1))
    assert(sink.size == 8)
    assert(batches.forall(_.size <= 1),
      s"each micro-batch must carry at most one version: $batches")
    assert(batches.flatten.toSeq == Seq(1L, 2L, 3L, 4L),
      s"versions must arrive in order: $batches")
  }

  test("startingVersion / startingTimestamp begin the feed mid-history") {
    val src = freshDir("txsrc")
    TxTable.append(spark, src, rows(0, 2))  // v1
    TxTable.append(spark, src, rows(2, 4))  // v2
    TxTable.append(spark, src, rows(4, 6))  // v3
    def drainWith(opts: Map[String, String]): Seq[Long] = {
      val sink = scala.collection.mutable.ArrayBuffer.empty[Long]
      var reader = spark.readStream.format("txtable")
      opts.foreach { case (k, v) => reader = reader.option(k, v) }
      val q = reader.load(src)
        .writeStream
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          val got = batch.select("_commit_version").collect().map(_.getLong(0))
          sink.synchronized { sink ++= got }
          ()
        }
        .option("checkpointLocation", freshDir("txck"))
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      sink.sorted.toSeq
    }
    assert(drainWith(Map("startingVersion" -> "2")) == Seq(2L, 2L, 3L, 3L))
    // the cut at v1's own in-commit timestamp: strictly-after => v2 on
    val ts1 = TxTable.history(spark, src).filter(col("version") === 1L)
      .head().getLong(1)
    val lit = java.time.LocalDateTime.ofInstant(
        java.time.Instant.ofEpochMilli(ts1), java.time.ZoneOffset.UTC)
      .format(java.time.format.DateTimeFormatter
        .ofPattern("yyyy-MM-dd HH:mm:ss.SSS"))
    assert(drainWith(Map("startingTimestamp" -> lit)) == Seq(2L, 2L, 3L, 3L))
    // a cut predating retained history = the whole feed
    assert(drainWith(Map("startingTimestamp" -> "1999-01-01 00:00:00"))
      == Seq(1L, 1L, 2L, 2L, 3L, 3L))
    // tip+1 is legal: an empty feed that waits for the NEXT commit — and
    // it picks up exactly that commit when one lands
    assert(drainWith(Map("startingVersion" -> "4")) == Nil)
    TxTable.append(spark, src, rows(6, 8)) // v4
    assert(drainWith(Map("startingVersion" -> "4")) == Seq(4L, 4L))
    // past tip+1 fails AT SETUP with guidance, not mid-stream inside the
    // first batch's range check
    val e = intercept[Exception] {
      drainWith(Map("startingVersion" -> "9"))
    }
    assert(e.getMessage.contains("past the committed history") ||
      Option(e.getCause).exists(_.getMessage.contains("past the committed history")))
  }

  test("startingTimestamp resolves through the SESSION timezone, " +
      "matching the TVF TIMESTAMP surface") {
    val src = freshDir("txsrc")
    TxTable.append(spark, src, rows(0, 2))  // v1
    TxTable.append(spark, src, rows(2, 4))  // v2
    val ts1 = TxTable.history(spark, src).filter(col("version") === 1L)
      .head().getLong(1)
    // v1's in-commit instant, printed as an Asia/Tokyo wall clock: under
    // a Tokyo session it must cut exactly like the UTC string did under
    // UTC (strictly-after => v2 on); under the default UTC session the
    // SAME string would land 9 hours later and cut the feed differently
    val tokyo = java.time.LocalDateTime.ofInstant(
        java.time.Instant.ofEpochMilli(ts1), java.time.ZoneId.of("Asia/Tokyo"))
      .format(java.time.format.DateTimeFormatter
        .ofPattern("yyyy-MM-dd HH:mm:ss.SSS"))
    val prev = spark.conf.get("spark.sql.session.timeZone")
    try {
      spark.conf.set("spark.sql.session.timeZone", "Asia/Tokyo")
      val sink = scala.collection.mutable.ArrayBuffer.empty[Long]
      val q = spark.readStream.format("txtable")
        .option("startingTimestamp", tokyo).load(src)
        .writeStream
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          val got = batch.select("_commit_version").collect().map(_.getLong(0))
          sink.synchronized { sink ++= got }
          ()
        }
        .option("checkpointLocation", freshDir("txck"))
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      assert(sink.sorted.toSeq == Seq(2L, 2L))
    } finally spark.conf.set("spark.sql.session.timeZone", prev)
  }

  test("an additively-evolved table streams from scratch: pre-evolution " +
      "slices read the new column as typed nulls") {
    val src = freshDir("txsrc")
    TxTable.append(spark, src, rows(0, 3)) // v1: (id, v)
    TxTable.append(spark, src,
      (3L until 5L).map(i => (i, i * 10, s"t$i")).toDF("id", "v", "tag"),
      allowAdditive = true) // v2: (id, v, tag)
    val sink = scala.collection.mutable.ArrayBuffer.empty[Row]
    val batches = scala.collection.mutable.ArrayBuffer.empty[Seq[Long]]
    // one wide batch spans the evolution AND (with rate limit 1) the
    // per-version batches predate it — both shapes must type correctly
    drain(src, freshDir("txck"), sink, batches)
    assert(sink.size == 5)
    val byId = sink.map(r => r.getLong(0) ->
      (if (r.isNullAt(r.fieldIndex("tag"))) null else r.getString(r.fieldIndex("tag")))).toMap
    assert((0L to 2L).forall(byId(_) == null),
      "pre-evolution rows must read the new column as null")
    assert(byId(3L) == "t3" && byId(4L) == "t4")
    // rate-limited: the v1-only batch predates the evolution entirely
    val sink2 = scala.collection.mutable.ArrayBuffer.empty[Row]
    drain(src, freshDir("txck2"), sink2,
      scala.collection.mutable.ArrayBuffer.empty[Seq[Long]],
      maxVersionsPerTrigger = Some(1))
    assert(sink2.size == 5)
  }

  test("startingTimestamp that predates a CLEANED log fails at setup " +
      "with guidance, not mid-stream with a missing entry") {
    val src = freshDir("txsrc")
    (0 until 10).foreach(i => TxTable.append(spark, src, rows(i * 2, i * 2 + 2)))
    val ts1 = TxTable.history(spark, src).filter(col("version") === 1L)
      .head().getLong(1)
    assert(TxTable.cleanupLog(spark, src, retainMs = 0L).nonEmpty)
    val lit = java.time.LocalDateTime.ofInstant(
        java.time.Instant.ofEpochMilli(ts1 - 1), java.time.ZoneOffset.UTC)
      .format(java.time.format.DateTimeFormatter
        .ofPattern("yyyy-MM-dd HH:mm:ss.SSS"))
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      val q = spark.readStream.format("txtable")
        .option("startingTimestamp", lit).load(src)
        .writeStream
        .foreachBatch { (_: org.apache.spark.sql.DataFrame, _: Long) => () }
        .option("checkpointLocation", freshDir("txck"))
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e).exists(_.contains("predates the retained history")),
      msgs(e).mkString(" | "))
  }

  test("layout commits advance the offset with empty slices; the sink " +
      "sees no phantom rows") {
    val src = freshDir("txsrc")
    val ck = freshDir("txck")
    TxTable.append(spark, src, rows(0, 3))
    TxTable.append(spark, src, rows(3, 6))
    TxTable.compact(spark, src) // v3: snapshot-neutral
    val sink = scala.collection.mutable.ArrayBuffer.empty[Row]
    val batches = scala.collection.mutable.ArrayBuffer.empty[Seq[Long]]
    drain(src, ck, sink, batches)
    assert(sink.size == 6, "a compaction must contribute no change rows")
    assert(sink.forall(_.getString(2) == "insert"))
    // and the offset DID advance past it: a redrain emits nothing
    drain(src, ck, sink, batches)
    assert(sink.size == 6)
  }
}
