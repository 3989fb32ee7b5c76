package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkTestBase
import graft.streaming.EventStreams.Event

/** Multi-micro-batch contract of streaming ingest dedup (q57,
  * `dropDuplicatesWithinWatermark`): re-deliveries within the watermark
  * horizon are dropped; state is BOUNDED by that horizon, so the
  * guarantee is scoped to it — a re-delivery with a fresh timestamp
  * after its seen-id entry was evicted escapes (the documented
  * at-least-once-repair trade, not a bug).
  */
class DedupStreamSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(hhmm: String): Timestamp =
    Timestamp.valueOf(s"2024-01-01 $hhmm:00")

  private def run(batches: Seq[Event]*): Seq[Long] = {
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[Event]
    val sink = s"dedup_${System.nanoTime()}"
    val q = source.toDF()
      .withWatermark("ts", "30 minutes")
      .dropDuplicatesWithinWatermark("event_id")
      .writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName(sink).start()
    try {
      batches.foreach { b => source.addData(b); q.processAllAvailable() }
      spark.table(sink).select(col("event_id")).collect().map(_.getLong(0)).toSeq.sorted
    } finally q.stop()
  }

  test("re-delivery within the watermark horizon is dropped, across batches") {
    val out = run(
      Seq(Event(1, ts("10:00"), 1L, "c", 1.0), Event(2, ts("10:05"), 1L, "c", 1.0)),
      Seq(Event(1, ts("10:00"), 1L, "c", 1.0), // exact re-delivery
        Event(1, ts("10:07"), 1L, "c", 1.0),   // same id, drifted ts, still in horizon
        Event(3, ts("10:10"), 1L, "c", 1.0)))
    assert(out == Seq(1L, 2L, 3L), s"got $out")
  }

  test("idempotent append sink drops re-deliveries with NO horizon bound") {
    // the case the watermark-bounded dedup above cannot handle: a
    // re-delivery arbitrarily far past the horizon. The sink anti-joins
    // its own key set, so lateness is irrelevant.
    implicit val sqlCtx = spark.sqlContext
    val dataDir = java.nio.file.Files.createTempDirectory("graft_idem").resolve("data").toString
    val source = MemoryStream[Event]
    val q = source.toDF().writeStream
      .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        EventStreams.idempotentAppendBatch(b.toDF(), dataDir, "event_id")
      }
      .start()
    try {
      source.addData(Seq(
        Event(1, ts("10:00"), 1L, "c", 1.0), Event(2, ts("14:00"), 2L, "c", 1.0),
        Event(2, ts("14:00"), 2L, "c", 1.0))) // in-batch duplicate
      q.processAllAvailable()
      source.addData(Seq(Event(3, ts("14:01"), 3L, "c", 1.0)))
      q.processAllAvailable()
      // id 1 re-delivered days late — far beyond any watermark horizon
      source.addData(Seq(Event(1, ts("23:00"), 1L, "c", 9.0)))
      q.processAllAvailable()
      val ids = spark.read.parquet(dataDir).select(col("event_id"))
        .collect().map(_.getLong(0)).toSeq.sorted
      assert(ids == Seq(1L, 2L, 3L), s"got $ids")
    } finally q.stop()
  }

  test("idempotentAppendStream end-to-end: re-runs append nothing; empty source is not an error") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_idem_e2e")
    val eventsDir = root.resolve("events").toString
    val outDir = root.resolve("out").toString
    Seq(
      (1L, ts("10:00"), 1L, "c", 1.0, "{}"),
      (2L, ts("10:05"), 1L, "c", 1.0, "{}")
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(eventsDir)
    val first = EventStreams.idempotentAppendStream(spark, eventsDir, outDir)
    assert(first.count() == 2L)
    // same checkpoint, no new files: zero batches run, sink unchanged
    val rerun = EventStreams.idempotentAppendStream(spark, eventsDir, outDir)
    assert(rerun.count() == 2L)
    // a source that never produced a batch must yield an empty frame, not throw
    val emptyDir = root.resolve("empty_events").toString
    new java.io.File(emptyDir).mkdirs()
    val none = EventStreams.idempotentAppendStream(
      spark, emptyDir, root.resolve("out2").toString)
    assert(none.count() == 0L)
  }

  test("keyed sink: dedup across batches WITHOUT ever re-reading the data files") {
    val root = java.nio.file.Files.createTempDirectory("graft_idem_keyed")
    val dataDir = root.resolve("data").toString
    val keysDir = root.resolve("keys").toString
    def batchDf(rows: (Long, String)*) =
      rows.map { case (id, t) => Event(id, ts(t), 1L, "c", 1.0) }.toDF()
    EventStreams.idempotentAppendBatchKeyed(
      batchDf(1L -> "10:00", 2L -> "10:05", 2L -> "10:05"), dataDir, keysDir, "event_id", 0L)
    // CORRUPT every data file: if any later batch read them, it would throw
    java.nio.file.Files.walk(java.nio.file.Paths.get(dataDir)).iterator()
      .forEachRemaining { p =>
        if (p.toString.endsWith(".parquet"))
          java.nio.file.Files.write(p, "not parquet".getBytes("UTF-8"))
      }
    // days-late re-delivery of id 1 + novel id 3: anti-join via keys only
    EventStreams.idempotentAppendBatchKeyed(
      batchDf(1L -> "23:00", 3L -> "10:10"), dataDir, keysDir, "event_id", 1L)
    val keys = spark.read.parquet(keysDir).select("event_id")
      .collect().map(_.getLong(0)).toSeq.sorted
    assert(keys == Seq(1L, 2L, 3L), s"got $keys")
    // crash REPLAY of batch 1 (same content, same id): overwrite, not append
    EventStreams.idempotentAppendBatchKeyed(
      batchDf(1L -> "23:00", 3L -> "10:10"), dataDir, keysDir, "event_id", 1L)
    val replayed = spark.read.parquet(keysDir).select("event_id")
      .collect().map(_.getLong(0)).toSeq.sorted
    assert(replayed == Seq(1L, 2L, 3L), s"replay duplicated: $replayed")
  }

  test("idempotentAppendStreamKeyed end-to-end matches the data-scan variant") {
    val root = java.nio.file.Files.createTempDirectory("graft_idem_keyed_e2e")
    val eventsDir = root.resolve("events").toString
    Seq(
      (1L, ts("10:00"), 1L, "c", 1.0, "{}"),
      (2L, ts("10:05"), 1L, "c", 1.0, "{}"),
      (2L, ts("10:05"), 1L, "c", 1.0, "{}") // in-batch duplicate
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(eventsDir)
    val outDir = root.resolve("out").toString
    val first = EventStreams.idempotentAppendStreamKeyed(spark, eventsDir, outDir)
    assert(first.select("event_id").collect().map(_.getLong(0)).toSeq.sorted == Seq(1L, 2L))
    // re-run with the same checkpoint: nothing appends
    val rerun = EventStreams.idempotentAppendStreamKeyed(spark, eventsDir, outDir)
    assert(rerun.count() == 2L)
    // empty source: empty frame, not an error
    val emptyDir = root.resolve("empty").toString
    new java.io.File(emptyDir).mkdirs()
    assert(EventStreams.idempotentAppendStreamKeyed(
      spark, emptyDir, root.resolve("out2").toString).count() == 0L)
  }

  test("a re-delivery after state eviction escapes the dedup (horizon-scoped guarantee)") {
    // b1 emits id 1 (10:00) and advances the watermark to 13:30 via id 2;
    // id 1's seen-entry expires at 10:30 < 13:30, so b2's eviction pass
    // clears it; b3 re-delivers id 1 with a fresh in-horizon timestamp ->
    // it is emitted AGAIN. Cross-horizon exactness needs the batch
    // operator (Dedup.dedupeAgainst) downstream.
    val out = run(
      Seq(Event(1, ts("10:00"), 1L, "c", 1.0), Event(2, ts("14:00"), 2L, "c", 1.0)),
      Seq(Event(3, ts("14:01"), 3L, "c", 1.0)),
      Seq(Event(1, ts("14:05"), 1L, "c", 1.0)))
    assert(out == Seq(1L, 1L, 2L, 3L), s"got $out")
  }
}
