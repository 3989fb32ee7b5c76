package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkTestBase

class EventStreamsSpec extends SparkTestBase {
  import spark.implicits._

  def ts(s: String): Timestamp = Timestamp.valueOf(s)

  // user 1: two sessions (gap 45 min); user 2: one session
  lazy val events = Seq(
    (1L, ts("2024-01-01 10:00:00"), 1L, "click", 1.0, ""),
    (2L, ts("2024-01-01 10:10:00"), 1L, "view", 2.0, ""),
    (3L, ts("2024-01-01 10:55:00"), 1L, "click", 3.0, ""),
    (4L, ts("2024-01-01 09:00:00"), 2L, "signup", 4.0, ""),
    (5L, ts("2024-01-01 09:20:00"), 2L, "purchase", 5.0, "")
  ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")

  test("sessionize: 30-min gap splits user 1 into two sessions") {
    val s = EventStreams.sessionize(events, gapMinutes = 30)
      .orderBy("user_id", "session_seq").collect()
    assert(s.length == 3)
    assert(s(0).getAs[Long]("n_events") == 2 && s(0).getAs[Double]("sum_value") == 3.0)
    assert(s(1).getAs[Long]("n_events") == 1 && s(1).getAs[String]("session_start") == "2024-01-01 10:55:00")
    assert(s(2).getAs[Long]("user_id") == 2 && s(2).getAs[Long]("n_events") == 2)
  }

  test("hourlyByType batch == streaming result for watermark-complete windows") {
    val dir = Files.createTempDirectory("graft_es").toString
    events.write.parquet(s"$dir/in")
    val streamed = EventStreams.hourlyByTypeStreaming(spark, s"$dir/in", s"$dir/out")
      .orderBy("window_start", "event_type").collect()
    // final watermark = 10:55 - 10min = 10:45 -> only windows ending <= 10:45
    // emit: the 09:00 and 10:00 windows end at 10:00/11:00 -> only 09:00 emits
    val batch = EventStreams.hourlyByType(events)
      .filter($"window_start" < "2024-01-01 10:00:00")
      .orderBy("window_start", "event_type").collect()
    assert(streamed.map(_.toString).toSeq == batch.map(_.toString).toSeq)
    assert(streamed.nonEmpty)
  }

  test("sessionizeStream (flatMapGroupsWithState) closes sessions on gap") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[EventStreams.Event]
    val sessions = EventStreams.sessionizeStream(input.toDS(), gapMinutes = 30)
    val q = sessions.writeStream.format("memory").queryName("sess_out")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData(
        EventStreams.Event(1L, ts("2024-01-01 10:00:00"), 1L, "click", 1.0),
        EventStreams.Event(2L, ts("2024-01-01 10:10:00"), 1L, "view", 2.0))
      q.processAllAvailable()
      // second batch: event past the gap closes session 1 inline
      input.addData(EventStreams.Event(3L, ts("2024-01-01 11:30:00"), 1L, "click", 3.0))
      q.processAllAvailable()
      val out = spark.table("sess_out").collect()
      assert(out.length == 1)
      assert(out(0).getAs[Long]("n_events") == 2 && out(0).getAs[Double]("sum_value") == 3.0)
    } finally q.stop()
  }
}
