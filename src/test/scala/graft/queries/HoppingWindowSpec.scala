package graft.queries

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** q147's semantics: with hop dividing duration, every event lands in
  * exactly duration/hop epoch-aligned window instances, and the
  * instance starts are the closed-form floor(epoch/hop)·hop − k·hop.
  */
class HoppingWindowSpec extends SparkTestBase {
  import spark.implicits._

  test("one event belongs to exactly 4 one-hour windows at 15-min hop") {
    val ev = Seq((1L, Timestamp.valueOf("2024-03-05 10:37:12"), 2.0))
      .toDF("event_id", "ts", "value")
    val w = ev.groupBy(window(col("ts"), "1 hour", "15 minutes"))
      .agg(count(lit(1)).as("n"))
      .select(date_format(col("window.start"), "HH:mm").as("s"), col("n"))
      .orderBy("s").collect()
    assert(w.map(_.getString(0)).toSeq == Seq("09:45", "10:00", "10:15", "10:30"))
    assert(w.forall(_.getLong(1) == 1L))
  }

  test("boundary event: a window START is inclusive, the END exclusive") {
    val ev = Seq((1L, Timestamp.valueOf("2024-03-05 10:00:00"), 1.0))
      .toDF("event_id", "ts", "value")
    val starts = ev.groupBy(window(col("ts"), "1 hour", "15 minutes"))
      .agg(count(lit(1)))
      .select(date_format(col("window.start"), "HH:mm").as("s"))
      .orderBy("s").collect().map(_.getString(0)).toSeq
    // 09:00's window [09:00, 10:00) must NOT contain the 10:00 event
    assert(starts == Seq("09:15", "09:30", "09:45", "10:00"))
  }
}
