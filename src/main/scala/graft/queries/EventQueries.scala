package graft.queries

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables.table
import graft.streaming.EventStreams

/** Streaming/event query surface over `events` (SURVEY §2.9 extension):
  * tumbling-window aggregation in batch and true Structured-Streaming
  * (watermark + AvailableNow) forms, plus gaps-and-islands
  * sessionization. The streaming oracle encodes append-mode semantics:
  * only windows whose end <= final watermark (max ts - delay) are
  * emitted.
  */
object EventQueries extends QueryFamily {

  private val gapMinutes = 30

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q35_events_hourly" -> ((s, dir) =>
      EventStreams.hourlyByType(graft.Tables.events(s, dir))
        .orderBy("window_start", "event_type")),

    "q36_events_hourly_stream" -> ((s, dir) => {
      val out = Files.createTempDirectory("graft_stream_q36").toString
      // stage the single-file table into a directory: file stream sources
      // ingest directories (at scale, the feed lands as files in a dir)
      graft.Tables.events(s, dir).write.parquet(s"$out/staged")
      EventStreams.hourlyByTypeStreaming(s, s"$out/staged", s"$out/result")
        .orderBy("window_start", "event_type")
    }),

    "q37_events_sessionize" -> ((s, dir) =>
      EventStreams.sessionize(graft.Tables.events(s, dir), gapMinutes)
        .withColumn("session_seq", col("session_seq").cast("long"))
        .orderBy("user_id", "session_seq"))
  )

  def oracleSql: Map[String, String] = Map(
    "q35_events_hourly" ->
      """SELECT STRFTIME(DATE_TRUNC('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
                event_type, COUNT(*) AS n_events, ROUND(SUM(value), 2) AS sum_value
         FROM events GROUP BY 1, 2 ORDER BY window_start, event_type""",
    // append-mode + watermark: a window emits iff window_end <= max(ts) - delay
    "q36_events_hourly_stream" ->
      """SELECT STRFTIME(DATE_TRUNC('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
                event_type, COUNT(*) AS n_events, ROUND(SUM(value), 2) AS sum_value
         FROM events
         GROUP BY DATE_TRUNC('hour', ts), event_type
         HAVING DATE_TRUNC('hour', ts) + INTERVAL 1 HOUR
                  <= (SELECT MAX(ts) - INTERVAL 10 MINUTE FROM events)
         ORDER BY window_start, event_type""",
    "q37_events_sessionize" ->
      s"""WITH flagged AS (
            SELECT user_id, ts, value,
                   CASE WHEN LAG(ts) OVER w IS NULL
                          OR EPOCH_MS(ts) - EPOCH_MS(LAG(ts) OVER w) > $gapMinutes * 60000
                        THEN 1 ELSE 0 END AS new_session
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
          numbered AS (
            SELECT user_id, ts, value,
                   SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_seq
            FROM flagged)
          SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,
                 COUNT(*) AS n_events,
                 STRFTIME(MIN(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
                 STRFTIME(MAX(ts), '%Y-%m-%d %H:%M:%S') AS session_end,
                 ROUND(SUM(value), 2) AS sum_value
          FROM numbered GROUP BY user_id, session_seq
          ORDER BY user_id, session_seq"""
  )
}
