package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables.table
import graft.multimodal.Multimodal

/** Multimodal query surface: documents' text bytes stand in for media
  * payloads (binary column). Text bytes carry no PNG/JPEG/GIF container
  * signature, so every row takes the decoder's deterministic stub
  * fallback — SQL-expressible, hence oracle-checkable end-to-end; the
  * real header-parse path is pinned by MultimodalSpec on encoded
  * fixture bytes.
  */
object MultimodalQueries extends QueryFamily {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q33_multimodal_meta" -> ((s, dir) => {
      val bin = table(s, dir, "documents")
        .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
      Multimodal.decodeImageMeta(bin, "doc_id", "payload")
        .orderBy("doc_id")
    }),

    // audio modality: same plumbing/oracle pattern as q33 — text payloads
    // take the deterministic stub (natural text cannot satisfy a valid
    // RIFF/WAVE chunk walk); real WAV headers are pinned by MultimodalSpec
    "q65_multimodal_audio" -> ((s, dir) => {
      val bin = table(s, dir, "documents")
        .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
      Multimodal.decodeAudioMeta(bin, "doc_id", "payload")
        .orderBy("doc_id")
    }),

    // video modality: same plumbing/oracle pattern — text payloads take
    // the deterministic stub (natural text cannot tile as ISO-BMFF
    // boxes); real MP4 boxes are pinned by MultimodalSpec
    "q73_multimodal_video" -> ((s, dir) => {
      val bin = table(s, dir, "documents")
        .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
      Multimodal.decodeVideoMeta(bin, "doc_id", "payload")
        .orderBy("doc_id")
    }),

    "q34_multimodal_frames" -> ((s, dir) => {
      val bin = table(s, dir, "documents")
        .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
      val meta = Multimodal.decodeImageMeta(bin, "doc_id", "payload")
      Multimodal.sampleFrames(meta, "doc_id", stride = 2)
        .orderBy("doc_id", "frame_idx")
    })
  )

  // the decode stub in SQL: width = 1 + first_byte % 64, height = 1 +
  // last_byte % 64, n_frames = 1 + byte_len % 8, format by first_byte % 3
  // (documents text is ASCII, so ascii(char) == byte value)
  private val stub =
    """SELECT doc_id,
              CAST(OCTET_LENGTH(ENCODE(text)) AS BIGINT) AS byte_len,
              CAST(1 + ASCII(SUBSTR(text, 1, 1)) % 64 AS BIGINT) AS width,
              CAST(1 + ASCII(SUBSTR(text, LENGTH(text), 1)) % 64 AS BIGINT) AS height,
              CAST(1 + OCTET_LENGTH(ENCODE(text)) % 8 AS BIGINT) AS n_frames,
              CASE WHEN ASCII(SUBSTR(text, 1, 1)) % 3 = 0 THEN 'png'
                   WHEN ASCII(SUBSTR(text, 1, 1)) % 3 = 1 THEN 'jpeg'
                   ELSE 'webp' END AS format
       FROM documents"""

  private val audioStub =
    """SELECT doc_id,
              CAST(OCTET_LENGTH(ENCODE(text)) AS BIGINT) AS byte_len,
              CAST(CASE ASCII(SUBSTR(text, 1, 1)) % 3
                     WHEN 0 THEN 8000 WHEN 1 THEN 16000 ELSE 44100 END AS BIGINT) AS sample_rate,
              CAST(1 + ASCII(SUBSTR(text, LENGTH(text), 1)) % 2 AS BIGINT) AS channels,
              CAST(OCTET_LENGTH(ENCODE(text)) * 100 + ASCII(SUBSTR(text, 1, 1)) AS BIGINT) AS n_samples,
              'pcm_stub' AS format
       FROM documents"""

  private val videoStub =
    """SELECT doc_id,
              CAST(OCTET_LENGTH(ENCODE(text)) AS BIGINT) AS byte_len,
              CAST(OCTET_LENGTH(ENCODE(text)) * 10 + ASCII(SUBSTR(text, 1, 1)) AS BIGINT) AS duration_ms,
              CAST(1 + ASCII(SUBSTR(text, LENGTH(text), 1)) % 3 AS BIGINT) AS n_tracks,
              CAST(16 * (1 + ASCII(SUBSTR(text, 1, 1)) % 40) AS BIGINT) AS width,
              CAST(16 * (1 + ASCII(SUBSTR(text, LENGTH(text), 1)) % 30) AS BIGINT) AS height,
              'mp4_stub' AS format
       FROM documents"""

  def oracleSql: Map[String, String] = Map(
    "q73_multimodal_video" ->
      s"""SELECT doc_id, byte_len, duration_ms, n_tracks, width, height, format
          FROM ($videoStub) ORDER BY doc_id""",
    "q65_multimodal_audio" ->
      s"""SELECT doc_id, byte_len, sample_rate, channels, n_samples, format
          FROM ($audioStub) ORDER BY doc_id""",
    "q33_multimodal_meta" ->
      s"""SELECT doc_id, byte_len, width, height, n_frames, format
          FROM ($stub) ORDER BY doc_id""",
    "q34_multimodal_frames" ->
      s"""SELECT doc_id, CAST(UNNEST(GENERATE_SERIES(0, n_frames - 1, 2)) AS BIGINT) AS frame_idx
          FROM ($stub) ORDER BY doc_id, frame_idx"""
  )
}
