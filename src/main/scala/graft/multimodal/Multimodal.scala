package graft.multimodal

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column handling: media payloads travel as opaque `binary`
  * columns with typed metadata structs alongside; decode/feature-extract
  * runs partition-parallel so codec work distributes like any other map.
  *
  * Header METADATA decode is real: payloads carrying a PNG/JPEG/GIF
  * container signature are parsed by [[ImageHeaders]] (pure-JVM layout
  * walk, public formats, no codec libs). Everything else falls back to
  * the deterministic [[decodeStub]] — the `???` boundary where a pixel
  * codec would plug in. The driver testdata's payloads are ASCII text
  * bytes, which cannot carry the PNG/JPEG signatures (both contain
  * bytes > 0x7F); the GIF signature IS ASCII, so the GIF parser demands
  * a structurally valid block walk to the trailer before claiming the
  * bytes (see [[ImageHeaders]]). The stub-arithmetic oracles therefore
  * stay exact on the text path while MultimodalSpec covers real encoded
  * headers.
  */
object Multimodal {

  /** Metadata schema produced by the decoder. */
  val imageMetaSchema: StructType = StructType(Seq(
    StructField("byte_len", LongType, nullable = false),
    StructField("width", LongType, nullable = false),
    StructField("height", LongType, nullable = false),
    StructField("n_frames", LongType, nullable = false),
    StructField("format", StringType, nullable = false)))

  /** Decode one payload's metadata: real container-header parse when the
    * bytes carry a known signature, deterministic stub otherwise.
    */
  def decode(bytes: Array[Byte]): (Long, Long, Long, Long, String) =
    ImageHeaders.parse(bytes) match {
      case Some(m) => (bytes.length.toLong, m.width, m.height, m.nFrames, m.format)
      case None => decodeStub(bytes)
    }

  /** STUB decoder — the fallback for bytes with no recognized container
    * signature, standing in for a full pixel codec (`???` boundary).
    * Deterministic pure function of the bytes so plumbing is testable:
    *   width  = 1 + (first byte % 64),  height = 1 + (last byte % 64),
    *   n_frames = 1 + (byte_len % 8),   format from a leading-byte sniff.
    * A real build replaces ONLY this function with e.g. a JNI codec.
    */
  def decodeStub(bytes: Array[Byte]): (Long, Long, Long, Long, String) = {
    val n = bytes.length.toLong
    if (n == 0) (0L, 0L, 0L, 0L, "empty")
    else {
      val first = bytes(0) & 0xff
      val last = bytes(bytes.length - 1) & 0xff
      val fmt = if (first % 3 == 0) "png" else if (first % 3 == 1) "jpeg" else "webp"
      (n, 1L + first % 64, 1L + last % 64, 1L + n % 8, fmt)
    }
  }

  /** Decode a binary column into metadata columns, partition-parallel.
    * Input: any frame with (`idCol`: long, `binCol`: binary). Output:
    * (idCol, byte_len, width, height, n_frames, format).
    *
    * Implemented with `mapPartitions` (SURVEY preference (d)) because the
    * decode kernel is genuinely imperative per-row byte work — exactly the
    * case the escape hatch exists for; everything before/after stays
    * declarative.
    */
  def decodeImageMeta(df: DataFrame, idCol: String, binCol: String): DataFrame = {
    val outSchema = StructType(
      StructField(idCol, LongType, nullable = false) +: imageMetaSchema.fields.toSeq)
    val enc = RowEncoder.encoderFor(outSchema)
    df.select(col(idCol).cast("long"), col(binCol))
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          val bytes = if (r.isNullAt(1)) Array.emptyByteArray else r.getAs[Array[Byte]](1)
          val (len, w, h, f, fmt) = decode(bytes)
          Row(id, len, w, h, f, fmt)
        }
      }(enc)
  }

  /** Perceptual difference-hash over a REAL-PNG binary column: decode
    * pixels ([[PngCodec.decode]] — Inflater + full filter
    * reconstruction), box-downsample luminance to 9x8, 64-bit dHash
    * ([[PngCodec.dhash64]]). Output (idCol, dhash); rows whose payload
    * is not a decodable non-interlaced 8-bit PNG (or whose dims don't
    * tile the 9x8 grid) are DROPPED — perceptual hashing without pixels
    * is meaningless, and a corrupt payload must degrade, not kill the
    * task. Same mapPartitions shape as the metadata decoders (genuinely
    * imperative per-row byte work, the documented escape hatch).
    */
  def imageDhash(df: DataFrame, idCol: String, binCol: String): DataFrame = {
    val outSchema = StructType(Seq(
      StructField(idCol, LongType, nullable = false),
      StructField("dhash", LongType, nullable = false)))
    val enc = RowEncoder.encoderFor(outSchema)
    df.select(col(idCol).cast("long"), col(binCol))
      .mapPartitions { rows =>
        rows.flatMap { r =>
          val bytes = if (r.isNullAt(1)) Array.emptyByteArray else r.getAs[Array[Byte]](1)
          PngCodec.decode(bytes).flatMap(PngCodec.dhash64)
            .map(h => Row(r.getLong(0), h))
        }
      }(enc)
  }

  /** Bilinear-resize checksum over a REAL-PNG binary column (q159):
    * decode, [[PngCodec.resizeBilinear]] to (outW, outH), and emit the
    * resized image's positional checksums — sum and (k+1)-weighted sum
    * of the output pixels, which pin every output value AND its
    * position. Undecodable payloads drop (the [[imageDhash]] degrade
    * contract). Output: (idCol, out_w, out_h, pix_sum, pix_wsum).
    */
  def imageResizeStats(
      df: DataFrame, idCol: String, binCol: String,
      outW: Int, outH: Int): DataFrame = {
    val outSchema = StructType(Seq(
      StructField(idCol, LongType, nullable = false),
      StructField("out_w", LongType, nullable = false),
      StructField("out_h", LongType, nullable = false),
      StructField("pix_sum", LongType, nullable = false),
      StructField("pix_wsum", LongType, nullable = false)))
    val enc = RowEncoder.encoderFor(outSchema)
    df.select(col(idCol).cast("long"), col(binCol))
      .mapPartitions { rows =>
        rows.flatMap { r =>
          val bytes = if (r.isNullAt(1)) Array.emptyByteArray else r.getAs[Array[Byte]](1)
          PngCodec.decode(bytes).map { img =>
            val px = PngCodec.resizeBilinear(img, outW, outH)
            var s = 0L
            var ws = 0L
            var k = 0
            while (k < px.length) { s += px(k); ws += (k + 1L) * px(k); k += 1 }
            Row(r.getLong(0), outW.toLong, outH.toLong, s, ws)
          }
        }
      }(enc)
  }

  /** Perceptual envelope-hash over a REAL-WAV binary column — the audio
    * twin of [[imageDhash]]: decode PCM16 samples ([[WavCodec
    * .decodePcm16]] — strict chunk walk + sample contract), 65-frame
    * energy envelope, 64-bit difference hash ([[WavCodec
    * .envelopeHash64]]). Output (idCol, ahash); rows whose payload is
    * not a decodable MONO PCM16 WAV (or whose length doesn't tile 65
    * frames) are DROPPED — same degrade-don't-kill contract as the
    * image path (multi-channel audio needs a downmix policy the hash
    * must not invent silently).
    */
  def audioEnvelopeHash(df: DataFrame, idCol: String, binCol: String): DataFrame = {
    val outSchema = StructType(Seq(
      StructField(idCol, LongType, nullable = false),
      StructField("ahash", LongType, nullable = false)))
    val enc = RowEncoder.encoderFor(outSchema)
    df.select(col(idCol).cast("long"), col(binCol))
      .mapPartitions { rows =>
        rows.flatMap { r =>
          val bytes = if (r.isNullAt(1)) Array.emptyByteArray else r.getAs[Array[Byte]](1)
          WavCodec.decodePcm16(bytes)
            .filter(_.channels == 1)
            .flatMap(a => WavCodec.envelopeHash64(a.samples))
            .map(h => Row(r.getLong(0), h))
        }
      }(enc)
  }

  /** Linear-resample checksum over a REAL-WAV binary column (q173) —
    * the audio twin of [[imageResizeStats]]: decode mono PCM16
    * ([[WavCodec.decodePcm16]]), [[WavCodec.resampleLinear]] by l/m,
    * and emit the resampled stream's positional checksums — count, sum
    * and (k+1)-weighted sum, pinning every output value AND position.
    * Undecodable / non-mono payloads drop (the degrade contract).
    * Output: (idCol, n_out, samp_sum, samp_wsum).
    */
  def audioResampleStats(df: DataFrame, idCol: String, binCol: String,
      l: Int, m: Int): DataFrame = {
    val outSchema = StructType(Seq(
      StructField(idCol, LongType, nullable = false),
      StructField("n_out", LongType, nullable = false),
      StructField("samp_sum", LongType, nullable = false),
      StructField("samp_wsum", LongType, nullable = false)))
    val enc = RowEncoder.encoderFor(outSchema)
    df.select(col(idCol).cast("long"), col(binCol))
      .mapPartitions { rows =>
        rows.flatMap { r =>
          val bytes = if (r.isNullAt(1)) Array.emptyByteArray else r.getAs[Array[Byte]](1)
          WavCodec.decodePcm16(bytes)
            .filter(_.channels == 1)
            .map { a =>
              val out = WavCodec.resampleLinear(a.samples, l, m)
              var s = 0L
              var ws = 0L
              var k = 0
              while (k < out.length) { s += out(k); ws += (k + 1L) * out(k); k += 1 }
              Row(r.getLong(0), out.length.toLong, s, ws)
            }
        }
      }(enc)
  }

  /** Audio metadata schema produced by [[decodeAudioMeta]]. */
  val audioMetaSchema: StructType = StructType(Seq(
    StructField("byte_len", LongType, nullable = false),
    StructField("sample_rate", LongType, nullable = false),
    StructField("channels", LongType, nullable = false),
    StructField("n_samples", LongType, nullable = false),
    StructField("format", StringType, nullable = false)))

  /** STUB audio decoder — fallback for bytes with no RIFF/WAVE container,
    * deterministic arithmetic like [[decodeStub]] so the plumbing is
    * oracle-checkable: sample_rate from the first byte, channels from the
    * last, n_samples proportional to length.
    */
  def decodeAudioStub(bytes: Array[Byte]): (Long, Long, Long, Long, String) = {
    val n = bytes.length.toLong
    if (n == 0) (0L, 0L, 0L, 0L, "empty")
    else {
      val first = bytes(0) & 0xff
      val last = bytes(bytes.length - 1) & 0xff
      val rate = Seq(8000L, 16000L, 44100L)(first % 3)
      (n, rate, 1L + last % 2, n * 100 + first, "pcm_stub")
    }
  }

  /** Audio metadata decode: real WAV header parse when the bytes carry a
    * structurally valid RIFF/WAVE layout ([[AudioHeaders]]), stub
    * otherwise. Same partition-parallel shape as [[decodeImageMeta]].
    */
  def decodeAudioMeta(df: DataFrame, idCol: String, binCol: String): DataFrame = {
    val outSchema = StructType(
      StructField(idCol, LongType, nullable = false) +: audioMetaSchema.fields.toSeq)
    val enc = RowEncoder.encoderFor(outSchema)
    df.select(col(idCol).cast("long"), col(binCol))
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          val bytes = if (r.isNullAt(1)) Array.emptyByteArray else r.getAs[Array[Byte]](1)
          val (len, rate, ch, ns, fmt) = AudioHeaders.parseWav(bytes) match {
            case Some(m) =>
              (bytes.length.toLong, m.sampleRate, m.channels, m.nSamples, m.format)
            case None => decodeAudioStub(bytes)
          }
          Row(id, len, rate, ch, ns, fmt)
        }
      }(enc)
  }

  /** Video metadata schema produced by [[decodeVideoMeta]]. */
  val videoMetaSchema: StructType = StructType(Seq(
    StructField("byte_len", LongType, nullable = false),
    StructField("duration_ms", LongType, nullable = false),
    StructField("n_tracks", LongType, nullable = false),
    StructField("width", LongType, nullable = false),
    StructField("height", LongType, nullable = false),
    StructField("format", StringType, nullable = false)))

  /** STUB video decoder — fallback for bytes with no valid ISO-BMFF box
    * tiling, deterministic arithmetic like the image/audio stubs so the
    * plumbing is oracle-checkable.
    */
  def decodeVideoStub(bytes: Array[Byte]): (Long, Long, Long, Long, Long, String) = {
    val n = bytes.length.toLong
    if (n == 0) (0L, 0L, 0L, 0L, 0L, "empty")
    else {
      val first = bytes(0) & 0xff
      val last = bytes(bytes.length - 1) & 0xff
      (n, n * 10 + first, 1L + last % 3,
        16L * (1 + first % 40), 16L * (1 + last % 30), "mp4_stub")
    }
  }

  /** Video metadata decode: real MP4/ISO-BMFF box walk when the bytes
    * tile as valid boxes ([[VideoHeaders]]), stub otherwise. Same
    * partition-parallel shape as [[decodeImageMeta]].
    */
  def decodeVideoMeta(df: DataFrame, idCol: String, binCol: String): DataFrame = {
    val outSchema = StructType(
      StructField(idCol, LongType, nullable = false) +: videoMetaSchema.fields.toSeq)
    val enc = RowEncoder.encoderFor(outSchema)
    df.select(col(idCol).cast("long"), col(binCol))
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          val bytes = if (r.isNullAt(1)) Array.emptyByteArray else r.getAs[Array[Byte]](1)
          val (len, dur, nt, w, h, fmt) = VideoHeaders.parseMp4(bytes) match {
            case Some(m) =>
              (bytes.length.toLong, m.durationMs, m.nTracks, m.width, m.height, "mp4")
            case None => decodeVideoStub(bytes)
          }
          Row(id, len, dur, nt, w, h, fmt)
        }
      }(enc)
  }

  /** Deterministic frame sampling plan for a (stub-)video payload: every
    * `stride`-th frame index below n_frames — the shape of a real
    * frame-extraction fan-out (explode to one row per sampled frame).
    */
  def sampleFrames(meta: DataFrame, idCol: String, stride: Int): DataFrame =
    meta.select(col(idCol), col("n_frames"),
        // empty payload -> n_frames = 0: Spark's sequence(0, -1, +step)
        // throws, so guard with an empty array (no rows after explode —
        // same semantics as SQL GENERATE_SERIES over an empty range)
        explode(when(col("n_frames") > 0,
            sequence(lit(0L), col("n_frames") - 1, lit(stride.toLong)))
          .otherwise(array().cast("array<bigint>"))).as("frame_idx"))
      .select(col(idCol), col("frame_idx"))
}
