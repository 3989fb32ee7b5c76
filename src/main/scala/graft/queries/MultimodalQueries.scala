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
    }),

    // PIXEL-level perceptual image near-dup (dHash + pigeonhole-banded
    // Hamming, the q22 tail over pixel sketches): deterministic
    // grayscale images are synthesized per doc_id (planted near-dup
    // quads: same base pattern b = doc_id/4, one box-cell perturbed per
    // variant, <= 2 dHash bits each, so same-quad pairs land within
    // hamming 4), ENCODED as real PNGs with the scanline filter type
    // CYCLING 0-4 — then the query runs on the ENCODED BYTES: Inflater
    // decode + all five filter reconstructions + box-downsample + dHash
    // must all be bit-perfect or the closed-form oracle (which computes
    // the same hash from the synthesis arithmetic, never touching PNG)
    // hash-mismatches. The encode->decode round-trip IS the gate.
    "q132_image_dhash_neardup" -> ((s, dir) => {
      val pngs = synthPngs(s, table(s, dir, "documents").select(col("doc_id")))
      val sk = Multimodal.imageDhash(pngs, "doc_id", "png")
      graft.operators.Dedup.hammingPairs64(
          sk, maxHamming = 4, bands = 8, idCol = "doc_id", skCol = "dhash")
        .orderBy("id_a", "id_b")
    }),

    // fixed-point BILINEAR resize on the q132 encoded PNGs — the "true
    // resampling" member of the multimodal plumbing (decode /
    // feature-extract / RESIZE / frame-sample): every coordinate and
    // the 4-tap blend in integer micros with floor division, so the
    // whole encode→decode→interpolate chain is gated bit-exactly
    // through positional checksums by a closed-form oracle
    "q159_image_resize_bilinear" -> ((s, dir) => {
      val pngs = synthPngs(s, table(s, dir, "documents").select(col("doc_id")))
      Multimodal.imageResizeStats(pngs, "doc_id", "png", outW = 10, outH = 7)
        .orderBy("doc_id")
    }),

    // SAMPLE-level perceptual audio near-dup — q132's audio twin, same
    // planted-quad gate on the other modality: deterministic PCM16
    // waveforms per doc_id (base magnitude sequence from b = doc_id/4,
    // variant v boosts ONE envelope frame, touching <= 2 envelope-hash
    // bits; the SIGN of every sample alternates by t, so a decoder that
    // misreads signed little-endian shifts every magnitude), ENCODED as
    // real RIFF/WAVE bytes — the query then runs on the ENCODED BYTES:
    // chunk walk + PCM16 decode + 65-frame energy envelope + difference
    // hash must be bit-perfect or the closed-form oracle (same
    // arithmetic, never touching WAV bytes) hash-mismatches.
    "q136_audio_envelope_neardup" -> ((s, dir) => {
      val wavs = synthWavs(s, table(s, dir, "documents").select(col("doc_id")))
      val sk = Multimodal.audioEnvelopeHash(wavs, "doc_id", "wav")
      graft.operators.Dedup.hammingPairs64(
          sk, maxHamming = 4, bands = 8, idCol = "doc_id", skCol = "ahash")
        .orderBy("id_a", "id_b")
    }),

    // fixed-point linear audio RESAMPLE (2/3 rate) on the q136 encoded
    // WAV bytes — q159's audio twin: RIFF walk + signed-LE PCM16 decode
    // + the offset-floor blend must all be bit-perfect for the
    // closed-form oracle (same arithmetic from the synthesis formula,
    // never touching WAV bytes) to match the positional checksums.
    // The SIGNED samples are the point: the +32768 offset blend
    // computes floor (not truncate-toward-zero) on negatives, exactly
    // like the oracle's HUGEINT // division
    "q173_audio_resample" -> ((s, dir) => {
      val wavs = synthWavs(s, table(s, dir, "documents").select(col("doc_id")))
      Multimodal.audioResampleStats(wavs, "doc_id", "wav", l = 2, m = 3)
        .orderBy("doc_id")
    })
  )

  // q132 synthesis geometry: 18x16 gray -> 2x2 box mean -> the 9x8 dHash
  // grid. Base value stays < 181 and the perturbation adds 36, so no
  // mod-256 wrap anywhere — every step replays as plain BIGINT SQL.
  private val imgW = 18
  private val imgH = 16

  /** Deterministic pixel function, the oracle's twin: base pattern from
    * b = doc_id/4, variant v = doc_id%4 adds +36 to the four pixels of
    * ONE downsampled cell (x//2 = 2v, y//2 = v+2) — flipping at most
    * the two dHash comparisons that touch that cell.
    */
  private def synthPixels(docId: Long): Array[Byte] = {
    val b = docId / 4
    val v = docId % 4
    val px = new Array[Byte](imgW * imgH)
    var y = 0
    while (y < imgH) {
      var x = 0
      while (x < imgW) {
        val base = (x * 73L + y * 151L + b * 97L + x * (y + 3L) * ((b % 7) + 1) +
          x * x * 5L * ((b % 11) + 1) + y * y * 3L * ((b % 13) + 1)) % 181
        val pert = if (v > 0 && x / 2 == v * 2 && y / 2 == v + 2) 36L else 0L
        px(y * imgW + x) = (base + pert).toByte
        x += 1
      }
      y += 1
    }
    px
  }

  /** (doc_id, png): each doc's synthesized pixels encoded as a REAL
    * grayscale PNG, scanline filter cycling 0-4 by row so the decoder's
    * every reconstruction branch sits on the gated path.
    */
  private def synthPngs(s: SparkSession, ids: DataFrame): DataFrame = {
    import org.apache.spark.sql.types._
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("png", BinaryType, nullable = false)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema)
    ids.select(col("doc_id").cast("long"))
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          org.apache.spark.sql.Row(
            id, graft.multimodal.PngCodec.encodeGray(imgW, imgH, synthPixels(id)))
        }
      }(enc)
  }

  // q136 synthesis geometry: 65 envelope frames x 8 samples = 520
  // samples per doc. Magnitudes stay < 12289 + 1500 (the NTT prime keeps
  // the mod SQL-exact and the boost keeps |sample| far below 2^15, so no
  // 16-bit clipping anywhere) — every step replays as plain BIGINT SQL.
  private val audioFrames = 65
  private val audioFrameLen = 8
  private val audioMod = 12289L
  private val audioBoost = 1500L

  /** Deterministic magnitude function, the oracle's twin: base sequence
    * from b = doc_id/4 (quadratic-in-t with b-dependent coefficients, so
    * cross-base envelopes don't stay near-linear-similar — the q132
    * lesson), variant v = doc_id%4 boosts every sample of ONE frame
    * (t/8 = 5v), moving only that frame's energy — flipping at most the
    * two difference-hash bits that touch it.
    */
  private def synthMagnitude(docId: Long, t: Int): Long = {
    val b = docId / 4
    val v = docId % 4
    val base = (t * (73L + (b * b) % 127) + b * 151L + (t % 17) * ((b % 7) + 1) * 29L +
      t.toLong * t * (3L + (b * (b + 5)) % 113)) % audioMod
    if (v > 0 && t / audioFrameLen == v * 5) base + audioBoost else base
  }

  /** (doc_id, wav): each doc's synthesized samples encoded as a REAL
    * mono PCM16 WAV; sample t carries magnitude synthMagnitude with sign
    * (-1)^t, so the signed little-endian decode is on the gated path
    * while the envelope (sum of magnitudes) stays sign-free for the
    * oracle.
    */
  private def synthWavs(s: SparkSession, ids: DataFrame): DataFrame = {
    import org.apache.spark.sql.types._
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("wav", BinaryType, nullable = false)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema)
    val n = audioFrames * audioFrameLen
    ids.select(col("doc_id").cast("long"))
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          val samples = Array.tabulate(n) { t =>
            val m = synthMagnitude(id, t)
            (if (t % 2 == 0) m else -m).toShort
          }
          org.apache.spark.sql.Row(
            id, graft.multimodal.WavCodec.encodePcm16(16000, 1, samples))
        }
      }(enc)
  }

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
          FROM ($stub) ORDER BY doc_id, frame_idx""",
    // q132's closed-form twin: the dHash recomputed from the synthesis
    // ARITHMETIC alone (pixels -> 2x2 box mean -> adjacent-compare bits
    // -> HUGEINT sum -> signed wrap), never touching PNG bytes — so the
    // engine's encode->Inflate->defilter->downsample->hash chain must be
    // bit-perfect to match. Brute-force all-pairs popcount equals the
    // engine's banding exactly (pigeonhole-lossless at hamming<=7 with
    // 8-bit bands).
    "q132_image_dhash_neardup" -> {
      val pow2 = (0 until 64)
        .map(k => s"($k, ${BigInt(1) << k}::HUGEINT)").mkString(", ")
      s"""WITH g AS (SELECT doc_id, doc_id // 4 AS b, doc_id % 4 AS v FROM documents),
          pix AS (
            SELECT doc_id,
                   x, y,
                   (x*73 + y*151 + b*97 + x*(y+3)*((b % 7) + 1) + x*x*5*((b % 11) + 1) + y*y*3*((b % 13) + 1)) % 181
                     + CASE WHEN v > 0 AND x // 2 = v * 2 AND y // 2 = v + 2
                            THEN 36 ELSE 0 END AS gval
            FROM g,
            LATERAL (SELECT UNNEST(GENERATE_SERIES(0, ${imgW - 1})) AS x) ux,
            LATERAL (SELECT UNNEST(GENERATE_SERIES(0, ${imgH - 1})) AS y) uy),
          cells AS (
            SELECT doc_id, x // 2 AS cx, y // 2 AS cy, SUM(gval) // 4 AS p
            FROM pix GROUP BY 1, 2, 3),
          pow2(k, pw) AS (VALUES $pow2),
          bits AS (
            SELECT a.doc_id, a.cy * 8 + a.cx AS k
            FROM cells a JOIN cells b2
              ON b2.doc_id = a.doc_id AND b2.cy = a.cy AND b2.cx = a.cx + 1
            WHERE a.cx < 8 AND b2.p > a.p),
          dhu AS (
            SELECT g.doc_id, COALESCE(SUM(t.pw), 0::HUGEINT) AS hu
            FROM g LEFT JOIN (SELECT doc_id, pw FROM bits JOIN pow2 USING (k)) t
              ON t.doc_id = g.doc_id
            GROUP BY g.doc_id),
          dh AS (SELECT doc_id, ${HashOracleSql.wrapSigned("hu")} AS sk FROM dhu)
          SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                 CAST(bit_count(xor(a.sk, b.sk)) AS BIGINT) AS hamming
          FROM dh a JOIN dh b ON a.doc_id < b.doc_id
          WHERE bit_count(xor(a.sk, b.sk)) <= 4
          ORDER BY id_a, id_b"""
    },
    // q159's closed-form twin: the resize replayed from the synthesis
    // arithmetic alone (same pix CTE as q132; micro-unit source
    // mapping, border clamps, 4-tap blend, floor divisions) — never
    // touching PNG bytes, so the engine's decode + interpolation chain
    // must be bit-perfect to match
    "q159_image_resize_bilinear" ->
      s"""WITH g AS (SELECT doc_id, doc_id // 4 AS b, doc_id % 4 AS v FROM documents),
          pix AS (
            SELECT doc_id,
                   x, y,
                   (x*73 + y*151 + b*97 + x*(y+3)*((b % 7) + 1) + x*x*5*((b % 11) + 1) + y*y*3*((b % 13) + 1)) % 181
                     + CASE WHEN v > 0 AND x // 2 = v * 2 AND y // 2 = v + 2
                            THEN 36 ELSE 0 END AS gval
            FROM g,
            LATERAL (SELECT UNNEST(GENERATE_SERIES(0, ${imgW - 1})) AS x) ux,
            LATERAL (SELECT UNNEST(GENERATE_SERIES(0, ${imgH - 1})) AS y) uy),
          tgt AS (
            SELECT doc_id, dx, dy
            FROM g,
            LATERAL (SELECT UNNEST(GENERATE_SERIES(0, 9)) AS dx) ux,
            LATERAL (SELECT UNNEST(GENERATE_SERIES(0, 6)) AS dy) uy),
          m AS (
            SELECT doc_id, dx, dy,
                   GREATEST((2*dx + 1) * $imgW * 1000000 // 20 - 500000, 0) AS sxm,
                   GREATEST((2*dy + 1) * $imgH * 1000000 // 14 - 500000, 0) AS sym
            FROM tgt),
          c AS (
            SELECT m.*, LEAST(sxm // 1000000, ${imgW - 1}) AS x0,
                   LEAST(sym // 1000000, ${imgH - 1}) AS y0
            FROM m),
          f AS (
            SELECT c.*, sxm - x0 * 1000000 AS fx, sym - y0 * 1000000 AS fy,
                   LEAST(x0 + 1, ${imgW - 1}) AS x1, LEAST(y0 + 1, ${imgH - 1}) AS y1
            FROM c),
          o AS (
            SELECT f.doc_id, f.dy * 10 + f.dx AS k,
                   ((1000000 - fx) * (1000000 - fy) * p00.gval
                    + fx * (1000000 - fy) * p10.gval
                    + (1000000 - fx) * fy * p01.gval
                    + fx * fy * p11.gval) // 1000000000000 AS p
            FROM f
            JOIN pix p00 ON p00.doc_id = f.doc_id AND p00.x = f.x0 AND p00.y = f.y0
            JOIN pix p10 ON p10.doc_id = f.doc_id AND p10.x = f.x1 AND p10.y = f.y0
            JOIN pix p01 ON p01.doc_id = f.doc_id AND p01.x = f.x0 AND p01.y = f.y1
            JOIN pix p11 ON p11.doc_id = f.doc_id AND p11.x = f.x1 AND p11.y = f.y1)
          SELECT doc_id, CAST(10 AS BIGINT) AS out_w, CAST(7 AS BIGINT) AS out_h,
                 CAST(SUM(p) AS BIGINT) AS pix_sum,
                 CAST(SUM((k + 1) * p) AS BIGINT) AS pix_wsum
          FROM o GROUP BY doc_id ORDER BY doc_id""",
    // q136's closed-form twin: the envelope hash recomputed from the
    // synthesis ARITHMETIC alone (magnitudes -> 8-sample frame energy
    // -> adjacent-compare bits -> HUGEINT sum -> signed wrap), never
    // touching WAV bytes — so the engine's RIFF walk + signed-LE PCM16
    // decode + envelope + hash chain must be bit-perfect to match.
    "q136_audio_envelope_neardup" -> {
      val pow2 = (0 until 64)
        .map(k => s"($k, ${BigInt(1) << k}::HUGEINT)").mkString(", ")
      val nSamples = audioFrames * audioFrameLen
      s"""WITH g AS (SELECT doc_id, doc_id // 4 AS b, doc_id % 4 AS v FROM documents),
          mag AS (
            SELECT doc_id, t,
                   (t*(73 + (b*b) % 127) + b*151 + (t % 17)*((b % 7) + 1)*29 + t*t*(3 + (b*(b+5)) % 113)) % $audioMod
                     + CASE WHEN v > 0 AND t // $audioFrameLen = v * 5
                            THEN $audioBoost ELSE 0 END AS m
            FROM g,
            LATERAL (SELECT UNNEST(GENERATE_SERIES(0, ${nSamples - 1})) AS t) ut),
          frames AS (
            SELECT doc_id, t // $audioFrameLen AS f, SUM(m) AS e
            FROM mag GROUP BY 1, 2),
          pow2(k, pw) AS (VALUES $pow2),
          bits AS (
            SELECT a.doc_id, a.f AS k
            FROM frames a JOIN frames b2
              ON b2.doc_id = a.doc_id AND b2.f = a.f + 1
            WHERE a.f < 64 AND b2.e > a.e),
          ahu AS (
            SELECT g.doc_id, COALESCE(SUM(t.pw), 0::HUGEINT) AS hu
            FROM g LEFT JOIN (SELECT doc_id, pw FROM bits JOIN pow2 USING (k)) t
              ON t.doc_id = g.doc_id
            GROUP BY g.doc_id),
          ah AS (SELECT doc_id, ${HashOracleSql.wrapSigned("hu")} AS sk FROM ahu)
          SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                 CAST(bit_count(xor(a.sk, b.sk)) AS BIGINT) AS hamming
          FROM ah a JOIN ah b ON a.doc_id < b.doc_id
          WHERE bit_count(xor(a.sk, b.sk)) <= 4
          ORDER BY id_a, id_b"""
    },
    // q173's closed-form twin: SIGNED samples from the synthesis
    // arithmetic, the same idx/frac mapping and the same offset-floor
    // blend as HUGEINT `//` — never touching WAV bytes
    "q173_audio_resample" -> {
      val nSamples = audioFrames * audioFrameLen
      val outLen = ((nSamples - 1) * 2) / 3 + 1
      s"""WITH g AS (SELECT doc_id, doc_id // 4 AS b, doc_id % 4 AS v FROM documents),
          samp AS (
            SELECT doc_id, t,
                   (CASE WHEN t % 2 = 0 THEN 1 ELSE -1 END) *
                   ((t*(73 + (b*b) % 127) + b*151 + (t % 17)*((b % 7) + 1)*29 + t*t*(3 + (b*(b+5)) % 113)) % $audioMod
                     + CASE WHEN v > 0 AND t // $audioFrameLen = v * 5
                            THEN $audioBoost ELSE 0 END) AS s
            FROM g,
            LATERAL (SELECT UNNEST(GENERATE_SERIES(0, ${nSamples - 1})) AS t) ut),
          o AS (
            SELECT doc_id, k, (k * 3) // 2 AS idx, (k * 3) % 2 AS frac
            FROM g,
            LATERAL (SELECT UNNEST(GENERATE_SERIES(0, ${outLen - 1})) AS k) uk),
          r AS (
            SELECT o.doc_id, o.k,
                   CASE WHEN o.frac = 0 THEN s0.s
                        ELSE ((s0.s + 32768) * (2 - o.frac)
                              + (s1.s + 32768) * o.frac) // 2 - 32768
                   END AS outv
            FROM o
            JOIN samp s0 ON s0.doc_id = o.doc_id AND s0.t = o.idx
            LEFT JOIN samp s1 ON s1.doc_id = o.doc_id AND s1.t = o.idx + 1)
          SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_out,
                 CAST(SUM(outv) AS BIGINT) AS samp_sum,
                 CAST(SUM((k + 1) * outv) AS BIGINT) AS samp_wsum
          FROM r GROUP BY doc_id ORDER BY doc_id"""
    }
  )
}
