package graft.multimodal

/** Pure-JVM WAV PCM16 SAMPLE codec — the audio rung below
  * [[AudioHeaders]]'s metadata walk, and the WAV counterpart of
  * [[PngCodec]]: real bytes in, real samples out, no audio libraries.
  *
  * Scope (the documented codec boundary, mirroring PngCodec's
  * "non-interlaced 8-bit" line): uncompressed PCM (`fmt` audioFormat=1),
  * 16-bit little-endian samples — the dominant uncompressed interchange
  * shape. Anything else (compressed codecs, 8/24/32-bit, float) returns
  * None and degrades to the [[Multimodal]] stub path; a parser must
  * never guess at sample semantics it can't verify.
  *
  * Reference scope: the reference has no audio handling at all
  * (`src/etl_pipeline.py` is CSV/pandas end-to-end); this is extension
  * surface for the multimodal dedup family (q136 beside q132's image
  * dHash).
  */
object WavCodec {

  /** Decoded PCM16 audio: meta + interleaved samples (frame-major,
    * channel-minor — the RIFF data layout, kept verbatim).
    */
  final case class Audio(sampleRate: Int, channels: Int, samples: Array[Short])

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff
  private def le16(b: Array[Byte], i: Int): Int = u8(b, i) | (u8(b, i + 1) << 8)
  private def le32(b: Array[Byte], i: Int): Long =
    u8(b, i).toLong | (u8(b, i + 1).toLong << 8) |
      (u8(b, i + 2).toLong << 16) | (u8(b, i + 3).toLong << 24)
  private def cc(b: Array[Byte], i: Int, t: String): Boolean =
    i + 4 <= b.length && (0 until 4).forall(k => u8(b, i + k) == t.charAt(k))

  /** Decode a PCM16 WAV. Strict like [[AudioHeaders.parseWav]] (full
    * chunk walk, every declared size in-bounds) PLUS the sample
    * contract: audioFormat must be 1 (PCM), bits 16, blockAlign
    * channels*2, and the data chunk length a whole number of frames.
    */
  def decodePcm16(b: Array[Byte]): Option[Audio] = {
    if (b.length < 44 || !cc(b, 0, "RIFF") || !cc(b, 8, "WAVE")) return None
    var i = 12
    var fmt: Option[(Int, Int)] = None // channels, rate
    var dataOff = -1
    var dataLen = -1L
    while (i + 8 <= b.length && (fmt.isEmpty || dataOff < 0)) {
      val size = le32(b, i + 4)
      if (size < 0 || i + 8 + size > b.length) return None
      if (cc(b, i, "fmt ")) {
        if (size < 16) return None
        val audioFormat = le16(b, i + 8)
        val channels = le16(b, i + 10)
        val rate = le32(b, i + 12)
        val blockAlign = le16(b, i + 20)
        val bits = le16(b, i + 22)
        if (audioFormat != 1 || bits != 16 || channels <= 0 || rate <= 0 ||
          rate > Int.MaxValue || blockAlign != channels * 2) return None
        fmt = Some((channels, rate.toInt))
      } else if (cc(b, i, "data")) {
        dataOff = i + 8
        dataLen = size
      }
      i += 8 + size.toInt + (size.toInt & 1) // chunks pad to even
    }
    fmt.flatMap { case (channels, rate) =>
      if (dataOff < 0 || dataLen % (channels * 2) != 0) None
      else {
        val n = (dataLen / 2).toInt
        val out = new Array[Short](n)
        var k = 0
        while (k < n) {
          out(k) = le16(b, dataOff + 2 * k).toShort
          k += 1
        }
        Some(Audio(rate, channels, out))
      }
    }
  }

  /** Encode interleaved PCM16 samples as a minimal canonical WAV
    * (RIFF + `fmt ` + `data`, little-endian throughout).
    */
  def encodePcm16(sampleRate: Int, channels: Int, samples: Array[Short]): Array[Byte] = {
    require(sampleRate > 0 && channels > 0, "positive sampleRate/channels")
    require(samples.length % channels == 0, "samples must be whole frames")
    val dataLen = samples.length * 2
    val out = new Array[Byte](44 + dataLen)
    def put4(i: Int, t: String): Unit =
      (0 until 4).foreach(k => out(i + k) = t.charAt(k).toByte)
    def putLe16(i: Int, v: Int): Unit = {
      out(i) = (v & 0xff).toByte; out(i + 1) = ((v >> 8) & 0xff).toByte
    }
    def putLe32(i: Int, v: Long): Unit = (0 until 4).foreach(k =>
      out(i + k) = ((v >> (8 * k)) & 0xff).toByte)
    put4(0, "RIFF"); putLe32(4, 36L + dataLen); put4(8, "WAVE")
    put4(12, "fmt "); putLe32(16, 16L)
    putLe16(20, 1); putLe16(22, channels)
    putLe32(24, sampleRate.toLong); putLe32(28, sampleRate.toLong * channels * 2)
    putLe16(32, channels * 2); putLe16(34, 16)
    put4(36, "data"); putLe32(40, dataLen.toLong)
    var k = 0
    while (k < samples.length) {
      putLe16(44 + 2 * k, samples(k) & 0xffff)
      k += 1
    }
    out
  }

  /** Fixed-point LINEAR resample by the rational factor l/m (out rate =
    * in rate · l/m): output sample k reads source position k·m/l — idx =
    * (k·m) div l, frac = (k·m) mod l — and blends the two neighbors with
    * integer weights. The blend runs on the +32768-OFFSET unsigned value
    * and subtracts the offset after the division: the offset term is
    * divisible by l, so this computes FLOOR of the true blend even for
    * negative samples (a direct signed `/` would truncate toward zero —
    * the engine/oracle divergence this offset exists to kill; pinned by
    * WavCodecSpec). Output length: every k with k·m ≤ (n−1)·l, i.e.
    * ((n−1)·l) div m + 1 — first and last input samples are preserved
    * exactly, no extrapolation past the ends.
    */
  def resampleLinear(samples: Array[Short], l: Int, m: Int): Array[Short] = {
    require(l > 0 && m > 0, "positive rational factor l/m")
    if (samples.isEmpty) return Array.emptyShortArray
    val n = samples.length
    val outLen = (((n - 1).toLong * l) / m).toInt + 1
    val out = new Array[Short](outLen)
    var k = 0
    while (k < outLen) {
      val pos = k.toLong * m
      val idx = (pos / l).toInt
      val frac = (pos % l).toInt
      val v =
        if (frac == 0) samples(idx).toLong
        else {
          val s0 = samples(idx) + 32768L
          val s1 = samples(idx + 1) + 32768L
          (s0 * (l - frac) + s1 * frac) / l - 32768L
        }
      out(k) = v.toShort
      k += 1
    }
    out
  }

  /** 64-bit envelope DIFFERENCE hash — the audio analogue of
    * [[PngCodec.dhash64]]: the sample stream splits into 65 equal
    * frames, each frame's energy is the integer sum of sample
    * MAGNITUDES, and bit k (k = 0..63) is set when frame k+1's energy
    * exceeds frame k's. Loudness-trend shape, robust to small local
    * edits, integer-exact (closed-form oracle-able). None when the
    * length doesn't tile 65 frames — envelope bits over ragged frames
    * would not be comparable across documents.
    */
  def envelopeHash64(samples: Array[Short]): Option[Long] = {
    if (samples.length == 0 || samples.length % 65 != 0) return None
    val flen = samples.length / 65
    val e = new Array[Long](65)
    var i = 0
    while (i < samples.length) {
      e(i / flen) += math.abs(samples(i).toLong)
      i += 1
    }
    var h = 0L
    var k = 0
    while (k < 64) {
      if (e(k + 1) > e(k)) h |= (1L << k)
      k += 1
    }
    Some(h)
  }
}
