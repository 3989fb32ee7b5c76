package graft.multimodal

/** Minimal pure-JVM WAV (RIFF) header parser — the audio counterpart of
  * [[ImageHeaders]]: container METADATA (sample rate, channels, sample
  * count) from the public chunk layout, no codec.
  *
  * STRICT like the GIF parser, and for the same reason: "RIFF"/"WAVE"
  * and the chunk 4CCs are pure ASCII, so signature alone must not claim
  * a text payload. Acceptance requires the full chunk walk to find a
  * well-formed `fmt ` chunk (PCM-shaped fields: positive channels,
  * sample rate, block align) AND a `data` chunk, with every declared
  * chunk size staying in bounds — natural text cannot satisfy that
  * layout.
  */
object AudioHeaders {

  final case class Meta(sampleRate: Long, channels: Long, bitsPerSample: Long,
      nSamples: Long, format: String)

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff
  private def le16(b: Array[Byte], i: Int): Int = u8(b, i) | (u8(b, i + 1) << 8)
  private def le32(b: Array[Byte], i: Int): Long =
    u8(b, i).toLong | (u8(b, i + 1).toLong << 8) |
      (u8(b, i + 2).toLong << 16) | (u8(b, i + 3).toLong << 24)
  private def cc(b: Array[Byte], i: Int, t: String): Boolean =
    i + 4 <= b.length && (0 until 4).forall(k => u8(b, i + k) == t.charAt(k))

  def parseWav(b: Array[Byte]): Option[Meta] = {
    if (b.length < 44 || !cc(b, 0, "RIFF") || !cc(b, 8, "WAVE")) return None
    var i = 12
    var fmt: Option[(Int, Long, Int, Int)] = None // channels, rate, blockAlign, bits
    var dataBytes = -1L
    while (i + 8 <= b.length && (fmt.isEmpty || dataBytes < 0)) {
      val size = le32(b, i + 4)
      // the declared chunk payload must fit the buffer FROM ITS OFFSET —
      // checking `size <= length` alone would accept a truncated file
      // whose final chunk overruns the end
      if (size < 0 || i + 8 + size > b.length) return None
      if (cc(b, i, "fmt ")) {
        if (size < 16 || i + 8 + 16 > b.length) return None
        val channels = le16(b, i + 10)
        val rate = le32(b, i + 12)
        val blockAlign = le16(b, i + 20)
        val bits = le16(b, i + 22)
        if (channels <= 0 || rate <= 0 || blockAlign <= 0) return None
        fmt = Some((channels, rate, blockAlign, bits))
      } else if (cc(b, i, "data")) {
        dataBytes = size
      }
      i += 8 + size.toInt + (size.toInt & 1) // chunks pad to even
    }
    fmt.flatMap { case (channels, rate, blockAlign, bits) =>
      if (dataBytes < 0) None
      else Some(Meta(rate, channels, bits, dataBytes / blockAlign, "wav"))
    }
  }
}
