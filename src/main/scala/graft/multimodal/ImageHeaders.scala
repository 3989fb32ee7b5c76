package graft.multimodal

/** Minimal pure-JVM image-container header parsers — no codec libraries,
  * just the public container layouts:
  *
  *   - PNG (ISO/IEC 15948): 8-byte signature, IHDR width/height, and the
  *     APNG `acTL` chunk's frame count when present;
  *   - JPEG (ITU-T T.81): marker-segment walk to the first SOFn frame
  *     header for height/width;
  *   - GIF (87a/89a): logical-screen descriptor dimensions plus a block
  *     walk counting image descriptors (animation frame count).
  *
  * Pixel DECODING stays out of scope by design (no codec libs in this
  * environment); header metadata is what the pipeline operators
  * (filtering by dimensions, frame-sampling plans) actually consume.
  * Anything that doesn't carry one of these signatures returns None and
  * the caller falls back to its deterministic stub.
  */
object ImageHeaders {

  final case class Meta(width: Long, height: Long, nFrames: Long, format: String)

  def parse(b: Array[Byte]): Option[Meta] =
    parsePng(b).orElse(parseJpeg(b)).orElse(parseGif(b))

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff
  private def be16(b: Array[Byte], i: Int): Int = (u8(b, i) << 8) | u8(b, i + 1)
  private def be32(b: Array[Byte], i: Int): Long =
    (u8(b, i).toLong << 24) | (u8(b, i + 1) << 16) | (u8(b, i + 2) << 8) | u8(b, i + 3)
  private def le16(b: Array[Byte], i: Int): Int = u8(b, i) | (u8(b, i + 1) << 8)

  private val PngSig = Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a)

  /** PNG: signature, then chunks of [len be32][type 4][data len][crc 4];
    * IHDR (mandatory first chunk) carries width/height; an APNG `acTL`
    * chunk (before the first frame data) carries the animation frame
    * count — default 1 when absent.
    */
  private def parsePng(b: Array[Byte]): Option[Meta] = {
    if (b.length < 33 || (0 until 8).exists(i => u8(b, i) != PngSig(i))) return None
    if (!chunkTypeIs(b, 12, "IHDR")) return None
    val w = be32(b, 16)
    val h = be32(b, 20)
    // chunk walk for acTL (stop at the first IDAT — acTL must precede it)
    var i = 8
    var frames = 1L
    var done = false
    while (!done && i + 8 <= b.length) {
      val len = be32(b, i)
      if (len < 0 || len > Int.MaxValue - 12) done = true
      else {
        if (chunkTypeIs(b, i + 4, "acTL") && i + 12 <= b.length) {
          frames = math.max(1L, be32(b, i + 8))
          done = true
        } else if (chunkTypeIs(b, i + 4, "IDAT") || chunkTypeIs(b, i + 4, "IEND")) {
          done = true
        }
        i += 12 + len.toInt
      }
    }
    Some(Meta(w, h, frames, "png"))
  }

  private def chunkTypeIs(b: Array[Byte], i: Int, t: String): Boolean =
    i + 4 <= b.length && (0 until 4).forall(k => u8(b, i + k) == t.charAt(k))

  /** JPEG: SOI, then [0xFF marker][len be16][payload] segments until the
    * first SOFn (C0–CF minus C4/C8/CC), whose payload is
    * [precision u8][height be16][width be16]. Stops at SOS/EOI — a stream
    * with no frame header before entropy data is not parseable.
    */
  private def parseJpeg(b: Array[Byte]): Option[Meta] = {
    if (b.length < 4 || u8(b, 0) != 0xff || u8(b, 1) != 0xd8) return None
    var i = 2
    while (i + 3 < b.length) {
      if (u8(b, i) != 0xff) return None // lost marker alignment: corrupt
      // fill bytes: 0xFF may pad before a marker
      var j = i + 1
      while (j < b.length && u8(b, j) == 0xff) j += 1
      if (j >= b.length) return None
      val m = u8(b, j)
      if (m == 0x01 || (m >= 0xd0 && m <= 0xd7)) { i = j + 1 } // standalone
      else if (m == 0xd9 || m == 0xda) return None // EOI / SOS before SOF
      else {
        if (j + 2 >= b.length) return None
        val len = be16(b, j + 1)
        if (len < 2) return None
        val isSof = m >= 0xc0 && m <= 0xcf && m != 0xc4 && m != 0xc8 && m != 0xcc
        if (isSof) {
          if (j + 7 >= b.length) return None
          return Some(Meta(be16(b, j + 6), be16(b, j + 4), 1L, "jpeg"))
        }
        i = j + 1 + len
      }
    }
    None
  }

  /** GIF: 6-byte version signature, logical-screen descriptor (width/
    * height le16, packed flags with global-color-table size), then a
    * block walk — 0x2C image descriptors (one per frame; local color
    * table + LZW sub-blocks skipped by length), 0x21 extensions, 0x3B
    * trailer. Frame count = image descriptors seen.
    *
    * STRICT: the walk must reach the 0x3B trailer through well-formed
    * blocks or the bytes are rejected. Unlike PNG/JPEG, the GIF
    * signature is pure ASCII — "GIF87a" can legitimately open a TEXT
    * payload — so signature-plus-dimensions alone must not claim the
    * bytes; requiring a structurally valid block walk makes an
    * accidental text match (which would silently diverge from the
    * caller's stub-fallback contract) practically impossible.
    */
  private def parseGif(b: Array[Byte]): Option[Meta] = {
    if (b.length < 13) return None
    val sig = new String(b, 0, 6, java.nio.charset.StandardCharsets.US_ASCII)
    if (sig != "GIF87a" && sig != "GIF89a") return None
    val w = le16(b, 6)
    val h = le16(b, 8)
    val packed = u8(b, 10)
    var i = 13 + (if ((packed & 0x80) != 0) 3 * (1 << ((packed & 7) + 1)) else 0)
    var frames = 0L
    var sawTrailer = false
    var corrupt = false
    def skipSubBlocks(): Unit = {
      while (i < b.length && u8(b, i) != 0) i += 1 + u8(b, i)
      i += 1 // block terminator
    }
    while (!sawTrailer && !corrupt && i < b.length) {
      u8(b, i) match {
        case 0x3b => sawTrailer = true
        case 0x21 => i += 2; skipSubBlocks() // extension: introducer + label
        case 0x2c => // image descriptor
          if (i + 10 > b.length) corrupt = true
          else {
            frames += 1
            val p = u8(b, i + 9)
            i += 10 + (if ((p & 0x80) != 0) 3 * (1 << ((p & 7) + 1)) else 0)
            i += 1 // LZW minimum code size
            skipSubBlocks()
          }
        case _ => corrupt = true
      }
    }
    if (sawTrailer) Some(Meta(w, h, math.max(frames, 1L), "gif")) else None
  }
}
