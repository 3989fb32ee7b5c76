package graft.multimodal

import java.util.zip.{CRC32, Deflater, Inflater}

/** Real pure-JVM PNG PIXEL codec for the dominant archive case —
  * non-interlaced 8-bit-depth images (gray / gray+alpha / RGB / RGBA) —
  * moving the multimodal boundary one layer past [[ImageHeaders]]'s
  * container parse: `java.util.zip.Inflater` decompresses the IDAT
  * stream and the five ISO/IEC 15948 §9 filter types (None/Sub/Up/
  * Average/Paeth) are reconstructed exactly. Everything else
  * (interlaced, 16-bit, palette) returns None and the caller falls back
  * to the documented stub — the same graceful-degradation contract the
  * header parsers use.
  *
  * The encoder exists for staging/fixtures (and as the write half of a
  * round-trip gate): 8-bit grayscale, caller-chosen per-row filter type
  * so a gate can force every reconstruction path through the decoder.
  */
object PngCodec {

  final case class Image(width: Int, height: Int, channels: Int, pixels: Array[Byte]) {
    /** Luminance at (x, y): integer BT.601-ish weights (77R+150G+29B)>>8
      * for color, the sample itself for gray — integer-exact, so an
      * oracle can replay it.
      */
    def gray(x: Int, y: Int): Int = {
      val i = (y * width + x) * channels
      channels match {
        case 1 | 2 => pixels(i) & 0xff
        case _ =>
          ((77 * (pixels(i) & 0xff) + 150 * (pixels(i + 1) & 0xff)
            + 29 * (pixels(i + 2) & 0xff)) >> 8)
      }
    }
  }

  private val Sig = Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a)

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff
  private def be32(b: Array[Byte], i: Int): Long =
    (u8(b, i).toLong << 24) | (u8(b, i + 1) << 16) | (u8(b, i + 2) << 8) | u8(b, i + 3)

  /** Decode a non-interlaced 8-bit PNG to raw samples; None for anything
    * outside that envelope (or malformed bytes) — never a throw: a
    * corrupt payload in a 100 TB archive must degrade, not kill a task.
    */
  def decode(png: Array[Byte]): Option[Image] = {
    try {
      if (png.length < 45 || (0 until 8).exists(i => u8(png, i) != Sig(i))) return None
      if (be32(png, 8) != 13L || !typeIs(png, 12, "IHDR")) return None
      val w = be32(png, 16).toInt
      val h = be32(png, 20).toInt
      val bitDepth = u8(png, 24)
      val colorType = u8(png, 25)
      val interlace = u8(png, 28)
      if (w <= 0 || h <= 0 || bitDepth != 8 || interlace != 0) return None
      // IHDR bytes 26-27: compression method and filter method, both
      // REQUIRED to be 0 (ISO 15948 §11.2.2) — a nonzero filter method
      // would be reconstructed with the wrong filter semantics, so it
      // must degrade to None like every other out-of-envelope payload
      if (u8(png, 26) != 0 || u8(png, 27) != 0) return None
      val channels = colorType match {
        case 0 => 1; case 2 => 3; case 4 => 2; case 6 => 4
        case _ => return None // palette (3) needs PLTE handling — stub path
      }
      // gather IDAT payloads
      val idat = new java.io.ByteArrayOutputStream()
      var i = 8
      var end = false
      while (!end && i + 12 <= png.length) {
        val len = be32(png, i)
        if (len < 0 || i + 12 + len > png.length) return None
        if (typeIs(png, i + 4, "IDAT")) idat.write(png, i + 8, len.toInt)
        if (typeIs(png, i + 4, "IEND")) end = true
        i += 12 + len.toInt
      }
      val stride = w * channels
      val raw = new Array[Byte]((1 + stride) * h)
      val inf = new Inflater()
      inf.setInput(idat.toByteArray)
      var off = 0
      while (off < raw.length && !inf.finished()) {
        val n = inf.inflate(raw, off, raw.length - off)
        if (n == 0 && inf.needsInput()) return None // truncated stream
        off += n
      }
      inf.end()
      if (off != raw.length) return None
      // reconstruct filters row by row (ISO/IEC 15948 §9; bpp = channels
      // at 8-bit depth)
      val out = new Array[Byte](stride * h)
      val bpp = channels
      var y = 0
      while (y < h) {
        val ft = u8(raw, y * (1 + stride))
        val rs = y * (1 + stride) + 1
        val os = y * stride
        var x = 0
        while (x < stride) {
          val cur = u8(raw, rs + x)
          val left = if (x >= bpp) u8(out, os + x - bpp) else 0
          val up = if (y > 0) u8(out, os - stride + x) else 0
          val ul = if (y > 0 && x >= bpp) u8(out, os - stride + x - bpp) else 0
          val v = ft match {
            case 0 => cur
            case 1 => cur + left
            case 2 => cur + up
            case 3 => cur + ((left + up) >> 1)
            case 4 => cur + paeth(left, up, ul)
            case _ => return None
          }
          out(os + x) = (v & 0xff).toByte
          x += 1
        }
        y += 1
      }
      Some(Image(w, h, channels, out))
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  private def paeth(a: Int, b: Int, c: Int): Int = {
    val p = a + b - c
    val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
    if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
  }

  private def typeIs(b: Array[Byte], i: Int, t: String): Boolean =
    i + 4 <= b.length && (0 until 4).forall(k => (b(i + k) & 0xff) == t.charAt(k))

  /** Encode 8-bit grayscale pixels (row-major, w*h bytes) as a real PNG.
    * `filterFor(row)` picks each scanline's filter type (0-4) — a gate
    * that cycles it forces every reconstruction branch through
    * [[decode]]. Deterministic output (fixed-strategy Deflater).
    */
  def encodeGray(w: Int, h: Int, pixels: Array[Byte],
      filterFor: Int => Int = _ % 5): Array[Byte] =
    encodeRaw(w, h, 1, colorType = 0, pixels, filterFor)

  /** Encode 8-bit RGB (row-major, w*h*3 bytes) — the color sibling of
    * [[encodeGray]], exercising the bpp>1 filter reconstructions.
    */
  def encodeRgb(w: Int, h: Int, pixels: Array[Byte],
      filterFor: Int => Int = _ % 5): Array[Byte] =
    encodeRaw(w, h, 3, colorType = 2, pixels, filterFor)

  private def encodeRaw(w: Int, h: Int, channels: Int, colorType: Int,
      pixels: Array[Byte], filterFor: Int => Int): Array[Byte] = {
    require(pixels.length == w * h * channels, s"need $w*$h*$channels samples")
    val stride = w * channels
    val bpp = channels
    val raw = new Array[Byte]((1 + stride) * h)
    var y = 0
    while (y < h) {
      val ft = filterFor(y) % 5
      raw(y * (1 + stride)) = ft.toByte
      var x = 0
      while (x < stride) {
        val cur = pixels(y * stride + x) & 0xff
        val left = if (x >= bpp) pixels(y * stride + x - bpp) & 0xff else 0
        val up = if (y > 0) pixels((y - 1) * stride + x) & 0xff else 0
        val ul = if (y > 0 && x >= bpp) pixels((y - 1) * stride + x - bpp) & 0xff else 0
        val filtered = ft match {
          case 0 => cur
          case 1 => cur - left
          case 2 => cur - up
          case 3 => cur - ((left + up) >> 1)
          case 4 => cur - paeth(left, up, ul)
        }
        raw(y * (1 + stride) + 1 + x) = (filtered & 0xff).toByte
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    bos.write(Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte), 0, 8)
    val ihdr = new Array[Byte](13)
    putBe32(ihdr, 0, w); putBe32(ihdr, 4, h)
    ihdr(8) = 8
    ihdr(9) = colorType.toByte
    writeChunk(bos, "IHDR", ihdr)
    val defl = new Deflater(Deflater.DEFAULT_COMPRESSION)
    defl.setInput(raw); defl.finish()
    val comp = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    while (!defl.finished()) comp.write(buf, 0, defl.deflate(buf))
    defl.end()
    writeChunk(bos, "IDAT", comp.toByteArray)
    writeChunk(bos, "IEND", Array.emptyByteArray)
    bos.toByteArray
  }

  private def putBe32(b: Array[Byte], i: Int, v: Int): Unit = {
    b(i) = ((v >>> 24) & 0xff).toByte; b(i + 1) = ((v >>> 16) & 0xff).toByte
    b(i + 2) = ((v >>> 8) & 0xff).toByte; b(i + 3) = (v & 0xff).toByte
  }

  private def writeChunk(os: java.io.ByteArrayOutputStream, t: String, data: Array[Byte]): Unit = {
    val len = new Array[Byte](4)
    putBe32(len, 0, data.length)
    os.write(len, 0, 4)
    val tb = t.getBytes("US-ASCII")
    os.write(tb, 0, 4)
    os.write(data, 0, data.length)
    val crc = new CRC32()
    crc.update(tb); crc.update(data)
    val cb = new Array[Byte](4)
    putBe32(cb, 0, crc.getValue.toInt)
    os.write(cb, 0, 4)
  }

  /** FIXED-POINT bilinear resize to an arbitrary grid — the "true
    * resampling" [[dhash64]]'s box grid cannot do (general thumbnails,
    * model-input normalization). Half-pixel-center source mapping
    * (sx = (dx+0.5)·W/outW − 0.5, the standard convention) carried in
    * integer MICROS: every coordinate, fraction, and the 4-tap blend
    * are exact long arithmetic with floor division, so the result is
    * bit-reproducible and the closed-form oracle replays it as plain
    * BIGINT SQL (the [[dhash64]] discipline extended to interpolation).
    * Edge taps clamp to the border (the replicate rule). Luminance
    * only, row-major.
    */
  def resizeBilinear(img: Image, outW: Int, outH: Int): Array[Int] = {
    require(outW > 0 && outH > 0, "target dims must be positive")
    val S = 1000000L
    val out = new Array[Int](outW * outH)
    var dy = 0
    while (dy < outH) {
      val symRaw = (2L * dy + 1L) * img.height * S / (2L * outH) - S / 2
      val sym = if (symRaw < 0L) 0L else symRaw
      var y0 = (sym / S).toInt
      if (y0 > img.height - 1) y0 = img.height - 1
      val fy = sym - y0 * S
      val y1 = math.min(y0 + 1, img.height - 1)
      var dx = 0
      while (dx < outW) {
        val sxmRaw = (2L * dx + 1L) * img.width * S / (2L * outW) - S / 2
        val sxm = if (sxmRaw < 0L) 0L else sxmRaw
        var x0 = (sxm / S).toInt
        if (x0 > img.width - 1) x0 = img.width - 1
        val fx = sxm - x0 * S
        val x1 = math.min(x0 + 1, img.width - 1)
        val p = ((S - fx) * (S - fy) * img.gray(x0, y0) +
          fx * (S - fy) * img.gray(x1, y0) +
          (S - fx) * fy * img.gray(x0, y1) +
          fx * fy * img.gray(x1, y1)) / (S * S)
        out(dy * outW + dx) = p.toInt
        dx += 1
      }
      dy += 1
    }
    out
  }

  /** Perceptual difference hash (dHash) of a decoded image: box-average
    * the luminance down to 9x8 (integer floor arithmetic — replayable),
    * then bit k = y*8+x is set iff cell(x+1, y) > cell(x, y). 64 bits in
    * a long; near-duplicate frames land within a small Hamming radius.
    * Requires width/height divisible into the 9x8 grid (the staged-gate
    * shape); general sizes would need true resampling — out of scope.
    */
  def dhash64(img: Image): Option[Long] = {
    if (img.width % 9 != 0 || img.height % 8 != 0) return None
    val cw = img.width / 9
    val ch = img.height / 8
    val cells = Array.ofDim[Int](8, 9)
    var cy = 0
    while (cy < 8) {
      var cx = 0
      while (cx < 9) {
        var s = 0
        var y = cy * ch
        while (y < (cy + 1) * ch) {
          var x = cx * cw
          while (x < (cx + 1) * cw) { s += img.gray(x, y); x += 1 }
          y += 1
        }
        cells(cy)(cx) = s / (cw * ch)
        cx += 1
      }
      cy += 1
    }
    var h = 0L
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        if (cells(y)(x + 1) > cells(y)(x)) h |= (1L << (y * 8 + x))
        x += 1
      }
      y += 1
    }
    Some(h)
  }
}
