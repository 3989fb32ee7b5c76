package graft.multimodal

/** Minimal pure-JVM MP4 (ISO-BMFF) metadata parser — the video
  * counterpart of [[ImageHeaders]]/[[AudioHeaders]]: container METADATA
  * (duration, timescale, track count, presentation dimensions) from the
  * public box layout (ISO/IEC 14496-12), no codec.
  *
  * STRICT like the GIF/WAV parsers, and stricter than a signature sniff
  * has to be: "ftyp"/"moov"/the box 4CCs are ASCII, so acceptance
  * requires the COMPLETE box walk to tile the buffer exactly — every
  * declared box size lands on the next box boundary and the final box
  * ends at the final byte — with a well-formed `moov` containing an
  * `mvhd` (known version, positive timescale) and at least one `trak`.
  * Natural text cannot satisfy that layout: its first 4 bytes read as a
  * big-endian size would have to chain box-to-box to the exact end.
  */
object VideoHeaders {

  final case class Meta(durationMs: Long, timescale: Long, nTracks: Long,
      width: Long, height: Long, brand: String)

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff
  private def be32(b: Array[Byte], i: Int): Long =
    (u8(b, i).toLong << 24) | (u8(b, i + 1).toLong << 16) |
      (u8(b, i + 2).toLong << 8) | u8(b, i + 3).toLong
  private def be64(b: Array[Byte], i: Int): Long = (be32(b, i) << 32) | be32(b, i + 4)
  private def cc(b: Array[Byte], i: Int, t: String): Boolean =
    i + 4 <= b.length && (0 until 4).forall(k => u8(b, i + k) == t.charAt(k))
  private def fourCc(b: Array[Byte], i: Int): String =
    new String(b, i, 4, java.nio.charset.StandardCharsets.US_ASCII)

  /** Walk the boxes tiling b[from, to) exactly; `f(type, payloadFrom,
    * payloadTo)` returns false to reject. Returns false on any layout
    * violation: header past the end, declared size overrunning `to`,
    * largesize smaller than its header, or the last box not ending at
    * `to`.
    */
  private def walk(b: Array[Byte], from: Int, to: Int)(
      f: (String, Int, Int) => Boolean): Boolean = {
    var i = from
    while (i < to) {
      if (i + 8 > to) return false
      var size = be32(b, i)
      var hdr = 8
      if (size == 1) { // 64-bit largesize follows the type
        if (i + 16 > to) return false
        size = be64(b, i + 8)
        hdr = 16
      } else if (size == 0) { // box extends to the end of the enclosing space
        size = (to - i).toLong
      }
      if (size < hdr || size > (to - i).toLong) return false
      if (!f(fourCc(b, i + 4), i + hdr, i + size.toInt)) return false
      i += size.toInt
    }
    i == to
  }

  def parseMp4(b: Array[Byte]): Option[Meta] = {
    if (b.length < 16 || !cc(b, 4, "ftyp")) return None
    var brand: String = null
    var timescale = -1L
    var duration = -1L
    var nTracks = 0L
    var width = 0L
    var height = 0L
    var sawMoov = false
    val ok = walk(b, 0, b.length) {
      case ("ftyp", from, to) =>
        // major_brand + minor_version at minimum, brand printable ASCII
        (to - from >= 8) && {
          brand = fourCc(b, from)
          brand.forall(c => c >= 0x20 && c <= 0x7e)
        }
      case ("moov", from, to) =>
        !sawMoov && { // exactly one movie box
          sawMoov = true
          walk(b, from, to) {
            case ("mvhd", f2, t2) =>
              u8(b, f2) match {
                case 0 if t2 - f2 >= 20 => // v0: ctime/mtime 32-bit
                  timescale = be32(b, f2 + 12); duration = be32(b, f2 + 16)
                  timescale > 0
                case 1 if t2 - f2 >= 32 => // v1: ctime/mtime/duration 64-bit
                  timescale = be32(b, f2 + 20); duration = be64(b, f2 + 24)
                  timescale > 0
                case _ => false
              }
            case ("trak", f2, t2) =>
              nTracks += 1
              walk(b, f2, t2) {
                case ("tkhd", f3, t3) =>
                  // width/height are 16.16 fixed-point at the end of the
                  // track header; audio tracks carry zeros — keep the max
                  val (wOff, need) = u8(b, f3) match {
                    case 0 => (76, 84)
                    case 1 => (88, 96)
                    case _ => (-1, Int.MaxValue)
                  }
                  (t3 - f3 >= need) && {
                    width = math.max(width, be32(b, f3 + wOff) >> 16)
                    height = math.max(height, be32(b, f3 + wOff + 4) >> 16)
                    true
                  }
                case _ => true // mdia etc. — opaque here
              }
            case _ => true // udta, iods, …
          }
        }
      case _ => true // mdat, free, skip, …
    }
    if (!ok || !sawMoov || timescale <= 0 || duration < 0 || nTracks < 1) None
    else Some(Meta(duration * 1000L / timescale, timescale, nTracks, width, height, brand))
  }
}
