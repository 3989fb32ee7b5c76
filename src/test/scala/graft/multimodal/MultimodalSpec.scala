package graft.multimodal

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class MultimodalSpec extends SparkTestBase {
  import spark.implicits._

  // --- real container-header fixtures (built from the public layouts) ---

  private def be32(v: Int) =
    Array((v >>> 24).toByte, (v >>> 16).toByte, (v >>> 8).toByte, v.toByte)
  private def be16(v: Int) = Array((v >>> 8).toByte, v.toByte)
  private def le16(v: Int) = Array((v & 0xff).toByte, (v >>> 8).toByte)

  private def pngBytes(w: Int, h: Int, acTlFrames: Option[Int] = None): Array[Byte] = {
    val out = scala.collection.mutable.ArrayBuffer[Byte]()
    out ++= Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)
    def chunk(t: String, data: Array[Byte]): Unit = {
      out ++= be32(data.length); out ++= t.getBytes("US-ASCII")
      out ++= data; out ++= be32(0) // CRC not validated by a header parse
    }
    chunk("IHDR", be32(w) ++ be32(h) ++ Array[Byte](8, 6, 0, 0, 0))
    acTlFrames.foreach(n => chunk("acTL", be32(n) ++ be32(0)))
    chunk("IEND", Array.empty[Byte])
    out.toArray
  }

  private def jpegBytes(w: Int, h: Int): Array[Byte] = {
    val out = scala.collection.mutable.ArrayBuffer[Byte]()
    out ++= Array(0xff, 0xd8).map(_.toByte) // SOI
    out ++= Array(0xff, 0xe0).map(_.toByte) // APP0
    out ++= be16(16); out ++= "JFIF".getBytes("US-ASCII")
    out ++= Array.fill(10)(0.toByte) // rest of the 14-byte APP0 payload
    out ++= Array(0xff, 0xc0).map(_.toByte) // SOF0 (baseline)
    out ++= be16(11); out += 8.toByte // len, precision
    out ++= be16(h); out ++= be16(w)
    out += 1.toByte; out ++= Array[Byte](1, 0x11, 0) // 1 component
    out.toArray
  }

  private def gifBytes(w: Int, h: Int, frames: Int): Array[Byte] = {
    val out = scala.collection.mutable.ArrayBuffer[Byte]()
    out ++= "GIF89a".getBytes("US-ASCII")
    out ++= le16(w); out ++= le16(h); out ++= Array[Byte](0, 0, 0) // no GCT
    (1 to frames).foreach { _ =>
      out += 0x2c.toByte // image descriptor
      out ++= le16(0); out ++= le16(0); out ++= le16(w); out ++= le16(h)
      out += 0.toByte // no local color table
      out += 2.toByte // LZW minimum code size
      out ++= Array[Byte](1, 0x4c, 0) // one 1-byte data sub-block + terminator
    }
    out += 0x3b.toByte // trailer
    out.toArray
  }

  test("ImageHeaders parses PNG IHDR dimensions and APNG frame count") {
    assert(ImageHeaders.parse(pngBytes(640, 480)) ==
      Some(ImageHeaders.Meta(640L, 480L, 1L, "png")))
    assert(ImageHeaders.parse(pngBytes(81, 29, acTlFrames = Some(10))) ==
      Some(ImageHeaders.Meta(81L, 29L, 10L, "png")))
  }

  test("ImageHeaders walks JPEG segments to the SOF frame header") {
    assert(ImageHeaders.parse(jpegBytes(1920, 1080)) ==
      Some(ImageHeaders.Meta(1920L, 1080L, 1L, "jpeg")))
  }

  test("ImageHeaders reads GIF screen descriptor and counts frames") {
    assert(ImageHeaders.parse(gifBytes(320, 200, 1)) ==
      Some(ImageHeaders.Meta(320L, 200L, 1L, "gif")))
    assert(ImageHeaders.parse(gifBytes(320, 200, 3)) ==
      Some(ImageHeaders.Meta(320L, 200L, 3L, "gif")))
  }

  test("ImageHeaders rejects non-container bytes (text, empty, truncated sig)") {
    assert(ImageHeaders.parse("plain old text".getBytes("UTF-8")).isEmpty)
    assert(ImageHeaders.parse(Array.emptyByteArray).isEmpty)
    assert(ImageHeaders.parse(Array(0x89.toByte, 0x50.toByte)).isEmpty)
  }

  test("TEXT starting with the ASCII GIF signature is rejected (strict block walk)") {
    // unlike PNG/JPEG, "GIF87a" is valid ASCII — a text payload opening
    // with it must still fall back to the stub, or the q33/q34 oracle
    // invariant (text == stub path) silently breaks
    assert(ImageHeaders.parse("GIF87a document about image formats".getBytes("UTF-8")).isEmpty)
    assert(ImageHeaders.parse("GIF89a and more prose here".getBytes("UTF-8")).isEmpty)
    // a real GIF truncated before its trailer is likewise not claimed
    assert(ImageHeaders.parse(gifBytes(320, 200, 1).dropRight(1)).isEmpty)
  }

  private def le32(v: Int) =
    Array((v & 0xff).toByte, ((v >>> 8) & 0xff).toByte,
      ((v >>> 16) & 0xff).toByte, (v >>> 24).toByte)

  private def wavBytes(rate: Int, channels: Int, bits: Int, nSamples: Int): Array[Byte] = {
    val blockAlign = channels * bits / 8
    val dataLen = nSamples * blockAlign
    val out = scala.collection.mutable.ArrayBuffer[Byte]()
    out ++= "RIFF".getBytes("US-ASCII"); out ++= le32(36 + dataLen)
    out ++= "WAVE".getBytes("US-ASCII")
    out ++= "fmt ".getBytes("US-ASCII"); out ++= le32(16)
    out ++= le16(1) ++ le16(channels) // PCM, channels
    out ++= le32(rate); out ++= le32(rate * blockAlign) // rate, byte rate
    out ++= le16(blockAlign) ++ le16(bits)
    out ++= "data".getBytes("US-ASCII"); out ++= le32(dataLen)
    out ++= Array.fill(dataLen)(0x11.toByte)
    out.toArray
  }

  /** Minimal valid ISO-BMFF: ftyp + moov(mvhd v0 + traks(tkhd v0)) + mdat. */
  private def mp4Bytes(
      timescale: Int, duration: Int, tracks: Seq[(Int, Int)]): Array[Byte] = {
    def box(t: String, payload: Array[Byte]): Array[Byte] =
      be32(8 + payload.length) ++ t.getBytes("US-ASCII") ++ payload
    val ftyp = box("ftyp", "isom".getBytes("US-ASCII") ++ be32(512) ++
      "isomiso2".getBytes("US-ASCII"))
    val mvhd = box("mvhd", Array[Byte](0, 0, 0, 0) ++ // version 0 + flags
      be32(0) ++ be32(0) ++ be32(timescale) ++ be32(duration) ++
      Array.fill(80)(0.toByte)) // rate..next_track_id
    val traks = tracks.map { case (w, h) =>
      box("trak", box("tkhd", Array[Byte](0, 0, 0, 0) ++
        Array.fill(72)(0.toByte) ++ // ctime..matrix
        be32(w << 16) ++ be32(h << 16))) // 16.16 fixed
    }
    val moov = box("moov", mvhd ++ traks.flatten.toArray)
    val mdat = box("mdat", Array.fill(16)(7.toByte))
    ftyp ++ moov ++ mdat
  }

  test("VideoHeaders parses MP4 mvhd/tkhd; text with an ftyp-looking prefix is rejected") {
    // 2 tracks: 640x480 video + 0x0 audio; duration 9000/600 = 15000 ms
    val m = VideoHeaders.parseMp4(
      mp4Bytes(600, 9000, Seq((640, 480), (0, 0)))).get
    assert(m == VideoHeaders.Meta(15000L, 600L, 2L, 640L, 480L, "isom"))
    assert(VideoHeaders.parseMp4("plain text that is long enough".getBytes("UTF-8")).isEmpty)
    // ASCII prose with 'ftyp' at offset 4 must still fail the box tiling
    assert(VideoHeaders.parseMp4(
      "abcdftyp continues as natural language for quite a while".getBytes("UTF-8")).isEmpty)
    // truncated: last box's declared size overruns the buffer
    assert(VideoHeaders.parseMp4(
      mp4Bytes(600, 9000, Seq((640, 480))).dropRight(3)).isEmpty)
    // no moov -> reject even though ftyp is valid
    val noMoov = mp4Bytes(600, 9000, Seq((640, 480)))
    val ftypOnly = noMoov.take(8 + 16) // just the ftyp box
    assert(VideoHeaders.parseMp4(ftypOnly).isEmpty)
    // moov without any trak -> reject
    assert(VideoHeaders.parseMp4(mp4Bytes(600, 9000, Seq.empty)).isEmpty)
  }

  test("decodeVideoMeta: real MP4 decodes, text falls back to the video stub") {
    val payloads = Seq(
      1L -> mp4Bytes(1000, 2500, Seq((1920, 1080))),
      2L -> "Az".getBytes("UTF-8"))
    val rows = Multimodal.decodeVideoMeta(payloads.toDF("id", "payload"), "id", "payload")
      .orderBy("id").collect()
    assert(rows(0).getAs[Long]("duration_ms") == 2500L &&
      rows(0).getAs[Long]("n_tracks") == 1L &&
      rows(0).getAs[Long]("width") == 1920L &&
      rows(0).getAs[Long]("height") == 1080L &&
      rows(0).getAs[String]("format") == "mp4")
    // stub: len=2, 'A'=65, 'z'=122 -> duration 2*10+65=85; tracks 1+122%3=3;
    // width 16*(1+65%40)=416; height 16*(1+122%30)=48
    assert(rows(1).getAs[Long]("duration_ms") == 85L &&
      rows(1).getAs[Long]("n_tracks") == 3L &&
      rows(1).getAs[Long]("width") == 416L &&
      rows(1).getAs[Long]("height") == 48L &&
      rows(1).getAs[String]("format") == "mp4_stub")
  }

  test("AudioHeaders parses WAV fmt/data chunks; text with a RIFF prefix is rejected") {
    assert(AudioHeaders.parseWav(wavBytes(44100, 2, 16, 1000)) ==
      Some(AudioHeaders.Meta(44100L, 2L, 16L, 1000L, "wav")))
    assert(AudioHeaders.parseWav(wavBytes(16000, 1, 8, 320)) ==
      Some(AudioHeaders.Meta(16000L, 1L, 8L, 320L, "wav")))
    // ASCII prose that happens to open RIFF....WAVE must not be claimed
    assert(AudioHeaders.parseWav(
      "RIFFsomeWAVEprose continues here for a while and then some".getBytes("UTF-8")).isEmpty)
    assert(AudioHeaders.parseWav("plain text".getBytes("UTF-8")).isEmpty)
    // truncated: fmt without data
    assert(AudioHeaders.parseWav(wavBytes(44100, 2, 16, 1000).take(40)).isEmpty)
    // truncated mid-data: the data chunk's declared size overruns the
    // buffer from its offset — must be rejected, not parsed from phantom bytes
    assert(AudioHeaders.parseWav(wavBytes(44100, 2, 16, 1000).dropRight(4)).isEmpty)
  }

  test("decodeAudioMeta: real WAV decodes, text falls back to the audio stub") {
    val payloads = Seq(
      1L -> wavBytes(44100, 2, 16, 500),
      2L -> "Az".getBytes("UTF-8"))
    val rows = Multimodal.decodeAudioMeta(payloads.toDF("id", "payload"), "id", "payload")
      .orderBy("id").collect()
    assert(rows(0).getAs[Long]("sample_rate") == 44100L &&
      rows(0).getAs[Long]("channels") == 2L &&
      rows(0).getAs[Long]("n_samples") == 500L &&
      rows(0).getAs[String]("format") == "wav")
    // stub: 'A'=65 -> 65%3=2 -> 44100; 'z'=122 -> 1+122%2=1; 2*100+65=265
    assert(rows(1).getAs[Long]("sample_rate") == 44100L &&
      rows(1).getAs[Long]("channels") == 1L &&
      rows(1).getAs[Long]("n_samples") == 265L &&
      rows(1).getAs[String]("format") == "pcm_stub")
  }

  test("decodeImageMeta: real headers decode, unknown bytes fall back to the stub") {
    val payloads = Seq(
      1L -> pngBytes(640, 480),
      2L -> gifBytes(320, 200, 4),
      3L -> "Az".getBytes("UTF-8")) // no signature -> stub path
    val df = payloads.toDF("id", "payload")
    val rows = Multimodal.decodeImageMeta(df, "id", "payload").orderBy("id").collect()
    assert(rows(0).getAs[Long]("width") == 640L && rows(0).getAs[Long]("height") == 480L
      && rows(0).getAs[String]("format") == "png")
    assert(rows(1).getAs[Long]("n_frames") == 4L && rows(1).getAs[String]("format") == "gif")
    // stub arithmetic: 'A'=65, 'z'=122
    assert(rows(2).getAs[Long]("width") == 2L && rows(2).getAs[Long]("height") == 59L
      && rows(2).getAs[String]("format") == "webp")
  }

  test("decodeImageMeta: deterministic stub metadata from bytes") {
    val df = Seq((1L, "Az"), (2L, "")).toDF("id", "t")
      .select($"id", encode($"t", "UTF-8").as("payload"))
    val metas = Multimodal.decodeImageMeta(df, "id", "payload")
      .orderBy("id").collect()
    val r1 = metas(0)
    // 'A'=65, 'z'=122: width=1+65%64=2, height=1+122%64=59, len=2, frames=1+2%8=3
    assert(r1.getAs[Long]("byte_len") == 2L)
    assert(r1.getAs[Long]("width") == 2L)
    assert(r1.getAs[Long]("height") == 59L)
    assert(r1.getAs[Long]("n_frames") == 3L)
    assert(r1.getAs[String]("format") == "webp") // 65 % 3 == 2
    val r2 = metas(1)
    assert(r2.getAs[Long]("byte_len") == 0L && r2.getAs[String]("format") == "empty")
  }

  test("decodeImageMeta handles null payloads as empty") {
    val df = Seq(1L).toDF("id").withColumn("payload", lit(null).cast("binary"))
    val r = Multimodal.decodeImageMeta(df, "id", "payload").head()
    assert(r.getAs[Long]("byte_len") == 0L)
  }

  test("sampleFrames explodes stride-spaced frame indices") {
    val meta = Seq((7L, 5L)).toDF("id", "n_frames")
    val frames = Multimodal.sampleFrames(meta, "id", stride = 2)
      .collect().map(_.getLong(1)).toSeq
    assert(frames == Seq(0L, 2L, 4L))
  }

  test("sampleFrames yields no rows (not an error) for empty payloads") {
    // n_frames = 0 would make sequence(0, -1, +2) throw; the guard must
    // turn it into an empty explode, matching GENERATE_SERIES semantics
    val meta = Seq((1L, 0L), (2L, 3L)).toDF("id", "n_frames")
    val rows = Multimodal.sampleFrames(meta, "id", stride = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
    assert(rows == Seq((2L, 0L), (2L, 2L)))
  }

  test("end-to-end: empty payload survives decode -> sampleFrames") {
    val df = Seq((1L, ""), (2L, "abcd")).toDF("id", "t")
      .select($"id", encode($"t", "UTF-8").as("payload"))
    val frames = Multimodal.sampleFrames(
        Multimodal.decodeImageMeta(df, "id", "payload"), "id", stride = 2)
      .collect().map(_.getLong(0)).toSeq
    assert(!frames.contains(1L) && frames.contains(2L))
  }

  test("PngCodec: gray encode -> decode round-trips under every filter type") {
    val w = 11; val h = 10 // odd width: filter byte offsets exercise bpp=1 edges
    val px = Array.tabulate(w * h)(i => ((i * 37 + 11) % 251).toByte)
    // one fixed filter per image: each of the five reconstruction
    // branches must independently reproduce the pixels bit-for-bit
    (0 to 4).foreach { ft =>
      val png = PngCodec.encodeGray(w, h, px, _ => ft)
      val img = PngCodec.decode(png).getOrElse(fail(s"decode failed, filter $ft"))
      assert(img.width == w && img.height == h && img.channels == 1)
      assert(img.pixels.toSeq == px.toSeq, s"filter $ft")
    }
    // and the cycling form (the q132 gate shape)
    val img = PngCodec.decode(PngCodec.encodeGray(w, h, px)).get
    assert(img.pixels.toSeq == px.toSeq)
  }

  test("PngCodec: RGB encode -> decode round-trips; luminance is the integer formula") {
    val w = 6; val h = 5
    val px = Array.tabulate(w * h * 3)(i => ((i * 53 + 7) % 256).toByte)
    val img = PngCodec.decode(PngCodec.encodeRgb(w, h, px)).get
    assert(img.channels == 3 && img.pixels.toSeq == px.toSeq)
    val r = px(0) & 0xff; val g = px(1) & 0xff; val b = px(2) & 0xff
    assert(img.gray(0, 0) == ((77 * r + 150 * g + 29 * b) >> 8))
  }

  test("PngCodec: truncated IDAT and foreign bytes degrade to None, never throw") {
    val png = PngCodec.encodeGray(8, 8, new Array[Byte](64))
    assert(PngCodec.decode(png.take(png.length - 20)).isEmpty)
    assert(PngCodec.decode("not a png at all".getBytes("UTF-8")).isEmpty)
    assert(PngCodec.decode(Array.emptyByteArray).isEmpty)
  }

  test("PngCodec: dHash matches a hand-computed tiny case") {
    // 18x16 image, constant rows except cell (0,0) brighter than (1,0):
    // all adjacent-compare bits are 0 except where we plant an increase
    val w = 18; val h = 16
    val px = new Array[Byte](w * h)
    // cell (cx=3, cy=2) = original x in [6,7], y in [4,5] set to 100;
    // everything else 10 -> p(3,2)=100 > p(2,2)=10 sets bit k=2*8+2 (the
    // compare at x=2); p(4,2)=10 < p(3,2) leaves bit k=2*8+3 clear
    for (y <- 4 to 5; x <- 6 to 7) px(y * w + x) = 100.toByte
    for (i <- px.indices if px(i) == 0) px(i) = 10.toByte
    val img = PngCodec.decode(PngCodec.encodeGray(w, h, px)).get
    val dh = PngCodec.dhash64(img).get
    assert(dh == (1L << (2 * 8 + 2)), s"got ${dh.toBinaryString}")
  }

  test("imageDhash drops undecodable payloads and hashes real PNGs") {
    val good = PngCodec.encodeGray(18, 16, Array.tabulate(18 * 16)(i => (i % 180).toByte))
    val rows = Seq((1L, good), (2L, "junk".getBytes("UTF-8")))
      .toDF("id", "png")
    val out = Multimodal.imageDhash(rows, "id", "png").collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(1L))
  }

  test("audioEnvelopeHash hashes real mono WAVs; drops stereo, ragged-length, and junk") {
    val mono = WavCodec.encodePcm16(16000, 1,
      Array.tabulate(65 * 4)(t => ((t * 211) % 4000).toShort))
    val stereo = WavCodec.encodePcm16(16000, 2,
      Array.tabulate(65 * 4)(t => ((t * 211) % 4000).toShort))
    val ragged = WavCodec.encodePcm16(16000, 1,
      Array.tabulate(64)(t => (t * 3).toShort)) // 64 !| 65
    val rows = Seq((1L, mono), (2L, stereo), (3L, ragged),
      (4L, "junk".getBytes("UTF-8"))).toDF("id", "wav")
    val out = Multimodal.audioEnvelopeHash(rows, "id", "wav").collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(1L))
    // the surviving hash equals the codec-level hash of the same samples
    val expected = WavCodec.decodePcm16(mono)
      .flatMap(a => WavCodec.envelopeHash64(a.samples)).get
    assert(out.head.getLong(1) == expected)
  }
}
