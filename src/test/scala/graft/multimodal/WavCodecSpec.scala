package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** [[WavCodec]] — the PCM16 sample codec + envelope hash under q136.
  * Same discipline as PngCodecSpec: real encoded bytes through the real
  * decoder, strictness on everything outside the documented contract,
  * and a hand-computed hash pin.
  */
class WavCodecSpec extends AnyFunSuite {

  private def samples(n: Int)(f: Int => Int): Array[Short] =
    Array.tabulate(n)(t => f(t).toShort)

  test("encode->decode round-trip preserves every sample, incl. negatives and extremes") {
    val s = samples(130)(t => ((t * 997) % 65536) - 32768) ++
      Array[Short](Short.MinValue, Short.MaxValue, 0, -1, 1)
    val bytes = WavCodec.encodePcm16(16000, 1, s)
    val got = WavCodec.decodePcm16(bytes).getOrElse(fail("decode failed"))
    assert(got.sampleRate === 16000)
    assert(got.channels === 1)
    assert(got.samples.toSeq === s.toSeq)
  }

  test("stereo round-trips with interleaving preserved") {
    val s = samples(64)(t => if (t % 2 == 0) t * 100 else -(t * 100))
    val bytes = WavCodec.encodePcm16(8000, 2, s)
    val got = WavCodec.decodePcm16(bytes).getOrElse(fail("decode failed"))
    assert(got.channels === 2)
    assert(got.samples.toSeq === s.toSeq)
  }

  test("strictness: foreign bytes, truncated data, non-PCM format, wrong bit depth -> None") {
    assert(WavCodec.decodePcm16("not audio at all, just text padding....".getBytes).isEmpty)
    val good = WavCodec.encodePcm16(16000, 1, samples(100)(_ * 3))
    // truncate inside the data chunk: declared size overruns the buffer
    assert(WavCodec.decodePcm16(good.take(good.length - 10)).isEmpty)
    // flip audioFormat to 2 (ADPCM): outside the PCM contract
    val adpcm = good.clone(); adpcm(20) = 2
    assert(WavCodec.decodePcm16(adpcm).isEmpty)
    // flip bits-per-sample to 8
    val b8 = good.clone(); b8(34) = 8
    assert(WavCodec.decodePcm16(b8).isEmpty)
    // blockAlign inconsistent with channels*2
    val ba = good.clone(); ba(32) = 3
    assert(WavCodec.decodePcm16(ba).isEmpty)
  }

  test("envelope hash: hand-computed on a 130-sample (65x2) signal; sign-insensitive") {
    // frame energies alternate low/high: e(f) = 2*f for even f, 2*f+100 odd
    val s = samples(130) { t =>
      val f = t / 2
      val mag = if (f % 2 == 0) f else f + 50
      if (t % 2 == 0) mag else -mag
    }
    // e(f) = 2*mag(f); bit k = e(k+1) > e(k): from even k: mag k+51 > k ->
    // set; from odd k: mag k+1 > k+50 -> clear (k+1 vs k+50: false)
    var expected = 0L
    for (k <- 0 until 64) if (k % 2 == 0) expected |= (1L << k)
    assert(WavCodec.envelopeHash64(s) === Some(expected))
    // flipping every sign leaves the envelope unchanged
    val flipped = s.map(v => (-v).toShort)
    assert(WavCodec.envelopeHash64(flipped) === Some(expected))
  }

  test("envelope hash: length must tile 65 frames") {
    assert(WavCodec.envelopeHash64(Array.empty[Short]).isEmpty)
    assert(WavCodec.envelopeHash64(samples(64)(identity)).isEmpty)
    assert(WavCodec.envelopeHash64(samples(66)(identity)).isEmpty)
    assert(WavCodec.envelopeHash64(samples(65)(identity)).isDefined)
  }

  test("Short.MinValue magnitude does not overflow the energy sum") {
    val s = Array.fill[Short](65)(Short.MinValue)
    // all frames equal -> no bit set
    assert(WavCodec.envelopeHash64(s) === Some(0L))
  }

  test("resample: identity factor returns the input verbatim") {
    val s = Array[Short](5, -7, 100, -32768, 32767)
    assert(WavCodec.resampleLinear(s, 1, 1).toSeq === s.toSeq)
  }

  test("resample: 2x upsample hits exact midpoints; endpoints preserved") {
    val s = Array[Short](0, 100, 50)
    // out positions: 0, 0.5, 1, 1.5, 2
    assert(WavCodec.resampleLinear(s, 2, 1).toSeq === Seq[Short](0, 50, 100, 75, 50))
  }

  test("resample: negative midpoint uses FLOOR, not truncate-toward-zero") {
    val s = Array[Short](-3, -2)
    // true midpoint -2.5: floor = -3 (a signed / would give -2)
    assert(WavCodec.resampleLinear(s, 2, 1).toSeq === Seq[Short](-3, -3, -2))
  }

  test("resample: 2/3 downsample length formula and sampled positions") {
    val s = Array.tabulate[Short](520)(t => (t % 1000).toShort)
    val out = WavCodec.resampleLinear(s, 2, 3)
    assert(out.length === (519 * 2) / 3 + 1)
    // k=2 reads pos 3 exactly; k=1 reads pos 1.5 = midpoint of s(1), s(2)
    assert(out(2) === s(3))
    assert(out(1) === ((s(1) + s(2)) / 2).toShort)
    assert(out(out.length - 1) === s(519))
  }

  test("resample: empty input stays empty") {
    assert(WavCodec.resampleLinear(Array.empty[Short], 3, 2).isEmpty)
  }
}
