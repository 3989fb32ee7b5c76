package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** Fixed-point bilinear resize (q159): identity, exact midpoints on an
  * integer ramp, border replication, and determinism of the floor
  * arithmetic.
  */
class ResizeSpec extends AnyFunSuite {

  private def gray(w: Int, h: Int)(f: (Int, Int) => Int): PngCodec.Image =
    PngCodec.Image(w, h, 1,
      Array.tabulate(w * h)(k => f(k % w, k / w).toByte))

  test("identity resize returns the source pixels") {
    val img = gray(6, 4)((x, y) => (x * 17 + y * 31) % 181)
    val out = PngCodec.resizeBilinear(img, 6, 4)
    assert(out.toSeq == (0 until 24).map(k => img.gray(k % 6, k / 6)))
  }

  test("2x upscale of a linear ramp interpolates the exact quarter points") {
    // 2-pixel row [0, 100] -> 4 samples at sx = -0.25, 0.25, 0.75, 1.25
    // clamped: 0, 25, 75, 100
    val img = gray(2, 1)((x, _) => x * 100)
    assert(PngCodec.resizeBilinear(img, 4, 1).toSeq == Seq(0, 25, 75, 100))
  }

  test("downscale averages with the half-pixel-center convention") {
    // 4-pixel row [0, 60, 120, 180] -> 2 samples at sx = 0.5, 2.5:
    // exact midpoints 30 and 150
    val img = gray(4, 1)((x, _) => x * 60)
    assert(PngCodec.resizeBilinear(img, 2, 1).toSeq == Seq(30, 150))
  }

  test("border replication: constant image stays constant at any size") {
    val img = gray(5, 3)((_, _) => 77)
    assert(PngCodec.resizeBilinear(img, 11, 9).forall(_ == 77))
    assert(PngCodec.resizeBilinear(img, 1, 1).toSeq == Seq(77))
  }
}
