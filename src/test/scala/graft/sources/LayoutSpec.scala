package graft.sources

import graft.SparkTestBase
import graft.functions.expr.ZOrderOps

class LayoutSpec extends SparkTestBase {
  import spark.implicits._

  test("Morton interleave: known bit patterns") {
    // x=0b1010, y=0b0101, 4 bits -> z = 10 01 10 01 (x bit then y bit, MSB first)
    assert(ZOrderOps.interleave2(0xaL, 0x5L, 4) == 0x99L)
    assert(ZOrderOps.interleave2(0L, 0L, 16) == 0L)
    assert(ZOrderOps.interleave2(0xffffL, 0xffffL, 16) == 0xffffffffL)
    // x contributes the higher bit of each pair
    assert(ZOrderOps.interleave2(1L, 0L, 1) == 2L)
    assert(ZOrderOps.interleave2(0L, 1L, 1) == 1L)
  }

  test("z-ordered layout keeps per-file footprints narrow in BOTH dimensions") {
    // a 100x100 uniform grid: any layout totals the same rows; the
    // question is the SHAPE of each file's (x, y) footprint
    val rnd = new scala.util.Random(5L)
    val rows = rnd.shuffle((0 until 100).flatMap(x => (0 until 100).map(y => (x.toLong, y.toLong))))
    val df = rows.toDF("x", "y")
    val nFiles = 16
    val zDir = java.nio.file.Files.createTempDirectory("graft_z").resolve("z").toString
    val xDir = java.nio.file.Files.createTempDirectory("graft_z").resolve("x").toString
    Layout.writeZOrdered(df, zDir, "x", "y", files = nFiles)
    // baseline: 1-D range layout on x only
    df.repartitionByRange(nFiles, org.apache.spark.sql.functions.col("x"))
      .sortWithinPartitions("x")
      .write.mode("overwrite").parquet(xDir)

    def avgSpan(dir: String, c: String): Double = {
      val rs = Layout.fileRanges(spark, dir, c)
      rs.map { case (lo, hi) => (hi - lo).toDouble }.sum / rs.size
    }
    // x-sorted layout: x prunes greatly, y not at all (full 0..99 span)
    assert(avgSpan(xDir, "x") < 20.0)
    assert(avgSpan(xDir, "y") > 90.0)
    // z-ordered: BOTH dimensions stay well under half the global span
    val zx = avgSpan(zDir, "x")
    val zy = avgSpan(zDir, "y")
    info(f"z-layout avg spans: x=$zx%.1f y=$zy%.1f (global 99)")
    assert(zx < 50.0, s"x span $zx")
    assert(zy < 50.0, s"y span $zy")
    // and no rows were lost
    assert(spark.read.parquet(zDir).count() == 10000L)
  }
}
