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

  test("3-dim mixed-type layout (long, timestamp, string) narrows every dimension") {
    import org.apache.spark.sql.functions._
    // 20x20x20 grid over a long, an hourly timestamp, and a string key
    val rnd = new scala.util.Random(7L)
    val rows = rnd.shuffle(for (x <- 0 until 20; t <- 0 until 20; s <- 0 until 20) yield
      (x.toLong, java.sql.Timestamp.valueOf(f"2024-01-01 ${t}%02d:00:00"), f"key$s%03d"))
    val df = rows.toDF("x", "t", "s")
    val nFiles = 16
    val zDir = java.nio.file.Files.createTempDirectory("graft_z3").resolve("z").toString
    val xDir = java.nio.file.Files.createTempDirectory("graft_z3").resolve("x").toString
    Layout.writeZOrdered(df, zDir, Seq("x", "t", "s"), files = nFiles)
    df.repartitionByRange(nFiles, col("x")).sortWithinPartitions("x")
      .write.mode("overwrite").parquet(xDir)

    // avg per-file span of the dimension KEY, normalized by global span —
    // the fraction of the domain a file's min/max footprint covers
    def normSpan(dir: String, c: String): Double = {
      val d = spark.read.parquet(dir)
      val k = Layout.dimKey(d, c).cast("double")
      val per = d.groupBy(input_file_name()).agg(min(k).as("lo"), max(k).as("hi"))
        .collect().map(r => r.getDouble(2) - r.getDouble(1))
      val g = d.agg(min(k), max(k)).head()
      per.sum / per.length / (g.getDouble(1) - g.getDouble(0))
    }
    // x-sorted baseline: t and s footprints span the whole domain
    assert(normSpan(xDir, "x") < 0.2)
    assert(normSpan(xDir, "t") > 0.9 && normSpan(xDir, "s") > 0.9)
    // z-ordered: every dimension well under the full span
    for (c <- Seq("x", "t", "s")) {
      val ns = normSpan(zDir, c)
      info(f"z3 $c norm span = $ns%.2f")
      assert(ns < 0.6, s"$c footprint $ns not narrowed")
    }
    assert(spark.read.parquet(zDir).count() == 8000L)
  }

  test("string prefix key preserves lexicographic order") {
    import graft.functions.expr.ZOrderOps.stringPrefixKey
    import org.apache.spark.unsafe.types.UTF8String
    val ss = Seq("", "a", "aa", "ab", "abcdefgh", "abcdefghZZZ", "b", "zz", "état")
    val keys = ss.map(s => stringPrefixKey(UTF8String.fromString(s)))
    assert(keys == keys.sorted, s"prefix keys not monotone: ${ss.zip(keys)}")
    // beyond-8-byte differences collapse (documented granularity bound)
    assert(stringPrefixKey(UTF8String.fromString("abcdefghXXX")) ==
      stringPrefixKey(UTF8String.fromString("abcdefghYYY")))
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
