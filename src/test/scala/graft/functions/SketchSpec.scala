package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Error bound of the HyperLogLog++ distinct-count sketch (q60) against
  * the exact answer (q59's oracle-checked form) — the sketch has no SQL
  * twin, so this spec is its correctness story: relative error within a
  * few rsd at small and large cardinalities.
  */
class SketchSpec extends SparkTestBase {
  import spark.implicits._

  test("approx_count_distinct stays within 6% of exact across cardinalities") {
    // cardinalities spanning the sketch's sparse and dense regimes
    Seq(50, 5000, 200000).foreach { n =>
      val df = (0 until n * 3).map(i => (i % n).toLong).toDF("v")
      val approx = df.agg(approx_count_distinct($"v", rsd = 0.02)).head().getLong(0)
      val err = math.abs(approx - n).toDouble / n
      info(f"n=$n approx=$approx err=${err * 100}%.2f%%")
      assert(err <= 0.06, s"n=$n approx=$approx err=$err")
    }
  }

  test("q60's sketch tracks q59's exact per-group answer on the driver testdata") {
    val sfDir = "/root/testdata/sf0.001"
    assume(new java.io.File(s"$sfDir/events.parquet").exists())
    val exact = graft.SparkEntry.queries("q59_events_distinct_users")(spark, sfDir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val approx = graft.SparkEntry.queries("q60_events_distinct_users_approx")(spark, sfDir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(exact.keySet == approx.keySet)
    exact.foreach { case (k, n) =>
      val err = math.abs(approx(k) - n).toDouble / math.max(n, 1)
      assert(err <= 0.06, s"$k exact=$n approx=${approx(k)}")
    }
  }

  // ---- the engine's own oracle-exact HLL (q104) ------------------------

  test("Hll matches a driver-side reference replay of the same pipeline") {
    import graft.functions.expr.TextHashOps
    import org.apache.spark.unsafe.types.UTF8String
    val ops = graft.operators.Hll
    // mixed cardinalities so one group linear-counts and one uses raw
    val rows = ((0 until 40).map(i => ("small", (i % 8).toLong)) ++
      (0 until 6000).map(i => ("big", (i % 3000).toLong))).toDF("g", "v")
    val got = ops.approxCountDistinct(rows, "g", col("v"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap

    def reference(values: Seq[Long]): Double = {
      val regs = new Array[Int](ops.m)
      values.distinct.foreach { v =>
        val x = TextHashOps.hash64(UTF8String.fromString(v.toString))
        val j = (x >>> (64 - ops.p)).toInt
        val rest = x << ops.p
        val rho = if (rest == 0L) ops.maxRho
          else java.lang.Long.numberOfLeadingZeros(rest) + 1
        if (rho > regs(j)) regs(j) = rho
      }
      val sInt = regs.map(mj => BigInt(1) << (ops.maxRho - mj)).sum
      val vEmpty = regs.count(_ == 0)
      val eRaw = ops.kRaw / sInt.toDouble
      val est = if (vEmpty > 0 && eRaw <= ops.lcThreshold) ops.lnEst(vEmpty) else eRaw
      BigDecimal(est).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val smallRef = reference((0 until 40).map(_ % 8).map(_.toLong))
    val bigRef = reference((0 until 6000).map(_ % 3000).map(_.toLong))
    assert(got("small") == smallRef, s"small: ${got("small")} != $smallRef")
    assert(got("big") == bigRef, s"big: ${got("big")} != $bigRef")
    // and the branches actually differ: small via linear counting (few
    // distinct -> mostly empty registers), big via the raw estimator
    val vSmall = reference2V((0 until 8).map(_.toLong))
    assert(smallRef ==
      BigDecimal(ops.lnEst(vSmall)).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble,
      "small group should take the linear-counting branch")
  }

  private def reference2V(distinct: Seq[Long]): Int = {
    import graft.functions.expr.TextHashOps
    import org.apache.spark.unsafe.types.UTF8String
    val ops = graft.operators.Hll
    val regs = new Array[Int](ops.m)
    distinct.foreach { v =>
      val x = TextHashOps.hash64(UTF8String.fromString(v.toString))
      val j = (x >>> (64 - ops.p)).toInt
      val rest = x << ops.p
      val rho = if (rest == 0L) ops.maxRho
        else java.lang.Long.numberOfLeadingZeros(rest) + 1
      if (rho > regs(j)) regs(j) = rho
    }
    regs.count(_ == 0)
  }

  test("Hll error stays within ~2 standard errors across cardinalities") {
    val ops = graft.operators.Hll
    // 1.04/sqrt(256) ~ 6.5% standard error; allow 2x
    Seq(150, 1500, 20000).foreach { n =>
      val df = (0 until n * 2).map(i => ("g", (i % n).toLong)).toDF("g", "v")
      val est = ops.approxCountDistinct(df, "g", col("v")).head().getDouble(1)
      val err = math.abs(est - n) / n
      info(f"n=$n est=$est%.1f err=${err * 100}%.2f%%")
      assert(err <= 0.13, s"n=$n est=$est err=$err")
    }
  }

  test("Hll estimate is multiplicity-blind (stream vs distinct set)") {
    val ops = graft.operators.Hll
    val once = (0 until 500).map(i => ("g", i.toLong)).toDF("g", "v")
    val heavy = (0 until 5000).map(i => ("g", (i % 500).toLong)).toDF("g", "v")
    val a = ops.approxCountDistinct(once, "g", col("v")).head().getDouble(1)
    val b = ops.approxCountDistinct(heavy, "g", col("v")).head().getDouble(1)
    assert(a == b, s"estimate must depend only on the distinct set: $a vs $b")
  }
}
