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
}
