package graft.etl

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Operator-level parity tests for Extract (S1) + Transform (P1-P3, F1-F3)
  * on the synthetic Kickstarter fixture (FIXTURES.md §A; 12 raw rows, one
  * with a null name).
  */
class TransformSpec extends SparkTestBase {

  lazy val raw = Extract.campaignsCsv(spark, fixturePath("kickstarter_fixture.csv"))
  // no .cache(): the fixture is 12 rows, and a suite-lifetime cached block
  // in the SHARED test session would trip later suites' leak assertions
  lazy val out = Transform.campaigns(raw)

  test("S1: explicit schema — 15 columns incl. the space-named one") {
    assert(raw.columns.length == 15)
    assert(raw.columns.contains("usd pledged"))
    assert(raw.count() == 12)
  }

  test("S1: quoted comma and escaped quotes survive the CSV parse") {
    val name = raw.filter(col("ID") === 1001).select("name").head().getString(0)
    assert(name == "Cool, Comma \"Game\"")
  }

  test("P3: null-name row dropped (reference drops 4 of 378,661)") {
    assert(out.count() == 11)
    assert(out.filter(col("ID") === 1002).isEmpty)
  }

  test("P2: fixed 13-column output order (etl_pipeline.py:123-138)") {
    assert(out.columns.toSeq == Transform.outputColumns)
  }

  test("F1: both datetime shapes parse; bare deadline date is midnight") {
    val r = out.filter(col("ID") === 1000)
      .select(date_format(col("deadline_at"), "yyyy-MM-dd HH:mm:ss")).head().getString(0)
    assert(r == "2015-10-09 00:00:00")
  }

  test("F2: duration_days is fractional (etl_pipeline.py:95), not datediff") {
    val d = out.filter(col("ID") === 1000).select("duration_days").head().getDouble(0)
    // 2015-08-11 12:12:28 -> 2015-10-09 00:00:00 = 58 d + 42452 s
    assert(math.abs(d - (58.0 + 42452.0 / 86400.0)) < 1e-9)
    val z = out.filter(col("ID") === 1011).select("duration_days").head().getDouble(0)
    assert(z == 0.0)
  }

  test("F3: success_flag 1 iff state == successful") {
    val byFlag = out.groupBy("success_flag").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(byFlag == Map(1 -> 3, 0 -> 8))
    assert(out.filter(col("success_flag") === 1 && col("state") =!= "successful").isEmpty)
  }

  test("P1: renames applied — pledged_usd/goal_usd exist, raw names gone") {
    assert(out.columns.contains("pledged_usd") && out.columns.contains("goal_usd"))
    assert(!out.columns.contains("usd_pledged_real"))
  }

  test("A1: stateCounts descending with all six states") {
    val sc = Transform.stateCounts(out).collect().map(r => (r.getString(0), r.getLong(1)))
    assert(sc.map(_._1).toSet ==
      Set("failed", "successful", "canceled", "live", "undefined", "suspended"))
    assert(sc.map(_._2).toSeq == sc.map(_._2).sorted.reverse.toSeq)
    assert(sc.head == ("failed", 4L))
  }

  test("A4: nullCount on pledged_usd is 0 (log:46 invariant)") {
    assert(Transform.nullCount(out, "pledged_usd") == 0)
  }
}
