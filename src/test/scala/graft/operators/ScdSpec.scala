package graft.operators

import graft.SparkTestBase

class ScdSpec extends SparkTestBase {
  import spark.implicits._

  private def history(rows: Seq[(Long, Option[String], Int, Int)]) =
    Scd.scd2History(
        rows.toDF("k", "status", "ts", "tie"),
        keyCols = Seq("k"), attrCols = Seq("status"),
        tsCol = "ts", tieCols = Seq("tie"))
      .orderBy("k", "version")
      .collect()
      .map(r => (r.getLong(0), Option(r.getString(1)), r.getLong(2),
        r.getInt(3), Option(r.get(4)).map(_.asInstanceOf[Int]),
        r.getBoolean(5)))
      .toSeq

  test("unchanged re-observations compress; intervals abut; last version is current") {
    val out = history(Seq(
      (1L, Some("A"), 10, 0), (1L, Some("A"), 20, 0),
      (1L, Some("B"), 30, 0), (1L, Some("A"), 40, 0),
      (2L, Some("X"), 10, 0)))
    assert(out == Seq(
      (1L, Some("A"), 1L, 10, Some(30), false),
      (1L, Some("B"), 2L, 30, Some(40), false),
      (1L, Some("A"), 3L, 40, None, true),
      (2L, Some("X"), 1L, 10, None, true)))
  }

  test("null attributes are null-safe: null==null compresses, to/from null opens a version") {
    val out = history(Seq(
      (3L, None, 10, 0), (3L, None, 20, 0), (3L, Some("Y"), 30, 0),
      (3L, None, 40, 0)))
    assert(out == Seq(
      (3L, None, 1L, 10, Some(30), false),
      (3L, Some("Y"), 2L, 30, Some(40), false),
      (3L, None, 3L, 40, None, true)))
  }

  test("same-timestamp observations order by the tie columns, deterministically") {
    val out = history(Seq(
      (4L, Some("Q"), 10, 2), (4L, Some("P"), 10, 1)))
    assert(out == Seq(
      (4L, Some("P"), 1L, 10, Some(10), false),
      (4L, Some("Q"), 2L, 10, None, true)))
  }

  test("applyChanges == full rebuild, across every split point of an interleaved feed") {
    // keys with: multi-version history, a batch that only re-observes the
    // current state (no new version), a brand-new key, null transitions,
    // and a same-timestamp tie inside one batch
    val feed = Seq(
      (1L, Some("A"), 10, 1), (1L, Some("B"), 20, 2), (1L, Some("B"), 30, 3),
      (1L, Some("A"), 50, 4),
      (2L, Some("X"), 15, 5), (2L, Some("X"), 45, 6),
      (3L, None, 12, 7), (3L, Some("Y"), 40, 8), (3L, None, 40, 9),
      (4L, Some("N"), 60, 10))
    val df = feed.toDF("k", "status", "ts", "tie")
    val full = Scd.scd2History(df, Seq("k"), Seq("status"), "ts", Seq("tie"))
      .orderBy("k", "version").collect().map(_.toSeq).toSeq
    for (t <- Seq(14, 25, 41, 55)) {
      val hist = Scd.scd2History(df.filter($"ts" <= t), Seq("k"), Seq("status"), "ts", Seq("tie"))
      val inc = Scd.applyChanges(hist, df.filter($"ts" > t),
          Seq("k"), Seq("status"), "ts", Seq("tie"))
        .orderBy("k", "version").collect().map(_.toSeq).toSeq
      assert(inc == full, s"split at ts=$t: incremental $inc vs full $full")
    }
  }

  test("applyChanges touches only batch keys: untouched history passes through by reference") {
    val hist = Scd.scd2History(
      Seq((1L, "A", 10, 0), (2L, "X", 10, 0)).toDF("k", "status", "ts", "tie"),
      Seq("k"), Seq("status"), "ts", Seq("tie"))
    val out = Scd.applyChanges(hist, Seq((1L, "B", 20, 0)).toDF("k", "status", "ts", "tie"),
      Seq("k"), Seq("status"), "ts", Seq("tie"))
    // key 2 is untouched: same row, still current
    val k2 = out.filter($"k" === 2L).collect()
    assert(k2.length == 1 && k2.head.getAs[Boolean]("is_current"))
    // key 1: closed original + new current version 2
    val k1 = out.filter($"k" === 1L).orderBy("version").collect()
    assert(k1.map(_.getAs[String]("status")).toSeq == Seq("A", "B"))
    assert(k1.map(_.getAs[Boolean]("is_current")).toSeq == Seq(false, true))
    assert(k1.map(_.getAs[Long]("version")).toSeq == Seq(1L, 2L))
  }

  test("all three window passes share one exchange (single shuffle, single sort)") {
    val df = Scd.scd2History(
      Seq((1L, "A", 10, 0), (1L, "B", 20, 0)).toDF("k", "status", "ts", "tie"),
      keyCols = Seq("k"), attrCols = Seq("status"), tsCol = "ts", tieCols = Seq("tie"))
    val plan = df.queryExecution.executedPlan.toString
    assert("Exchange hashpartitioning".r.findAllIn(plan).size == 1, plan)
    assert("\\bSort\\b".r.findAllIn(plan).size == 1, plan)
  }
}
