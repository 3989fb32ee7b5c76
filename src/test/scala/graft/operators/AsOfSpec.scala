package graft.operators

import java.sql.Timestamp

import graft.SparkTestBase

class AsOfSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(hhmm: String): Timestamp =
    Timestamp.valueOf(s"2024-01-01 $hhmm:00")

  // right: per-user snapshots (unique per (user_id, ts))
  private lazy val snaps = Seq(
    (1L, ts("10:00"), "a"), (1L, ts("11:00"), "b"), (1L, ts("12:00"), "c"),
    (2L, ts("10:30"), "x")
  ).toDF("user_id", "ts", "tag")

  private lazy val facts = Seq(
    (100L, 1L, ts("10:59")), // between a and b -> a
    (101L, 1L, ts("11:00")), // EXACTLY at b -> b (inclusive tie)
    (102L, 1L, ts("13:00")), // after all -> c
    (103L, 2L, ts("10:00")), // before any snapshot -> null
    (104L, 3L, ts("10:00"))  // key with no snapshots -> null
  ).toDF("event_id", "user_id", "ts")

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.orderBy("event_id").collect()
      .map(r => (r.getLong(0), Option(r.getAs[Timestamp]("asof_ts")),
        Option(r.getAs[String]("tag")))).toSeq

  test("backward as-of: latest at-or-before snapshot, inclusive at equal ts") {
    val out = rows(AsOf.asofBackward(facts, snaps, "user_id", "ts"))
    assert(out == Seq(
      (100L, Some(ts("10:00")), Some("a")),
      (101L, Some(ts("11:00")), Some("b")),
      (102L, Some(ts("12:00")), Some("c")),
      (103L, None, None),
      (104L, None, None)), s"got $out")
  }

  test("tolerance nulls out matches older than the window") {
    val out = rows(AsOf.asofBackward(facts, snaps, "user_id", "ts",
      toleranceMs = Some(30L * 60000)))
    // 100 (10:59) is 59 min after snapshot a (10:00) and 102 (13:00) is
    // 60 min after c (12:00) -> both aged out; 101 is 0 min after b
    assert(out == Seq(
      (100L, None, None),
      (101L, Some(ts("11:00")), Some("b")),
      (102L, None, None),
      (103L, None, None),
      (104L, None, None)), s"got $out")
  }

  test("tolerance compares at microsecond precision (sub-ms straddle ages out)") {
    // with tol = 1 ms: a match exactly 1.000 ms old stays, one 1.500 ms
    // old must age out — a millisecond-FLOORED difference (1 <= 1) would
    // wrongly keep it, so this pins the micros-precision comparison
    def tsMicro(ms: Long, micros: Int) = {
      val t = new Timestamp(ms)
      t.setNanos(((ms % 1000) * 1000 + micros).toInt * 1000)
      t
    }
    val base = 1700000000000L // whole-second epoch
    val snaps = Seq((1L, tsMicro(base, 0), "s")).toDF("user_id", "ts", "tag")
    val facts = Seq(
      (100L, 1L, tsMicro(base + 1, 0)),  // +1.000 ms == tol -> kept
      (101L, 1L, tsMicro(base + 1, 500)) // +1.500 ms -> aged out
    ).toDF("event_id", "user_id", "ts")
    val out = rows(AsOf.asofBackward(facts, snaps, "user_id", "ts",
      toleranceMs = Some(1L)))
    assert(out == Seq(
      (100L, Some(tsMicro(base, 0)), Some("s")),
      (101L, None, None)), s"got $out")
  }

  test("carried columns all come from the SAME right row even when a field is null") {
    // snapshot b carries a NULL tag: a per-column ignoreNulls carry would
    // reach back to a's tag while taking b's ts — the struct must not
    val snapsWithNull = Seq(
      (1L, ts("10:00"), Option("a")), (1L, ts("11:00"), None)
    ).toDF("user_id", "ts", "tag")
    val fact = Seq((100L, 1L, ts("11:30"))).toDF("event_id", "user_id", "ts")
    val out = rows(AsOf.asofBackward(fact, snapsWithNull, "user_id", "ts"))
    assert(out == Seq((100L, Some(ts("11:00")), None)), s"got $out")
  }

  test("left columns pass through unchanged and collisions are rejected") {
    val out = AsOf.asofBackward(facts, snaps, "user_id", "ts")
    assert(out.columns.toSeq == Seq("event_id", "user_id", "ts", "asof_ts", "tag"))
    val badRight = Seq((1L, ts("10:00"), "x")).toDF("user_id", "ts", "event_id")
    assertThrows[IllegalArgumentException] {
      AsOf.asofBackward(facts, badRight, "user_id", "ts")
    }
  }

  test("randomized corpus matches an in-JVM brute force") {
    val rnd = new scala.util.Random(7L)
    val snapSeq = for {
      u <- 1L to 8L
      t <- (0 until 20).map(_ => rnd.nextInt(10000))
    } yield (u, new Timestamp(1700000000000L + t * 1000L), s"s$u-$t")
    val snapsDf = snapSeq.distinct
      .groupBy(s => (s._1, s._2)).map(_._2.head).toSeq // unique per (key, ts)
      .toDF("user_id", "ts", "tag")
    val factSeq = for {
      u <- 1L to 10L
      i <- 0 until 30
    } yield ((u * 1000 + i), u, new Timestamp(1700000000000L + rnd.nextInt(11000) * 1000L))
    val factsDf = factSeq.toDF("event_id", "user_id", "ts")
    val bySnap = snapSeq.distinct.groupBy(s => (s._1, s._2)).map(_._2.head).toSeq
      .groupBy(_._1).view.mapValues(_.sortBy(_._2.getTime)).toMap
    val expect = factSeq.map { case (id, u, t) =>
      val m = bySnap.getOrElse(u, Seq.empty).filter(_._2.getTime <= t.getTime).lastOption
      (id, m.map(_._2), m.map(_._3))
    }.sortBy(_._1)
    val got = rows(AsOf.asofBackward(factsDf, snapsDf, "user_id", "ts"))
    assert(got == expect)
  }
}
