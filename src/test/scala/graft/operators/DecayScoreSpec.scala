package graft.operators

import java.sql.Timestamp

import graft.SparkTestBase

/** [[DecayScore]] — exact integer per-term decay, merge law. */
class DecayScoreSpec extends SparkTestBase {
  import spark.implicits._

  private val horizon = "2024-02-01"
  private val h0 = Timestamp.valueOf("2024-02-01 00:00:00").getTime

  private def ev(user: Long, hoursBefore: Double, vc: Long) =
    (user, new Timestamp(h0 - (hoursBefore * 3600000L).toLong), vc)

  private def scores(rows: Seq[(Long, Timestamp, Long)]): Map[Long, (Long, Long)] =
    DecayScore.aggregate(
        DecayScore.contributions(rows.toDF("user_id", "ts", "vc"), horizon))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap

  test("halving per full hour of age, floored per term") {
    val rows = Seq(ev(1L, 0.5, 1000L), ev(1L, 1.5, 1000L), ev(1L, 2.5, 1001L))
    // ages 0, 1, 2 -> 1000 + 500 + 250 (1001 div 4 floors)
    assert(scores(rows) === Map(1L -> (3L, 1750L)))
  }

  test("events after the horizon clamp to undecayed; huge ages contribute zero") {
    val rows = Seq(ev(2L, -5.0, 700L), ev(2L, 100000.0, Long.MaxValue / 2))
    assert(scores(rows) === Map(2L -> (2L, 700L)))
  }

  test("merge law: sum of split-partition scores equals the whole (any split)") {
    val rows = (0L until 400L).map(i =>
      ev(i % 7, (i % 50).toDouble + 0.25, (i * 7919L) % 100000L))
    val whole = scores(rows)
    val (p1, p2) = rows.splitAt(137)
    val merged = (scores(p1).toSeq ++ scores(p2).toSeq)
      .groupBy(_._1).view.mapValues(vs =>
        (vs.map(_._2._1).sum, vs.map(_._2._2).sum)).toMap
    assert(whole === merged)
  }

  test("matches a driver-side reference") {
    val rows = (0L until 300L).map(i =>
      ev(i % 5, (i * 13 % 90).toDouble / 2.0, (i * 104729L) % 50000L))
    val want = rows.groupBy(_._1).map { case (u, es) =>
      u -> (es.size.toLong, es.map { case (_, t, v) =>
        val age = math.max((h0 - t.getTime) / 3600000L, 0L)
        if (age < 63) v >> age else 0L
      }.sum)
    }
    assert(scores(rows) === want)
  }
}
