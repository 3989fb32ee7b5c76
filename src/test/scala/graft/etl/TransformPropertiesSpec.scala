package graft.etl

import java.time.format.DateTimeFormatter
import java.time.{Instant, LocalDate, ZoneOffset}

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkTestBase
import graft.star.StarBuilder

/** Property-based checks (SURVEY §5.2-4) over ScalaCheck-generated
  * campaign data, deterministic via fixed seeds:
  *
  *   - duration_days is EXACTLY (deadline - launched) seconds / 86400
  *     (fractional, sign included — never integer datediff);
  *   - success_flag ∈ {0,1} and = 1 iff state = 'successful';
  *   - the null-name filter drops exactly the null-name rows;
  *   - Dim_Date's date_key round-trips to full_date (yyyyMMdd semantic
  *     key) and its parts agree with the date;
  *   - fact build preserves row count and resolves every FK (0 orphans)
  *     — distinct-then-join loses nothing.
  */
case class RawCampaign(ID: Long, name: String, category: String, main_category: String,
    currency: String, deadline: String, goal: Double, launched: String,
    pledged: Double, state: String, backers: Long, country: String,
    usd_pledged_real: Double, usd_goal_real: Double)

class TransformPropertiesSpec extends SparkTestBase {
  import spark.implicits._

  private type Raw = RawCampaign
  private val Raw = RawCampaign

  private val tsFmt = DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss").withZone(ZoneOffset.UTC)
  private val dFmt = DateTimeFormatter.ofPattern("yyyy-MM-dd").withZone(ZoneOffset.UTC)

  private val rowGen: Gen[Raw] = for {
    name <- Gen.frequency(9 -> Gen.alphaNumStr.map(_.take(24)), 1 -> Gen.const(null))
    cat <- Gen.oneOf("Indie Rock", "Documentary", "Tabletop Games", "Painting")
    mainCat <- Gen.oneOf("Music", "Film & Video", "Games", "Art")
    // launched in [2009, 2018); deadline = launched + [-2d, +90d] so a few
    // negative durations exercise the sign path
    launchedSec <- Gen.choose(1230768000L, 1514764800L)
    deltaSec <- Gen.choose(-2L * 86400, 90L * 86400)
    state <- Gen.oneOf("failed", "successful", "canceled", "undefined", "live", "suspended")
    backers <- Gen.choose(0L, 100000L)
    pledged <- Gen.choose(0.0, 1e6)
    goal <- Gen.choose(1.0, 1e6)
  } yield Raw(0L, name, cat, mainCat, "USD",
    dFmt.format(Instant.ofEpochSecond(launchedSec + deltaSec)),
    goal, tsFmt.format(Instant.ofEpochSecond(launchedSec)),
    pledged, state, backers, "US", pledged, goal)

  /** n deterministic rows with unique IDs. */
  private def sample(n: Int, seed: Long): Seq[Raw] =
    Gen.listOfN(n, rowGen)(Gen.Parameters.default, Seed(seed)).get
      .zipWithIndex.map { case (r, i) => r.copy(ID = i.toLong) }

  private def forSeeds(check: Seq[Raw] => Unit): Unit =
    Seq(42L, 7L, 2026L).foreach(s => check(sample(150, s)))

  private def launchedEpoch(r: Raw): Long = Instant.from(tsFmt.parse(r.launched)).getEpochSecond
  private def deadlineEpoch(r: Raw): Long = // bare date parses to midnight UTC
    LocalDate.parse(r.deadline).atStartOfDay(ZoneOffset.UTC).toEpochSecond

  test("duration_days equals fractional (deadline - launched)/86400, sign included") {
    forSeeds { rows =>
      val out = Transform.campaigns(rows.toDF())
        .select($"ID", $"duration_days").as[(Long, Double)].collect().toMap
      rows.filter(_.name != null).foreach { r =>
        val expected = (deadlineEpoch(r) - launchedEpoch(r)) / 86400.0
        assert(out(r.ID) == expected, s"ID ${r.ID}: ${out(r.ID)} != $expected")
      }
    }
  }

  test("success_flag is 0/1 and 1 exactly for state = successful") {
    forSeeds { rows =>
      val out = Transform.campaigns(rows.toDF())
        .select($"ID", $"success_flag", $"state").as[(Long, Int, String)].collect()
      assert(out.forall { case (_, f, s) => (f == 1) == (s == "successful") && (f == 0 || f == 1) })
    }
  }

  test("null-name filter drops exactly the null-name rows") {
    forSeeds { rows =>
      val n = Transform.campaigns(rows.toDF()).count()
      assert(n == rows.count(_.name != null))
    }
  }

  test("date_key round-trips to full_date and date parts agree") {
    forSeeds { rows =>
      val dims = StarBuilder.dimDate(Transform.campaigns(rows.toDF())).collect()
      assert(dims.nonEmpty)
      dims.foreach { d =>
        val full = LocalDate.parse(d.getAs[String]("full_date"))
        assert(d.getAs[Int]("date_key") ==
          full.getYear * 10000 + full.getMonthValue * 100 + full.getDayOfMonth)
        assert(d.getAs[Int]("year") == full.getYear)
        assert(d.getAs[Int]("month") == full.getMonthValue)
        assert(d.getAs[Int]("day") == full.getDayOfMonth)
        assert(d.getAs[Int]("quarter") == (full.getMonthValue + 2) / 3)
        val dow = full.getDayOfWeek
        assert((d.getAs[Int]("is_weekend") == 1) ==
          (dow == java.time.DayOfWeek.SATURDAY || dow == java.time.DayOfWeek.SUNDAY))
      }
    }
  }

  test("fact build preserves row count and resolves every FK") {
    forSeeds { rows =>
      val campaigns = Transform.campaigns(rows.toDF())
      val fact = StarBuilder.factCampaigns(campaigns,
        StarBuilder.dimState(campaigns), StarBuilder.dimCategory(campaigns),
        StarBuilder.dimDate(campaigns))
      assert(fact.count() == campaigns.count())
      assert(fact.filter($"state_key".isNull || $"category_key".isNull ||
        $"launched_date_key".isNull).count() == 0)
    }
  }
}
