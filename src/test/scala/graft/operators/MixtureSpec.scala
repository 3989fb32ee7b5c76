package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class MixtureSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val docs = (0L until 200L).map(i => (i, s"src${i % 4}"))
    .toDF("doc_id", "source")

  test("integer weights produce exactly w copies, numbered 1..w") {
    val out = Mixture.resample(docs, Map("src0" -> 3.0, "src1" -> 1.0))
      .groupBy("doc_id", "source").agg(count(lit(1)).as("n"),
        max("copy").as("hi"), min("copy").as("lo"))
      .collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val w = if (r.getString(1) == "src0") 3L else 1L
      assert(r.getLong(2) == w && r.getLong(3) == w && r.getLong(4) == 1L, r)
    }
  }

  test("weight 0 and unlisted groups both drop every row") {
    val out = Mixture.resample(docs, Map("src0" -> 1.0, "src1" -> 0.0))
    assert(out.select("source").distinct().collect().map(_.getString(0)).toSeq == Seq("src0"))
  }

  test("a fractional weight keeps each doc base or base+1 times, deterministically") {
    val run1 = Mixture.resample(docs, Map("src0" -> 1.5))
      .groupBy("doc_id").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(run1.values.forall(n => n == 1L || n == 2L))
    // 50 src0 docs at +0.5: some promoted, some not (both branches real)
    assert(run1.values.exists(_ == 1L) && run1.values.exists(_ == 2L))
    val run2 = Mixture.resample(docs, Map("src0" -> 1.5))
      .groupBy("doc_id").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(run1 == run2, "the sample must be reproducible")
    // an independent salt draws a different promotion set
    val other = Mixture.resample(docs, Map("src0" -> 1.5), salt = "other")
      .groupBy("doc_id").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(other != run1)
  }

  test("copyCounts equals resample's per-doc multiplicity, with 0-copy rows retained") {
    val weights = Map("src0" -> 1.5, "src1" -> 0.25, "src2" -> 0.0)
    val counts = Mixture.copyCounts(docs, weights)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_copies")).toMap
    val exploded = Mixture.resample(docs, weights)
      .groupBy("doc_id").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    // every resampled doc's copy count matches; docs counts has but
    // resample dropped must be exactly the n_copies == 0 rows
    exploded.foreach { case (id, n) => assert(counts(id) == n, s"doc $id") }
    val zeroOnly = counts.keySet -- exploded.keySet
    assert(zeroOnly.nonEmpty, "fixture must exercise the 0-copy branch")
    zeroOnly.foreach(id => assert(counts(id) == 0L, s"doc $id"))
    // unlisted group src3 is dropped from BOTH views
    assert(counts.keySet.forall(_ % 4 != 3))
  }

  test("weights whose fraction is not a multiple of 1/256 are rejected") {
    intercept[IllegalArgumentException] {
      Mixture.resample(docs, Map("src0" -> 0.3))
    }
  }

  test("the resample plans with no shuffle: broadcast join + map-side explode only") {
    val plan = Mixture.resample(docs, Map("src0" -> 2.5))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"), plan)
    assert(plan.contains("BroadcastHashJoin"), plan)
  }

  test("sqrt-temperature: derived weights match the closed form; dominant group keeps 1.0") {
    // skewed groups: big 160 docs, mid 90, small 10 -> k = 256,
    // floor(sqrt(90/160)*256) = 192, floor(sqrt(10/160)*256) = 64
    val skewed = ((0L until 160L).map(i => (i, "big")) ++
      (1000L until 1090L).map(i => (i, "mid")) ++
      (2000L until 2010L).map(i => (i, "small"))).toDF("doc_id", "g")
    val out = Mixture.sqrtTemperatureResample(skewed, groupCol = "g", salt = "ts")
    val perGroup = out.groupBy("g").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // the dominant group resamples at exactly weight 1.0: every doc once
    assert(perGroup("big") == 160L)
    // others match resample() under the closed-form snapped weights
    val expected = Mixture.resample(skewed,
      Map("big" -> 1.0, "mid" -> 192.0 / 256, "small" -> 64.0 / 256),
      groupCol = "g", salt = "ts")
      .groupBy("g").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(perGroup == expected)
    // kept fraction sits near the weight (the hex-pair rule's 1/256 law)
    assert(math.abs(perGroup("mid") / 90.0 - 0.75) < 0.15)
  }

  test("sqrt-temperature: a vanishing group clamps to 1/256, never to zero") {
    val skewed = ((0L until 200L).map(i => (i, "big")) ++
      Seq((9000L, "tiny"))).toDF("doc_id", "g")
    // w_tiny = sqrt(1/200) ~ 0.0707 -> k = 18, but the CLAMP only binds
    // below 1/256; either way the group must remain eligible
    val w = Mixture.sqrtTemperatureResample(skewed, groupCol = "g", salt = "ts2")
    // eligibility, not luck: with k = 18 the single doc keeps iff its
    // hex pair <= '11'; assert the rule, not the draw — recompute it
    val h = java.security.MessageDigest.getInstance("MD5")
      .digest("9000:ts2".getBytes("UTF-8")).take(1).map("%02x".format(_)).mkString
    val kept = w.filter(col("g") === "tiny").count()
    assert(kept == (if (h <= "11") 1L else 0L))
  }
}
