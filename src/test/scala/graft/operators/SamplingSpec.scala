package graft.operators

import graft.SparkTestBase

class SamplingSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val pool =
    ((0 until 100).map(i => (i.toLong, 1000L)) ++        // heavy
      (100 until 1100).map(i => (i.toLong, 10L)))        // light, 10x count
      .toDF("id", "w")

  test("heavier weights dominate the sample despite being outnumbered 10:1") {
    // heavy mass 100k vs light mass 10k -> heavy expected share ~10/11
    val got = Sampling.weightedSample(pool, "id", "w", k = 50)
      .select("id").as[Long].collect()
    assert(got.length == 50)
    val heavy = got.count(_ < 100)
    assert(heavy >= 35, s"expected heavy-weight dominance, got $heavy/50")
  }

  test("deterministic across partitionings; salt draws a different sample") {
    val a = Sampling.weightedSample(pool, "id", "w", 20).collect().map(_.toSeq)
    val b = Sampling.weightedSample(pool.repartition(13), "id", "w", 20)
      .collect().map(_.toSeq)
    assert(a.toSeq == b.toSeq, "sample must not depend on partitioning")
    val c = Sampling.weightedSample(pool, "id", "w", 20, salt = "other")
      .select("id").as[Long].collect().toSet
    assert(c != a.map(_.head.asInstanceOf[Long]).toSet,
      "a different salt should draw a different sample")
  }

  test("non-positive weights are never sampled") {
    val withZero = pool.unionByName(
      Seq((5000L, 0L), (5001L, -3L)).toDF("id", "w"))
    val got = Sampling.weightedSample(withZero, "id", "w", 2000)
      .select("id").as[Long].collect().toSet
    assert(!got.contains(5000L) && !got.contains(5001L))
    assert(got.size == pool.count())
  }

  test("plans as TakeOrderedAndProject (k-capped, no global sort)") {
    val plan = Sampling.weightedSample(pool, "id", "w", 10)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"selection should be k-capped per partition:\n$plan")
  }
}
