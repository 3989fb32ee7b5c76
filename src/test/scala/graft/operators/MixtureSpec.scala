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
}
