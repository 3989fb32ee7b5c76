package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Bloom runtime-filter join (q175's shape): the gate may pass false
  * positives but NEVER drops a true member, so gate + exact join must
  * equal the plain join; and the gate must sit below the join in the
  * physical plan (map-side, before the exchange).
  */
class BloomJoinSpec extends SparkTestBase {
  import spark.implicits._

  private val dim = (0L until 400L).filter(_ % 7 == 0).map(k => (k, s"d$k"))
  private val fact = (0L until 4000L).map(i => (i % 400L, i))

  test("gate + exact join equals the plain join (no false negatives)") {
    val d = dim.toDF("k", "attr")
    val f = fact.toDF("k", "v")
    val bits = Bloom.build(d, col("k"), d = 4, logW = 12)
    val gated = Bloom.gate(f, col("k"), bits, d = 4, logW = 12)
      .filter(col("bloom_maybe")).drop("bloom_maybe")
    val viaBloom = gated.join(d, Seq("k")).groupBy("k")
      .agg(count(lit(1)).as("n"), sum("v").as("sv"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val plain = f.join(d, Seq("k")).groupBy("k")
      .agg(count(lit(1)).as("n"), sum("v").as("sv"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(viaBloom === plain)
    assert(plain.nonEmpty)
  }

  test("the gate actually rejects most non-members at the chosen sizing") {
    val d = dim.toDF("k", "attr")
    val bits = Bloom.build(d, col("k"), d = 4, logW = 16)
    val nonMembers = (0L until 400L).filter(_ % 7 != 0).toDF("k")
    val passed = Bloom.gate(nonMembers, col("k"), bits, d = 4, logW = 16)
      .filter(col("bloom_maybe")).count()
    assert(passed < 20, s"fp sliver too large: $passed of ${400 - dim.size}")
  }

  test("gate evaluates below the join in the physical plan (map-side reduction)") {
    val d = dim.toDF("k", "attr")
    // RDD-backed frame: a plain local relation would be constant-folded
    // (the filter pushes below repartition and ConvertToLocalRelation
    // evaluates the gate at optimize time — observed, not hypothetical)
    val f = Dedup.rebasedFrame(fact.toDF("k", "v"))
    val bits = Bloom.build(d, col("k"), d = 4, logW = 12)
    val joined = Bloom.gate(f, col("k"), bits, d = 4, logW = 12)
      .filter(col("bloom_maybe")).drop("bloom_maybe")
      .hint("SHUFFLE_HASH").join(d.hint("SHUFFLE_HASH"), Seq("k"))
    val plan = joined.queryExecution.executedPlan.toString
    val joinIdx = plan.indexOf("Join")
    val gateIdx = plan.toLowerCase.indexOf("bloom_contains")
    assert(joinIdx >= 0 && gateIdx >= 0, s"join/gate missing from plan:\n$plan")
    assert(gateIdx > joinIdx,
      s"bloom gate must appear BELOW the join (later in the plan tree string):\n$plan")
  }
}
