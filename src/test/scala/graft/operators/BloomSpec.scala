package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class BloomSpec extends SparkTestBase {
  import spark.implicits._

  // small space (2^8 bits, 2 hashes) so false positives are findable
  private val d = 2
  private val logW = 8

  private lazy val corpus = (0 until 60).map(i => s"member$i").toDF("item")
  private lazy val bits = Bloom.build(corpus, col("item"), d, logW)

  test("no false negatives: every member passes the gate") {
    val gated = Bloom.gate(corpus, col("item"), bits, d, logW)
    assert(gated.filter(!col("bloom_maybe")).count() == 0)
  }

  test("definitely-new verdicts exist and a false positive is observable") {
    val probes = (0 until 2000).map(i => s"probe$i").toDF("item")
    val gated = Bloom.gate(probes, col("item"), bits, d, logW)
      .groupBy("bloom_maybe").count()
      .collect().map(r => r.getBoolean(0) -> r.getLong(1)).toMap
    // ~120/256 bits set -> fp rate ~(0.47)^2 ~ 20%: both verdicts occur
    assert(gated.getOrElse(false, 0L) > 0, "no definitely-new verdicts")
    assert(gated.getOrElse(true, 0L) > 0,
      "no false positives found — the spec's small space should force some")
    // and none of the probes is an actual member
    assert(probes.intersect(corpus).count() == 0)
  }

  test("kernel matches an independent replay over the positions form") {
    import org.apache.spark.unsafe.types.UTF8String
    import graft.functions.expr.TextHashOps
    val posSet = Bloom.positions(corpus, col("item"), d, logW)
      .collect().map(_.getInt(0)).toSet
    val probes = (0 until 500).map(i => s"p$i")
    val viaExpr = Bloom.gate(probes.toDF("item"), col("item"), bits, d, logW)
      .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    probes.foreach { p =>
      val buckets = (0 until d).map { i =>
        val x = TextHashOps.hash64(UTF8String.fromString(p))
        ((x * graft.functions.expr.CmsParams.A(i) +
          graft.functions.expr.CmsParams.B(i)) & ((1L << logW) - 1)).toInt
      }
      assert(viaExpr(p) == buckets.forall(posSet), s"mismatch for '$p'")
    }
  }

  test("gate is map-side: no exchange in the gated plan") {
    val plan = Bloom.gate((0 until 10).map(i => s"x$i").toDF("item"),
      col("item"), bits, d, logW).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"bloom gate must not shuffle or join:\n$plan")
  }
}
