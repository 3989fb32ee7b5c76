package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.functions.TextFunctions._
import graft.functions.expr.HashFunctions._
import graft.functions.expr.TextHashOps

class HashExpressionsSpec extends SparkTestBase {
  import spark.implicits._

  test("hash64 is deterministic and avalanche-y") {
    val a = TextHashOps.hash64(org.apache.spark.unsafe.types.UTF8String.fromString("abc"))
    val b = TextHashOps.hash64(org.apache.spark.unsafe.types.UTF8String.fromString("abd"))
    assert(a == TextHashOps.hash64(org.apache.spark.unsafe.types.UTF8String.fromString("abc")))
    assert(java.lang.Long.bitCount(a ^ b) > 16) // one-char change flips many bits
  }

  test("simhash: identical token sets equal; near sets within small hamming") {
    val base = "spark sql shuffle partition join scan filter codegen"
    val near = base.replace("codegen", "codegem")
    val far = "alpha beta gamma delta epsilon zeta eta theta"
    val df = Seq((base, near, far)).toDF("a", "b", "c").select(
      simhash64(tokens($"a")).as("ha"),
      simhash64(tokens($"a")).as("ha2"),
      simhash64(tokens($"b")).as("hb"),
      simhash64(tokens($"c")).as("hc"))
    val r = df.head()
    assert(r.getLong(0) == r.getLong(1))
    def ham(x: Long, y: Long) = java.lang.Long.bitCount(x ^ y)
    assert(ham(r.getLong(0), r.getLong(2)) < ham(r.getLong(0), r.getLong(3)))
  }

  test("minhash signature has k entries and estimates jaccard") {
    val a = (1 to 100).map(i => s"sh$i")
    val b = (21 to 120).map(i => s"sh$i") // |intersect|=80, |union|=120 -> j=2/3
    val df = Seq((a, b)).toDF("a", "b").select(
      minhashSignature($"a", 256).as("sa"), minhashSignature($"b", 256).as("sb"))
    val r = df.head()
    val sa = r.getSeq[Long](0); val sb = r.getSeq[Long](1)
    assert(sa.length == 256)
    val est = sa.zip(sb).count { case (x, y) => x == y }.toDouble / 256
    assert(math.abs(est - 2.0 / 3.0) < 0.15)
  }

  test("rolling fingerprint: equal docs equal; robust to far-from-min edits") {
    val doc = "q w e r t y u i o p a s d f g h j k l"
    val df = Seq((doc, doc + " zzz_extra_token")).toDF("a", "b").select(
      rollingFingerprint(tokens($"a")).as("fa"),
      rollingFingerprint(tokens($"b")).as("fb"))
    val r = df.head()
    // appended token only adds windows; min over windows can only change
    // if a new window hashes lower — equality here demonstrates locality
    assert(r.getLong(0) == TextHashOps.rollingFingerprint(
      org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
        doc.split(" ").map(org.apache.spark.unsafe.types.UTF8String.fromString)), 5))
  }

  test("expressions stay inside whole-stage codegen") {
    // Input must come from a non-local source: a literal Seq.toDF is
    // constant-folded by ConvertToLocalRelation into a LocalTableScan,
    // leaving no codegen stage to assert on. spark.range survives.
    val df = spark.range(8)
      .select(concat_ws(" ", lit("tok"), $"id".cast("string"), lit("a b c")).as("t"))
      .select(
        simhash64(tokens($"t")).as("h"),
        minhashSignature(tokens($"t"), 16).as("sig"),
        rollingFingerprint(tokens($"t")).as("fp"))
    // `*(n)` in simpleString marks a codegen stage; assert on the node
    // itself so the check doesn't depend on toString formatting.
    val stages = df.queryExecution.executedPlan.collect {
      case w: org.apache.spark.sql.execution.WholeStageCodegenExec => w
    }
    assert(stages.nonEmpty, s"no codegen stage in:\n${df.queryExecution.executedPlan}")
    assert(stages.exists(_.toString.contains("simhash64")),
      "custom expressions not inside the codegen stage")
    // and the result is actually computed through the generated code path
    assert(df.collect().length == 8)
  }
}
