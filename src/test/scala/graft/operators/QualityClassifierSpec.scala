package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.functions.expr.ClassifierFunctions.charGramBuckets
import graft.functions.expr.TextHashOps

class QualityClassifierSpec extends SparkTestBase {
  import spark.implicits._

  // two PLANTED separable classes: "good" docs drawn from one character
  // vocabulary, "junk" docs from a disjoint one — a linear model over
  // hashed char-3-grams must separate them perfectly
  private def goodText(i: Int): String =
    Seq("clean", "prose", "reads", "well", "here")
      .map(w => w + (i % 3)).mkString(" ")
  private def junkText(i: Int): String =
    Seq("zzxqj", "qqvvk", "xjzzp", "vkqqx")
      .map(w => w + (i % 3)).mkString(" ")

  private lazy val labeled = ((0 until 30).map(i => (i.toLong, goodText(i), true)) ++
    (30 until 60).map(i => (i.toLong, junkText(i), false)))
    .toDF("doc_id", "text", "y")

  test("kernel: buckets == hash64-of-substring reference, by codepoint") {
    // includes a multi-byte char so codepoint windows != byte windows
    val s = "abcé déf"
    val got = Seq(s).toDF("t")
      .select(charGramBuckets(col("t"), 3, 1024).as("bs"))
      .collect().head.getSeq[Int](0)
    val cps = s.toCharArray.map(_.toString) // all BMP chars here
    val expect = (0 to cps.length - 3).map { i =>
      val gram = cps.slice(i, i + 3).mkString
      (TextHashOps.hash64(
        org.apache.spark.unsafe.types.UTF8String.fromString(gram)) & 1023L).toInt
    }
    assert(got == expect)
    // short strings yield no grams
    assert(Seq("ab").toDF("t").select(charGramBuckets(col("t"), 3, 1024))
      .collect().head.getSeq[Int](0).isEmpty)
  }

  test("planted separable classes: every doc classified correctly, keep == score >= 0.5") {
    val model = QualityClassifier.train(labeled, labelCol = "y")
    val out = QualityClassifier.score(labeled, model)
      .join(labeled.select(col("doc_id"), col("y")), "doc_id")
      .collect()
    assert(out.length == 60)
    out.foreach { r =>
      val keep = r.getAs[Boolean]("keep")
      val score = r.getAs[Double]("score")
      val y = r.getAs[Boolean]("y")
      assert(keep == y, s"doc ${r.getAs[Long]("doc_id")} misclassified (score $score)")
      assert((score >= 0.5) == keep, "keep must be the exact-integer twin of score >= 0.5")
    }
  }

  test("held-out docs from the same vocabularies classify correctly") {
    val model = QualityClassifier.train(labeled, labelCol = "y")
    val holdout = Seq(
      (100L, "prose reads clean here well", true),
      (101L, "qqvvk zzxqj vkqqx xjzzp zzxqj", false))
      .toDF("doc_id", "text", "y")
    val out = QualityClassifier.score(holdout, model)
      .join(holdout.select(col("doc_id"), col("y")), "doc_id")
      .collect()
    out.foreach(r => assert(r.getAs[Boolean]("keep") == r.getAs[Boolean]("y")))
  }

  test("scoring is partitioning-invariant (integer logit, order-free)") {
    val model = QualityClassifier.train(labeled, labelCol = "y")
    val a = QualityClassifier.score(labeled.repartition(1), model)
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    val b = QualityClassifier.score(labeled.repartition(16), model)
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    assert(a == b)
  }

  test("empty/short text scores at the bias alone and stays present") {
    val model = QualityClassifier.train(labeled, labelCol = "y")
    val out = QualityClassifier.score(
        Seq((7L, ""), (8L, "ab")).toDF("doc_id", "text"), model)
      .orderBy("doc_id").collect()
    assert(out.length == 2)
    val expected = 1.0 / (1.0 + math.exp(-(model.biasMicro.toDouble / 1e6)))
    out.foreach { r =>
      assert(math.abs(r.getAs[Double]("score") - expected) < 1e-6)
      assert(r.getAs[Boolean]("keep") == (model.biasMicro >= 0))
    }
  }

  test("keepAt: operating-point threshold is exact and monotone; zero-gram docs drop") {
    val model = QualityClassifier.train(labeled, labelCol = "y")
    val docs = labeled.select("doc_id", "text")
    // theta low enough -> every doc with grams kept; high enough -> none
    val all = QualityClassifier.keepAt(docs, model, Long.MinValue / 4)
    assert(all.filter(col("keep")).count() == docs.count())
    val none = QualityClassifier.keepAt(docs, model, Long.MaxValue / 4)
    assert(none.filter(col("keep")).count() == 0)
    // keep == (dot >= theta * ng) recomputed independently per doc
    val theta = 0L
    val kept = QualityClassifier.keepAt(docs, model, theta)
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    val manual = QualityClassifier.score(docs, model) // score >= 0.5 <=> mean dot >= -bias
    // cross-check against the integer parts via a direct recomputation
    val parts = docs
      .select(col("doc_id"),
        explode_outer(graft.functions.expr.ClassifierFunctions.charGramBuckets(
          graft.functions.TextFunctions.normText(col("text")), model.n, model.dim)).as("b"))
      .groupBy("doc_id")
      .agg(sum(element_at(typedLit(model.weightsMicro.toSeq), col("b") + 1)).as("dot"),
        count(col("b")).as("ng"))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(2) > 0 && r.getLong(1) >= theta * r.getLong(2))).toMap
    assert(kept == parts)
    assert(manual.count() == kept.size) // same doc coverage, no drops
    // zero-gram doc: present with keep = false
    val zg = QualityClassifier.keepAt(
      Seq((9L, "ab")).toDF("doc_id", "text"), model, Long.MinValue / 4)
    assert(zg.collect().map(r => (r.getLong(0), r.getBoolean(1))).toSeq == Seq((9L, false)))
  }

  test("training refuses single-class input") {
    val oneClass = (0 until 5).map(i => (i.toLong, goodText(i), true)).toDF("doc_id", "text", "y")
    intercept[IllegalArgumentException] {
      QualityClassifier.train(oneClass, labelCol = "y")
    }
  }
}
