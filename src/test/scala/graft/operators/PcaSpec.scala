package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class PcaSpec extends SparkTestBase {
  import spark.implicits._

  private val dim = 8

  /** Deterministic corpus with planted variance structure: axis 0
    * carries the largest spread, axis 1 the second, the rest tiny.
    */
  private lazy val planted = (0 until 200).map { i =>
    val v = new Array[Float](dim)
    v(0) = ((i % 11) - 5).toFloat * 3f + 1f   // dominant axis, mean 1
    v(1) = ((i % 7) - 3).toFloat * 1f - 2f    // second axis, mean -2
    v(2) = ((i % 3) - 1).toFloat * 0.05f      // noise
    (i.toLong, v.toSeq)
  }.toDF("vec_id", "embedding")

  test("recovers planted principal axes in variance order, sign-deterministic") {
    val m = Pca.train(planted, k = 2)
    assert(m.eigenvalues(0) > m.eigenvalues(1))
    // dominant component aligns with e0, second with e1; the sign
    // convention makes the largest-|coordinate| entry positive
    assert(math.abs(m.components(0)(0)) > 0.999f)
    assert(m.components(0)(0) > 0)
    assert(math.abs(m.components(1)(1)) > 0.999f)
    assert(m.components(1)(1) > 0)
  }

  test("projection == driver reference fold, invariant to input partitioning") {
    val m = Pca.train(planted, k = 3)
    def collectProj(parts: Int): Seq[(Long, Seq[Double])] =
      Pca.project(planted.repartition(parts), m)
        .orderBy("vec_id").collect()
        .map(r => (r.getLong(0), (1 to 3).map(j => r.getDouble(j)).toSeq)).toSeq
    val p1 = collectProj(1)
    val p16 = collectProj(16)
    assert(p1 == p16, "projection must be map-side deterministic")
    // reference: same fold — double accumulation of float products,
    // minus the model's constant, rounded 6dp
    val vecs = planted.collect().map(r => (r.getLong(0), r.getSeq[Float](1).toArray)).toMap
    val ref = p1.map { case (id, _) =>
      val v = vecs(id)
      (id, m.components.indices.map { j =>
        var s = 0.0
        var i = 0
        while (i < dim) { s += v(i).toDouble * m.components(j)(i).toDouble; i += 1 }
        math.rint((s - m.meanConsts(j)) * 1e6) / 1e6
      }.toSeq)
    }
    assert(p1 == ref)
  }

  test("dominant-axis projection separates the planted spread; reconstruction improves with k") {
    val m = Pca.train(planted, k = 2)
    val p = Pca.project(planted, m).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    // p0 spans the +-15 spread of axis 0; p1 the +-3 of axis 1
    val span0 = p.map(_._2).max - p.map(_._2).min
    val span1 = p.map(_._3).max - p.map(_._3).min
    assert(span0 > 25 && span0 < 35, s"span0 $span0")
    assert(span1 > 5 && span1 < 8, s"span1 $span1")
  }

  test("save/load round-trips the model exactly") {
    val m = Pca.train(planted, k = 2)
    val dir = java.nio.file.Files.createTempDirectory("pca-model").toString
    Pca.save(spark, m, dir)
    val back = Pca.load(spark, dir)
    assert(back.mean.toSeq == m.mean.toSeq)
    assert(back.components.map(_.toSeq).toSeq == m.components.map(_.toSeq).toSeq)
    assert(back.eigenvalues.toSeq == m.eigenvalues.toSeq)
    assert(back.meanConsts.toSeq == m.meanConsts.toSeq)
  }
}
