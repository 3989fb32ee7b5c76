package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class AnnSpec extends SparkTestBase {
  import spark.implicits._

  // orthonormal-ish corpus with one planted near neighbor of vector 0
  lazy val emb = Seq(
    (0L, Array(1.0f, 0.0f, 0.0f, 0.0f)),
    (1L, Array(0.9f, 0.1f, 0.0f, 0.0f)),
    (2L, Array(0.5f, 0.5f, 0.0f, 0.0f)),
    (3L, Array(0.0f, 1.0f, 0.0f, 0.0f)),
    (4L, Array(0.0f, 0.0f, 1.0f, 0.0f)),
    (5L, Array(-1.0f, 0.0f, 0.0f, 0.0f))
  ).toDF("vec_id", "embedding")

  test("bruteForceTopK ranks by cosine desc with id tie-break") {
    val res = Ann.bruteForceTopK(emb, emb.filter($"vec_id" === 0L), k = 3)
      .orderBy("rank").collect()
      .map(r => (r.getAs[Long]("rank"), r.getAs[Long]("neighbor_id")))
    assert(res.toSeq == Seq((1L, 1L), (2L, 2L), (3L, 3L)))
  }

  test("bruteForceTopK excludes self and respects k") {
    val res = Ann.bruteForceTopK(emb, emb.filter($"vec_id" < 2), k = 2).collect()
    assert(res.length == 4)
    assert(!res.exists(r => r.getAs[Long]("query_id") == r.getAs[Long]("neighbor_id")))
  }

  test("lshTopK finds the planted near neighbor for its query") {
    val res = Ann.lshTopK(emb, emb.filter($"vec_id" === 0L), k = 1,
        planes = 4, tables = 8, dim = 4)
      .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id")))
    assert(res.toSeq == Seq((0L, 1L))) // same-direction vector shares all buckets
  }

  test("cosine kernel matches a reference fold exactly") {
    import graft.functions.expr.VectorFunctions.cosineSim
    val df = emb.as("a").join(emb.as("b"), $"a.vec_id" < $"b.vec_id")
      .select($"a.vec_id", $"b.vec_id",
        cosineSim($"a.embedding", $"b.embedding").as("cos"))
    val r = df.filter($"a.vec_id" === 0L && $"b.vec_id" === 2L).head().getDouble(2)
    assert(math.abs(r - 0.5 / math.sqrt(0.5)) < 1e-12)
  }
}
