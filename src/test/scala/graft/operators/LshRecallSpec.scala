package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.Tables

/** Recall of the LSH scale paths against their exact twins.
  *
  * Two regimes are covered:
  *
  *   1. The driver's REAL sf0.01 testdata with the demo parameters the
  *      query sites pass (planes=6, tables=24, radius-1 probe). The
  *      testdata embeddings are near-orthogonal randoms (top pair at
  *      sf0.01: cos ≈ 0.513) — θ ≈ 59°, close to the hyperplane worst
  *      case, where recall costs brute-force-like candidate volume. Both
  *      q25 and q27 are asserted EQUAL to their exact twins on the same
  *      data and parameters the correctness gate runs with, so the gate's
  *      hash-match is not a matter of luck.
  *   2. A planted near-dup corpus at the operator's SHIPPED defaults
  *      (threshold 0.95, planes=16, tables=16, radius-1): recall must be
  *      exact AND the candidate volume must be a small fraction of
  *      all-pairs — the selectivity claim of the scale path, verified,
  *      not assumed.
  */
class LshRecallSpec extends SparkTestBase {

  private val sfDir = "/root/testdata/sf0.01"
  private def haveTestdata = new java.io.File(s"$sfDir/embeddings.parquet").exists()

  test("embedding LSH dedup (q25) returns exactly the exact twin's pairs at sf0.01") {
    assume(haveTestdata)
    val emb = Tables.embeddings(spark, sfDir)
    val exact = Dedup.embeddingNearDupExact(emb, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val lsh = Dedup.embeddingNearDupLsh(emb, threshold = 0.5,
        planes = 6, tables = 24, probeRadius = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(exact.nonEmpty, "testdata should contain at least one pair >= 0.5")
    assert(lsh == exact)
  }

  test("ANN LSH top-k (q27) equals brute-force top-k at sf0.01 (gate data + params)") {
    assume(haveTestdata)
    val emb = Tables.embeddings(spark, sfDir)
    val queries = emb.filter(col("vec_id") < 10)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("rank"),
        r.getAs[Long]("neighbor_id"))).toSet
    val exact = rows(Ann.bruteForceTopK(emb, queries, k = 5))
    val lsh = rows(Ann.lshTopK(emb, queries, k = 5,
      planes = 6, tables = 24, probeRadius = 1))
    assert(exact.nonEmpty)
    assert(lsh == exact, "q27's demo parameters must reproduce the exact top-k verbatim")
  }

  test("shipped defaults: exact recall AND real selectivity on planted cos>=0.95 near-dups") {
    import spark.implicits._
    val dim = 64
    val n = 400
    val planted = 5
    val rnd = new scala.util.Random(7L)
    def randVec(): Array[Float] = Array.fill(dim)((rnd.nextDouble() * 2 - 1).toFloat)
    // background: random dim-64 vectors (pairwise |cos| ~ 1/8, far below
    // 0.95); planted: id n+2i ~ id n+2i+1 = same vector + 20% orthogonal
    // noise -> cos ≈ 0.98
    val base = (0L until n.toLong).map(i => (i, randVec()))
    val dups = (0 until planted).flatMap { i =>
      val a = randVec()
      val b = a.zip(randVec()).map { case (x, e) => x + 0.2f * e }
      Seq((n + 2L * i, a), (n + 2L * i + 1, b))
    }
    val emb = (base ++ dups).toDF("vec_id", "embedding")

    val exact = Dedup.embeddingNearDupExact(emb, threshold = 0.95)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.size == planted, s"plant should yield exactly $planted qualifying pairs")

    val lsh = Dedup.embeddingNearDupLsh(emb, threshold = 0.95)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh == exact, "defaults must recall every planted pair")

    // selectivity: candidate pairs actually scored (bucket collisions
    // before the cosine filter) must be a small fraction of all-pairs
    val v = emb.select(col("vec_id").as("id"), col("embedding").as("vec"))
    val candidates = Ann.withBuckets(v, "vec", planes = 16, tables = 16, dim = dim,
        seed = 42L, probeRadius = 1).as("a")
      .join(Ann.withBuckets(v, "vec", planes = 16, tables = 16, dim = dim, seed = 42L).as("b"),
        col("a.table") === col("b.table") && col("a.bucket") === col("b.bucket") &&
          col("a.id") < col("b.id"))
      .select(col("a.id"), col("b.id")).distinct().count()
    val allPairs = (n + 2 * planted).toLong * (n + 2 * planted - 1) / 2
    info(f"candidates $candidates / all-pairs $allPairs = ${candidates.toDouble / allPairs}%.4f")
    assert(candidates < allPairs / 10,
      s"scale path must score <10% of all-pairs, got $candidates/$allPairs")
  }
}
