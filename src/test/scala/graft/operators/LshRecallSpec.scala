package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.Tables

/** Recall of the LSH scale paths against their exact twins on the REAL
  * sf0.001/sf0.01 testdata — the same data and default parameters the
  * driver's correctness gate (Verify + DuckDB oracle) runs with, so a
  * green here means the gate's hash-match is not a matter of luck.
  *
  * The testdata embeddings are near-orthogonal randoms (top pair at
  * sf0.01: cos ≈ 0.513, background ≈ 0), i.e. the qualifying pairs sit at
  * θ ≈ 59° — close to the worst case for hyperplane LSH. The shipped
  * defaults (planes=6, tables=24, radius-1 multi-probe) put the per-pair
  * miss probability at ~2e-5 even there; see [[Dedup.embeddingNearDupLsh]].
  */
class LshRecallSpec extends SparkTestBase {

  private val sfDir = "/root/testdata/sf0.01"
  private def haveTestdata = new java.io.File(s"$sfDir/embeddings.parquet").exists()

  test("embedding LSH dedup (q25) returns exactly the exact twin's pairs at sf0.01") {
    assume(haveTestdata)
    val emb = Tables.embeddings(spark, sfDir)
    val exact = Dedup.embeddingNearDupExact(emb, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val lsh = Dedup.embeddingNearDupLsh(emb, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(exact.nonEmpty, "testdata should contain at least one pair >= 0.5")
    assert(lsh == exact)
  }

  test("ANN LSH top-k (q27) recall@5 >= 0.9 vs brute force at sf0.01") {
    assume(haveTestdata)
    val emb = Tables.embeddings(spark, sfDir)
    val queries = emb.filter(col("vec_id") < 10)
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val exact = pairs(Ann.bruteForceTopK(emb, queries, k = 5))
    val lsh = pairs(Ann.lshTopK(emb, queries, k = 5))
    val recall = (exact & lsh).size.toDouble / exact.size
    info(f"recall@5 = $recall%.3f (${(exact & lsh).size}/${exact.size})")
    assert(recall >= 0.9)
  }
}
