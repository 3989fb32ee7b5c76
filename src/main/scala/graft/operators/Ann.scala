package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.expr.VectorFunctions.{bucketProbes, cosineSim, hyperplaneSigs}

/** Approximate-nearest-neighbor search over an `array<float>` embedding
  * column.
  *
  *   - [[bruteForceTopK]]: exact baseline — broadcast the (small) query
  *     set against the corpus, codegen'd cosine kernel, per-query top-k
  *     via a partitioned window. Corpus-side work is embarrassingly
  *     parallel and shuffle-free until the final per-query k rows.
  *   - [[lshTopK]]: scale path — random-hyperplane signatures bucket the
  *     corpus into 2^planes cells per table; queries only score their own
  *     buckets. Recall is tuned with `tables` (independent hash tables)
  *     and radius-1 multi-probe on the query side.
  *
  * Parameter math (shared with [[Dedup.embeddingNearDupLsh]]): two vectors
  * at angle θ agree on one hyperplane bit with probability p = 1 − θ/π.
  * With P planes, T tables and radius-1 probing on ONE side, a pair
  * collides in a given table with q = p^P + P(1−p)p^(P−1) and is missed
  * with (1−q)^T. The shipped defaults (P=16, T=16, radius 1) target the
  * realistic near-dup / near-neighbor regime cos ≥ 0.95 (θ ≤ 18°,
  * p ≥ 0.90): q ≈ 0.51, miss ≈ 0.49^16 ≈ 1e-5 at the boundary and falls
  * exponentially above it, while orthogonal background pairs (p = 1/2)
  * collide with only T(1+P)/2^P = 16·17/65536 ≈ 0.4% — ~240× fewer
  * scorings than all-pairs. LSH wins exactly when 2^planes ≫
  * tables × (1+planes); conversely, at cos ≈ 0.5 (θ = 60°, the hyperplane
  * worst case: ρ = ln(1/p₁)/ln(1/p₀) = ln1.5/ln2 ≈ 0.585) near-certain
  * recall forces candidate volume ≈ all-pairs no matter the parameters —
  * callers needing a recall demo at that angle must pass few-planes/
  * many-tables explicitly and accept brute-force-like cost.
  */
object Ann {

  /** Attach (table, bucket) rows for each vector, ALL tables from one
    * projection: [[hyperplaneSigs]] computes the per-table signature array
    * in a single codegen'd pass (hyperplanes cached per JVM, not inlined
    * as plan literals), one `posexplode` fans out the tables, and radius-1
    * probing is a second explode over the `planes` single-bit flips. One
    * scan, one pipeline — not a tables-way union.
    *
    * With `probeRadius = 1` (multi-probe LSH), joining probed rows against
    * base rows pairs every two vectors whose signatures are within Hamming
    * distance 1 in at least one table. Probe only ONE side of a join.
    */
  private[operators] def withBuckets(
      df: DataFrame, vecCol: String, planes: Int, tables: Int,
      dim: Int, seed: Long, probeRadius: Int = 0): DataFrame = {
    require(probeRadius >= 0 && probeRadius <= 1, "only probeRadius 0 or 1 supported")
    val keep = df.columns.map(col)
    val sigRows = df
      .withColumn("sigs", hyperplaneSigs(col(vecCol), planes, tables, dim, seed))
      .select(keep :+ posexplode(col("sigs")).as(Seq("table", "sig")): _*)
    val bucketed =
      if (probeRadius == 0) sigRows.withColumn("bucket", col("sig"))
      else sigRows.withColumn("bucket", explode(bucketProbes(col("sig"), planes)))
    bucketed.drop("sig")
  }

  /** Exact top-k cosine neighbors for each query vector. `queries` must be
    * small enough to broadcast (it is the user's query batch); the corpus
    * is never shuffled, only the (queries x k) result is.
    */
  def bruteForceTopK(
      corpus: DataFrame, queries: DataFrame, k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val c = ScaleOut(corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cvec")))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qvec"))
    val scored = c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", cosineSim(col("qvec"), col("cvec")))
    TopK.perQuery(scored, k)
  }

  /** LSH-bucketed approximate top-k: queries score only the corpus rows
    * sharing a bucket (or a radius-1 probe bucket) in at least one table.
    * Recall@k rises with `tables` and multi-probe; cost per query is the
    * mean bucket population times `tables`. See the object doc for the
    * (planes, tables, probeRadius) recall/selectivity math.
    */
  def lshTopK(
      corpus: DataFrame, queries: DataFrame, k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding",
      planes: Int = 16, tables: Int = 16, dim: Int = 64, seed: Long = 42L,
      probeRadius: Int = 1): DataFrame = {
    val c = withBuckets(
      ScaleOut(corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cvec"))), "cvec",
      planes, tables, dim, seed)
    // probe the (small) query side only: one side probed is enough to pair
    // any (q, c) whose signatures differ by <= probeRadius bits.
    val q = withBuckets(
      queries.select(col(idCol).as("query_id"), col(vecCol).as("qvec")), "qvec",
      planes, tables, dim, seed, probeRadius)
    // score IN the join stage, then dedupe the scalar triple: re-scoring a
    // pair once per colliding table/probe costs a 64-float dot product,
    // far cheaper than shuffling both vectors through a distinct
    val candidates = c.join(broadcast(q),
        c("table") === q("table") && c("bucket") === q("bucket") &&
          col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        cosineSim(col("qvec"), col("cvec")).as("cosine"))
      .distinct()
    TopK.perQuery(candidates, k)
  }
}
