package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.expr.VectorFunctions.{cosineSim, dotProduct}

/** Approximate-nearest-neighbor search over an `array<float>` embedding
  * column.
  *
  *   - [[bruteForceTopK]]: exact baseline — broadcast the (small) query
  *     set against the corpus, codegen'd cosine kernel, per-query top-k
  *     via a partitioned window. Corpus-side work is embarrassingly
  *     parallel and shuffle-free until the final per-query k rows.
  *   - [[lshTopK]]: scale path — random-hyperplane signatures bucket the
  *     corpus into 2^planes cells per table; queries only score their own
  *     buckets. Recall is tuned with `tables` (independent hash tables).
  */
object Ann {

  /** Deterministic unit-free random hyperplanes from `seed` (splitmix64
    * stream mapped to [-1,1)) — reproducible across runs and engines.
    */
  private[operators] def hyperplanes(planes: Int, dim: Int, seed: Long, table: Int): Seq[Seq[Float]] = {
    var s = seed + 0x632be59bd9b4e019L * (table + 1)
    def next(): Long = {
      s += 0x9e3779b97f4a7c15L
      graft.functions.expr.TextHashOps.fmix64(s)
    }
    Seq.fill(planes)(Seq.fill(dim)(((next() >>> 11).toDouble / (1L << 53).toDouble * 2.0 - 1.0).toFloat))
  }

  /** sign-bit signature: bucket id = sum of (dot(vec, plane_p) > 0) << p. */
  private def signature(vec: Column, planes: Seq[Seq[Float]]): Column =
    planes.zipWithIndex.map { case (p, i) =>
      when(dotProduct(vec, typedlit(p)) > 0.0, lit(1L << i)).otherwise(0L)
    }.reduce(_ + _)

  /** Attach (table, bucket) rows for each vector: one output row per hash
    * table. `df` must carry a column `vecCol` of array<float>.
    *
    * With `probeRadius = 1` (multi-probe LSH), each row additionally
    * emits one bucket per signature bit flipped, so joining probed rows
    * against base rows pairs every two vectors whose signatures are
    * within Hamming distance 1 in at least one table — a large recall
    * boost at the cost of `planes` extra rows per (row, table), without
    * touching the number of tables. Probe only ONE side of a join.
    */
  private[operators] def withBuckets(
      df: DataFrame, vecCol: String, planes: Int, tables: Int,
      dim: Int, seed: Long, probeRadius: Int = 0): DataFrame = {
    require(probeRadius >= 0 && probeRadius <= 1, "only probeRadius 0 or 1 supported")
    (0 until tables).map { t =>
      val sig = df.withColumn("table", lit(t))
        .withColumn("sig", signature(col(vecCol), hyperplanes(planes, dim, seed, t)))
      val bucketed =
        if (probeRadius == 0) sig.withColumn("bucket", col("sig"))
        else sig
          .withColumn("probe",
            explode(array((lit(-1) +: (0 until planes).map(lit(_))): _*)))
          .withColumn("bucket",
            when(col("probe") < 0, col("sig"))
              .otherwise(col("sig").bitwiseXOR(expr("shiftleft(CAST(1 AS BIGINT), probe)"))))
          .drop("probe")
      bucketed.drop("sig")
    }.reduce(_ unionByName _)
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
    val w = Window.partitionBy("query_id").orderBy(col("cosine").desc, col("neighbor_id"))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank").cast("long").as("rank"),
        col("neighbor_id"), round(col("cosine"), 6).as("cosine"))
  }

  /** LSH-bucketed approximate top-k: queries score only the corpus rows
    * sharing a bucket (or a radius-1 probe bucket) in at least one table.
    * Recall@k rises with `tables` and multi-probe; cost per query is the
    * mean bucket population times `tables`.
    *
    * Parameter guidance: per-bit collision probability for two vectors at
    * angle θ is 1 − θ/π, so selectivity is the gap between that value for
    * true neighbors vs the background. On data whose nearest neighbors sit
    * near cos ≈ 0.4 (θ ≈ 66°) — like the synthetic near-orthogonal
    * testdata — the gap is small and defaults must favor recall
    * (few planes, many tables, probing). Real embedding corpora with
    * neighbors at cos ≥ 0.8 can raise `planes` for exponentially better
    * pruning.
    */
  def lshTopK(
      corpus: DataFrame, queries: DataFrame, k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding",
      planes: Int = 6, tables: Int = 24, dim: Int = 64, seed: Long = 42L,
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
    val w = Window.partitionBy("query_id").orderBy(col("cosine").desc, col("neighbor_id"))
    candidates
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank").cast("long").as("rank"),
        col("neighbor_id"), round(col("cosine"), 6).as("cosine"))
  }
}
