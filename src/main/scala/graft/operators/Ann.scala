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
    */
  private[operators] def withBuckets(
      df: DataFrame, vecCol: String, planes: Int, tables: Int,
      dim: Int, seed: Long): DataFrame =
    (0 until tables).map { t =>
      df.withColumn("table", lit(t))
        .withColumn("bucket", signature(col(vecCol), hyperplanes(planes, dim, seed, t)))
    }.reduce(_ unionByName _)

  /** Exact top-k cosine neighbors for each query vector. `queries` must be
    * small enough to broadcast (it is the user's query batch); the corpus
    * is never shuffled, only the (queries x k) result is.
    */
  def bruteForceTopK(
      corpus: DataFrame, queries: DataFrame, k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cvec"))
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
    * sharing a bucket in at least one table. Recall@k rises with `tables`;
    * cost per query is the mean bucket population times `tables`.
    */
  def lshTopK(
      corpus: DataFrame, queries: DataFrame, k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding",
      planes: Int = 8, tables: Int = 4, dim: Int = 64, seed: Long = 42L): DataFrame = {
    val c = withBuckets(
      corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cvec")), "cvec",
      planes, tables, dim, seed)
    val q = withBuckets(
      queries.select(col(idCol).as("query_id"), col(vecCol).as("qvec")), "qvec",
      planes, tables, dim, seed)
    val candidates = c.join(broadcast(q),
        c("table") === q("table") && c("bucket") === q("bucket") &&
          col("query_id") =!= col("neighbor_id"))
      .select("query_id", "qvec", "neighbor_id", "cvec")
      .distinct()
    val w = Window.partitionBy("query_id").orderBy(col("cosine").desc, col("neighbor_id"))
    candidates
      .withColumn("cosine", cosineSim(col("qvec"), col("cvec")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank").cast("long").as("rank"),
        col("neighbor_id"), round(col("cosine"), 6).as("cosine"))
  }
}
