package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.expr.VectorFunctions.{cosineSim, nearestCells}

/** IVF (inverted-file) approximate-nearest-neighbor search — the
  * clustered-corpus counterpart of [[Ann.lshTopK]] (SURVEY §7.5
  * "similarity search": brute-force baseline, LSH scale path, IVF scale
  * path).
  *
  * The corpus is partitioned into `nlist` Voronoi cells around unit-norm
  * centroids learned with a few deterministic spherical-k-means (Lloyd)
  * iterations; a query scores only the cells whose centroids are among
  * its `nprobe` nearest. On genuinely clustered embedding corpora (the
  * realistic case for model-training data) the quantizer aligns cells
  * with clusters, so recall is high at `nprobe ≪ nlist` — cost per query
  * is ~`nprobe/nlist` of the corpus vs LSH's table-sum, with no
  * per-table signature computation on the corpus side. On structureless
  * (near-uniform) corpora IVF degrades gracefully to scanning
  * `nprobe/nlist` of the data with correspondingly partial recall —
  * prefer LSH there.
  *
  * Scale notes:
  *   - Training runs driver-coordinated Lloyd steps; each step is one
  *     distributed aggregation whose RESULT (nlist x dim running sums) is
  *     collected — bounded by the centroid matrix size, never the data.
  *     At 100 TB, train on a deterministic sample (`sampleOneIn`), the
  *     standard IVF practice — the quantizer needs cluster shape, not
  *     every row.
  *   - The search never shuffles the corpus: cell ids are a projection,
  *     the probed query set is broadcast, and per-query top-k is a window
  *     over (queries x candidates) only. A persisted deployment would
  *     write the corpus bucketed by `cell` so probes prune files at scan
  *     time.
  */
object Ivf {

  /** Unit-normalize in place; zero vectors stay zero. */
  private def normalize(v: Array[Float]): Array[Float] = {
    var s = 0.0
    var i = 0
    while (i < v.length) { s += v(i).toDouble * v(i).toDouble; i += 1 }
    val n = math.sqrt(s)
    if (n == 0.0) v else v.map(x => (x / n).toFloat)
  }

  /** Spherical k-means coarse quantizer: `nlist` unit centroids.
    *
    * Deterministic: seeds are the `nlist` corpus vectors with the
    * smallest xxhash64(id, seed) (a seeded uniform draw reproducible
    * across runs and cluster layouts), and each Lloyd step reassigns by
    * max-dot and recomputes per-cell means via one (cell, dim) partial
    * aggregation. Cells that lose all members keep their previous
    * centroid. `sampleOneIn` > 1 trains on the deterministic id-hash
    * subsample — pass corpus size / ~1M at real scale.
    */
  def trainCentroids(
      corpus: DataFrame, idCol: String = "vec_id", vecCol: String = "embedding",
      nlist: Int = 16, iters: Int = 3, seed: Long = 42L,
      sampleOneIn: Int = 1): Array[Array[Float]] = {
    val sample =
      if (sampleOneIn <= 1) corpus
      else corpus.filter(pmod(xxhash64(col(idCol), lit(seed)), lit(sampleOneIn)) === 0)
    val train = sample.select(col(idCol).as("id"), col(vecCol).as("vec"))
    var cents: Array[Array[Float]] = train
      .orderBy(xxhash64(col("id"), lit(seed)))
      .limit(nlist)
      .collect()
      .map(r => normalize(r.getSeq[Float](1).toArray))
    var it = 0
    while (it < iters) {
      // one aggregation per step: per-(cell, dim) sums — the collected
      // result is nlist x dim rows, independent of corpus size
      val sums = train
        .select(element_at(nearestCells(col("vec"), cents, 1), 1).as("cell"),
          posexplode(col("vec")).as(Seq("pos", "x")))
        .groupBy("cell", "pos")
        .agg(sum(col("x")).as("s"), count(lit(1)).as("n"))
        .collect()
      val next = cents.map(_.clone())
      sums.groupBy(_.getInt(0)).foreach { case (cell, rows) =>
        val dim = cents(cell).length
        val mean = new Array[Float](dim)
        rows.foreach { r =>
          val pos = r.getInt(1) // posexplode positions are 0-based
          if (pos < dim) mean(pos) = (r.getDouble(2) / r.getLong(3)).toFloat
        }
        next(cell) = normalize(mean)
      }
      cents = next
      it += 1
    }
    cents
  }

  /** Persist an IVF index: the corpus written as parquet PARTITIONED BY
    * its Voronoi cell, plus the centroid matrix (one row per centroid)
    * alongside it. A search against the index reads only the probed
    * cells' directories — partition pruning at the file listing level,
    * the on-disk analogue of probing `nprobe/nlist` of the corpus. This
    * is the deployment shape for a static 100 TB corpus serving many
    * query batches: quantizer cost is paid once at build time.
    */
  def writeIndex(
      corpus: DataFrame, dir: String,
      idCol: String = "vec_id", vecCol: String = "embedding",
      nlist: Int = 16, iters: Int = 3, seed: Long = 42L,
      sampleOneIn: Int = 1): Unit = {
    val spark = corpus.sparkSession
    val cents = trainCentroids(corpus, idCol, vecCol, nlist, iters, seed, sampleOneIn)
    corpus
      .withColumn("cell", element_at(nearestCells(col(vecCol), cents, 1), 1))
      .write.mode("overwrite").partitionBy("cell").parquet(s"$dir/corpus")
    import spark.implicits._
    cents.zipWithIndex.map { case (c, i) => (i, c.toSeq) }.toSeq
      .toDF("cell", "centroid")
      .repartition(1).write.mode("overwrite").parquet(s"$dir/centroids")
  }

  /** Top-k against a [[writeIndex]] directory: probe cells come from the
    * stored centroids, and the union of probed cells is pushed as a
    * STATIC `cell IN (...)` filter on the partition column, so unprobed
    * cell directories never enter the scan's file listing. (The probe
    * set is collected on the driver — it is at most queries × nprobe
    * smallints, and the centroid matrix is already driver-resident.)
    */
  def searchIndex(
      spark: org.apache.spark.sql.SparkSession, dir: String,
      queries: DataFrame, k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding",
      nprobe: Int = 4): DataFrame = {
    val cents = spark.read.parquet(s"$dir/centroids")
      .orderBy("cell").collect()
      .map(_.getSeq[Float](1).toArray)
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qvec"))
      .withColumn("cell", explode(nearestCells(col("qvec"), cents, nprobe)))
    val probed = q.select("cell").distinct().collect().map(_.getInt(0)).sorted
    // ScaleOut AFTER the partition filter (pruning happens at file
    // listing; the widen only spreads what survives): per-candidate
    // cosine scoring runs in the streamed corpus partitions, which for a
    // few probed cell files would otherwise serialize on 1-2 cores —
    // the q78 under-split class. No-op at scale (probed cells are many
    // splits); the in-memory twin ivfTopK already widens its corpus.
    val c = ScaleOut(spark.read.parquet(s"$dir/corpus")
        .filter(col("cell").isin(probed.map(Int.box): _*)))
      .select(col(idCol).as("neighbor_id"), col(vecCol).as("cvec"), col("cell"))
    cellTopK(c, q, k)
  }

  /** IVF top-k: train the quantizer, assign each corpus row to its ONE
    * nearest cell, probe each query's `nprobe` nearest cells, exact
    * cosine within probed cells, per-query top-k. Corpus rows live in
    * exactly one cell, so (query, neighbor) candidates are already
    * distinct — no dedup shuffle.
    */
  def ivfTopK(
      corpus: DataFrame, queries: DataFrame, k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding",
      nlist: Int = 16, nprobe: Int = 4, iters: Int = 3, seed: Long = 42L,
      sampleOneIn: Int = 1): DataFrame = {
    val cents = trainCentroids(corpus, idCol, vecCol, nlist, iters, seed, sampleOneIn)
    ivfTopKWithCentroids(corpus, queries, k, cents, idCol, vecCol, nprobe)
  }

  /** [[ivfTopK]] with a caller-supplied quantizer. Distributed float
    * aggregation does not promise a bit-identical sum fold across
    * sessions, so a caller that needs the EXACT centroids the search used
    * (e.g. a generated oracle) trains once via [[trainCentroids]] and
    * feeds the same matrix to both the search and the replay — rather
    * than hoping two trainings agree to the last bit (r9 advice).
    */
  def ivfTopKWithCentroids(
      corpus: DataFrame, queries: DataFrame, k: Int,
      cents: Array[Array[Float]],
      idCol: String = "vec_id", vecCol: String = "embedding",
      nprobe: Int = 4): DataFrame = {
    val c = ScaleOut(corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cvec")))
      .withColumn("cell", element_at(nearestCells(col("cvec"), cents, 1), 1))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qvec"))
      .withColumn("cell", explode(nearestCells(col("qvec"), cents, nprobe)))
    cellTopK(c, q, k)
  }

  /** Shared search tail for the in-memory and persisted-index paths:
    * probed-cell broadcast join, exact cosine, per-query top-k. One
    * definition so the two paths cannot silently diverge (IvfSpec asserts
    * them equal).
    */
  private def cellTopK(c: DataFrame, q: DataFrame, k: Int): DataFrame = {
    val candidates = c.join(broadcast(q),
        c("cell") === q("cell") && col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        cosineSim(col("qvec"), col("cvec")).as("cosine"))
    TopK.perQuery(candidates, k)
  }
}
