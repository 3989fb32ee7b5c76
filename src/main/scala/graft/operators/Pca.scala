package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Embedding dimensionality reduction by PCA — the embedding-space
  * preprocessing step of semantic-dedup/clustering pipelines (SemDeDup-
  * class systems reduce before k-means; OPQ-style ANN pipelines rotate
  * codes the same way): learn the top-k principal axes of the corpus
  * embedding distribution once, project every vector onto them.
  *
  * Training is the codebook contract ([[Pq.trainCodebooks]]'s family):
  * two `treeAggregate` passes over the vector column — sums for the
  * mean, then centered outer products for the covariance — and only
  * dim + dim² doubles ever reach the driver, where the dim×dim
  * eigendecomposition (breeze `eigSym`, shipped with Spark) is O(dim³)
  * driver work on a 64×64 matrix. Eigenvectors get a DETERMINISTIC sign
  * convention (the largest-|coordinate| entry made positive, first
  * index on ties) so a stored model is reproducible run to run;
  * components quantize to Float for storage, the precision the input
  * vectors carry anyway.
  *
  * Projection is scan-shaped and shuffle-free: component j's score is
  * `dot(vec, comp_j) - dot(mean, comp_j)` — algebraically the centered
  * projection, computed in exactly this form so the per-component
  * constant folds into a plan literal and the per-row work is k
  * codegen'd [[graft.functions.expr.VectorFunctions.dotProduct]] kernels
  * (sequential double accumulation, the LIST_DOT_PRODUCT-replayable
  * fold the cosine family already pins). No UDF, no higher-order
  * function, nothing leaves whole-stage codegen.
  *
  * The model STAGES per corpus state (train-once/project-many): like
  * every learned operator here, the oracle is GENERATED from the staged
  * literals (components and constants), verifying the projection
  * algebra bit-exactly rather than pretending eigenvectors of floating
  * sums are themselves cross-engine reproducible.
  */
object Pca {

  /** `components` in descending-eigenvalue order, row i = axis i. */
  final case class Model(
      mean: Array[Double], components: Array[Array[Float]],
      eigenvalues: Array[Double]) {
    def k: Int = components.length
    def dim: Int = mean.length
    /** dot(mean, comp_j) in the kernel's fold (float comps, double acc). */
    lazy val meanConsts: Array[Double] = components.map { c =>
      var s = 0.0
      var i = 0
      while (i < c.length) { s += mean(i) * c(i).toDouble; i += 1 }
      s
    }
  }

  def train(
      vectors: DataFrame, k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): Model = {
    // two aggregate passes (mean, then mean-centered covariance) read
    // `rows` — persist so the parquet scan + row decode run once, not
    // per pass; freed before the driver-side eigendecomposition
    val rows = vectors.select(col(vecCol)).rdd
      .map(_.getSeq[Float](0).toArray)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val (sum, n) = rows.treeAggregate((null: Array[Double], 0L))(
      seqOp = { case ((acc, c), v) =>
        val a = if (acc == null) new Array[Double](v.length) else acc
        var i = 0
        while (i < v.length) { a(i) += v(i).toDouble; i += 1 }
        (a, c + 1)
      },
      combOp = {
        case ((null, _), r) => r
        case (l, (null, _)) => l
        case ((a, ca), (b, cb)) =>
          var i = 0
          while (i < a.length) { a(i) += b(i); i += 1 }
          (a, ca + cb)
      })
    require(n > 0, "PCA training needs at least one vector")
    val dim = sum.length
    require(k >= 1 && k <= dim, s"k must be in [1, $dim]")
    val mean = sum.map(_ / n)
    val cov = rows.treeAggregate(null: Array[Double])(
      seqOp = { (acc, v) =>
        val a = if (acc == null) new Array[Double](dim * dim) else acc
        val d = new Array[Double](dim)
        var i = 0
        while (i < dim) { d(i) = v(i).toDouble - mean(i); i += 1 }
        i = 0
        while (i < dim) {
          var j = 0
          val di = d(i)
          while (j < dim) { a(i * dim + j) += di * d(j); j += 1 }
          i += 1
        }
        a
      },
      combOp = {
        case (null, r) => r
        case (l, null) => l
        case (a, b) =>
          var i = 0
          while (i < a.length) { a(i) += b(i); i += 1 }
          a
      })
    rows.unpersist(blocking = false)
    val m = breeze.linalg.DenseMatrix.create(dim, dim, cov.map(_ / n))
    val es = breeze.linalg.eigSym(m)
    // eigSym: ascending eigenvalues — take the top k, descending
    val order = (0 until dim).sortBy(i => -es.eigenvalues(i)).take(k)
    val comps = order.map { c =>
      val v = Array.tabulate(dim)(r => es.eigenvectors(r, c))
      // deterministic sign: the largest-|coordinate| entry positive
      var best = 0
      var i = 1
      while (i < dim) {
        if (math.abs(v(i)) > math.abs(v(best))) best = i
        i += 1
      }
      val flip = if (v(best) < 0) -1.0 else 1.0
      v.map(x => (x * flip).toFloat)
    }.toArray
    Model(mean, comps, order.map(es.eigenvalues(_)).toArray)
  }

  /** Project `vectors` onto the model's axes: (idCol, p0..p{k-1}),
    * each score rounded to 6 dp. Map-side only — k dot-product kernels
    * per row, constants as plan literals, zero shuffle.
    */
  def project(
      vectors: DataFrame, model: Model,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val cols: Seq[Column] = model.components.zipWithIndex.map { case (c, j) =>
      round(
        graft.functions.expr.VectorFunctions.dotProduct(
          col(vecCol), typedlit(c.toSeq)) - lit(model.meanConsts(j)),
        6).as(s"p$j")
    }.toSeq
    vectors.select(col(idCol) +: cols: _*)
  }

  /** Persist (components + mean + eigenvalues; meta LAST as the
    * completion marker — the staging contract).
    */
  def save(spark: SparkSession, model: Model, dir: String): Unit = {
    import spark.implicits._
    model.components.zipWithIndex.toSeq
      .map { case (c, j) => (j, c.toSeq) }
      .toDF("j", "comp")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/components")
    model.mean.toSeq.zipWithIndex.map { case (v, i) => (i, v) }
      .toDF("i", "m")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/mean")
    model.eigenvalues.toSeq.zipWithIndex.map { case (v, j) => (j, v) }
      .toDF("j", "ev")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/meta")
  }

  def load(spark: SparkSession, dir: String): Model = {
    val comps = spark.read.parquet(s"$dir/components").collect()
      .map(r => (r.getAs[Int]("j"), r.getSeq[Float](1).toArray))
      .sortBy(_._1).map(_._2)
    val mean = spark.read.parquet(s"$dir/mean").collect()
      .map(r => (r.getAs[Int]("i"), r.getAs[Double]("m")))
      .sortBy(_._1).map(_._2)
    val evs = spark.read.parquet(s"$dir/meta").collect()
      .map(r => (r.getAs[Int]("j"), r.getAs[Double]("ev")))
      .sortBy(_._1).map(_._2)
    Model(mean, comps, evs)
  }
}
