package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Data-mixture resampling: re-weight a corpus by group (source/domain)
  * for training, where a weight w means "each document of this group
  * appears ⌊w⌋ or ⌈w⌉ times, deterministically, with group-mean w" —
  * the mixture/epochs step of a pretraining pipeline (down-sample noisy
  * crawl, up-sample books/wiki), expressed as data so the training
  * reader needs no weighting logic.
  *
  * Determinism and portability: the fractional copy is decided by the
  * first two hex chars of md5(id:salt) against a per-group threshold —
  * the same engine-portable rule as [[Dedup.leakageSafeSplit]], at 1/256
  * granularity (weights' fractional parts must be multiples of 1/256).
  * Re-runs, engines, and layout changes all reproduce the same sample;
  * changing `salt` draws an independent one.
  *
  * Scale shape: the weight table broadcasts; the filter + copy explode
  * run map-side in the scan stage — NO shuffle at any size. Groups
  * absent from `weights` are dropped (weight 0): a curation mixture is
  * an allow-list, not a default-keep.
  */
object Mixture {

  /** TEMPERATURE mixture at τ = 1/2: weights DERIVED from the corpus's
    * own group sizes, w_g = sqrt(n_g / n_max) snapped down to 1/256
    * granularity (clamped to >= 1/256 so no non-empty group vanishes),
    * then [[resample]] — the multilingual/mixture sampling rule
    * (the (p_g)^τ family of mT5/XLM-R) that up-weights small groups
    * toward parity without letting any group dominate.
    *
    * τ = 1/2 exactly — not a parameter — because IEEE sqrt is CORRECTLY
    * ROUNDED: division, sqrt, the power-of-two scale by 256, and floor
    * all produce identical bits on every IEEE engine, so the derived
    * mixture itself hash-compares. General τ goes through `pow`, which
    * libms round differently in the last ulp — a near-boundary group
    * would flap across the 1/256 snap; for arbitrary τ, compute weights
    * upstream and call [[resample]] directly.
    *
    * The group-count collect is group-cardinality-sized by the mixture
    * contract (a mixture IS a per-group weight table).
    */
  def sqrtTemperatureResample(
      docs: DataFrame, groupCol: String = "source", idCol: String = "doc_id",
      salt: String = "mix"): DataFrame =
    resample(docs, sqrtTemperatureWeights(docs, groupCol), groupCol, idCol, salt)

  /** The τ = 1/2 weight table alone (w_g = sqrt(n_g / n_max) snapped
    * down to 1/256, clamped to >= 1/256) — for callers that derive the
    * weights from one population but apply them to another (an
    * incremental run derives from corpus+increment counts, resamples
    * only the increment). The collect is group-cardinality-sized by the
    * mixture contract.
    */
  def sqrtTemperatureWeights(
      docs: DataFrame, groupCol: String = "source"): Map[String, Double] =
    weightsFromCounts(groupCounts(docs, groupCol))

  /** The per-group count collect behind [[sqrtTemperatureWeights]] —
    * exposed so a caller that already pays a count action for another
    * reason (an emptiness gate) can derive the weights from ITS counts
    * instead of launching a second aggregate over the same rows.
    */
  def groupCounts(docs: DataFrame, groupCol: String): Seq[(String, Long)] =
    docs.groupBy(groupCol).count().collect().toSeq
      .map { r =>
        // fail fast, not silently: a null key would become a null-keyed
        // weight that resample's equi-join can never match, so every row
        // of that group would vanish — contradicting the documented
        // guarantee that no non-empty group drops below the 1/256 floor
        require(!r.isNullAt(0),
          s"temperature mixture: '$groupCol' contains NULL — a mixture " +
            "group needs a non-null key; filter or coalesce upstream")
        r.getString(0) -> r.getLong(1)
      }

  /** The τ = 1/2 rule over ALREADY-COLLECTED per-group counts — one
    * definition, so count-reusing callers and [[sqrtTemperatureWeights]]
    * cannot drift on the snap/clamp arithmetic.
    */
  def weightsFromCounts(counts: Seq[(String, Long)]): Map[String, Double] = {
    require(counts.nonEmpty, "temperature mixture needs at least one group")
    val nMax = counts.map(_._2).max
    counts.map { case (g, n) =>
      val k = math.max(1L, math.floor(math.sqrt(n.toDouble / nMax) * 256).toLong)
      g -> k / 256.0
    }.toMap
  }

  def resample(
      docs: DataFrame, weights: Map[String, Double],
      groupCol: String = "source", idCol: String = "doc_id",
      salt: String = "mix"): DataFrame =
    copyCounts(docs, weights, groupCol, idCol, salt)
      .filter(col("n_copies") > 0)
      .withColumn("copy", explode(sequence(lit(1L), col("n_copies"))))
      .drop("n_copies")

  /** Per-document copy COUNT under the md5 hex-pair rule, without the
    * explode: the input columns plus `n_copies` (possibly 0; rows of
    * groups absent from `weights` are dropped, matching [[resample]]).
    * For consumers that need Σ f(doc) · n_copies (an incremental run's
    * per-group offsets) the count aggregates directly — materializing
    * up-to-⌈w⌉ copy rows per document first would be pure shuffle
    * weight. [[resample]] is exactly this + the explode, so the two can
    * never disagree on the rule.
    */
  def copyCounts(
      docs: DataFrame, weights: Map[String, Double],
      groupCol: String = "source", idCol: String = "doc_id",
      salt: String = "mix"): DataFrame = {
    require(weights.nonEmpty, "weights must name at least one group")
    weights.foreach { case (g, w) =>
      require(w >= 0, s"negative weight for group $g")
      val frac = w - math.floor(w)
      require(math.rint(frac * 256) == frac * 256,
        s"weight for group $g must have a fractional part that is a multiple " +
          "of 1/256, so the md5 hex-pair rule stays engine-portable")
    }
    val spark = docs.sparkSession
    import spark.implicits._
    val params = weights.toSeq.map { case (g, w) =>
      val fracIdx = math.rint((w - math.floor(w)) * 256).toInt
      // highest kept hex pair: frac f keeps pairs '00'.. <f*256 of 256
      (g, math.floor(w).toLong,
        if (fracIdx == 0) null else "%02x".format(fracIdx - 1))
    }.toDF(groupCol, "_base", "_thr")
    docs.join(broadcast(params), Seq(groupCol))
      .withColumn("_h", substring(
        md5(encode(concat(col(idCol).cast("string"), lit(":" + salt)), "UTF-8")), 1, 2))
      .withColumn("n_copies",
        col("_base") + when(col("_thr").isNotNull && col("_h") <= col("_thr"), 1L)
          .otherwise(0L))
      .drop("_base", "_thr", "_h")
  }
}
