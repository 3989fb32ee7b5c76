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
      salt: String = "mix"): DataFrame = {
    val counts = docs.groupBy(groupCol).count().collect()
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
    require(counts.nonEmpty, "temperature mixture needs at least one group")
    val nMax = counts.map(_._2).max
    val weights = counts.map { case (g, n) =>
      val k = math.max(1L, math.floor(math.sqrt(n.toDouble / nMax) * 256).toLong)
      g -> k / 256.0
    }.toMap
    resample(docs, weights, groupCol, idCol, salt)
  }

  def resample(
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
      .withColumn("_n",
        col("_base") + when(col("_thr").isNotNull && col("_h") <= col("_thr"), 1L)
          .otherwise(0L))
      .filter(col("_n") > 0)
      .withColumn("copy", explode(sequence(lit(1L), col("_n"))))
      .drop("_base", "_thr", "_h", "_n")
  }
}
