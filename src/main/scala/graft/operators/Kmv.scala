package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.expr.{DistinctMinKFunctions, HashFunctions}

/** KMV (k-minimum-values) distinct sketch per group (Bar-Yossef 2002;
  * Beyer et al., SIGMOD'07): keep the k smallest DISTINCT public-hash64
  * values of a group's elements; the k-th smallest hash estimates the
  * distinct count, and because two groups' sketches are bottom-k's of
  * their value SETS, set-operation estimates (Jaccard between groups)
  * fall out of pure array arithmetic on the retained hashes — the
  * capability [[Hll]] does not have (HLL unions losslessly but
  * intersects only through inclusion-exclusion error stacking).
  *
  * Everything downstream of the hash is DETERMINISTIC set arithmetic,
  * so the sketch family's bit-exact-oracle contract (q112) extends
  * here: hashes replay through the shared FNV-1a+fmix64 HUGEINT chain,
  * the sample is the k smallest distinct (hex-string order == unsigned
  * numeric order), and the estimator is replayed with the same IEEE
  * double operations (exactly-representable 2^64 constant, one
  * division) — identical bit patterns on both engines.
  *
  * Estimator: with s = |sample| < k the sketch HOLDS the whole distinct
  * set — the answer is exactly s. At s = k, est = floor((k-1) * 2^64 /
  * (h_k + 1)) where h_k is the k-th smallest distinct hash (unsigned),
  * clamped to 2^62 against adversarial/colliding inputs so the BIGINT
  * cast cannot overflow under ANSI.
  *
  * Scale shape: the sketch rides [[DistinctMinKFunctions.distinctMinK]]
  * — map-side partials truncate at k DISTINCT entries, so every
  * exchange carries <= k hex strings per (partition, group) even when
  * every value is unique (where a `distinct` pre-aggregation would
  * shuffle the full value set). Estimation and between-group set
  * arithmetic are per-group array surgery over <= k elements.
  */
object Kmv {

  /** 2^64 — exactly representable in IEEE double. */
  val TwoTo64: Double = 1.8446744073709552e19

  /** (groupCols..., sample_n, sk: array<hash-hex> asc) per group. */
  def sketch(
      df: DataFrame, groupCols: Seq[String], valueCol: String,
      k: Int, salt: String): DataFrame =
    df.select(groupCols.map(col) :+ hashHex(col(valueCol), salt).as("hk"): _*)
      .groupBy(groupCols.map(col): _*)
      .agg(DistinctMinKFunctions.distinctMinK(col("hk"), k).as("sk"))
      .withColumn("sample_n", size(col("sk")).cast("long"))

  /** %016x unsigned hex of hash64(salt + ":" + value): lexicographic
    * order == unsigned numeric order (the q112 convention).
    */
  def hashHex(value: Column, salt: String): Column =
    format_string("%016x", HashFunctions.hash64(
      concat(lit(salt + ":"), value.cast("string"))))

  /** Distinct-count estimate from a [[sketch]] frame: exact below k,
    * the KMV threshold estimator at k.
    */
  def distinctEstimate(sketched: DataFrame, k: Int): DataFrame = {
    val est = (lit((k - 1).toDouble) * lit(TwoTo64)) /
      (unsignedAsDouble(element_at(col("sk"), k)) + lit(1.0))
    sketched.withColumn("est_distinct",
      when(col("sample_n") < k, col("sample_n"))
        .otherwise(
          floor(least(est, lit(4611686018427387904L).cast("double")))
            .cast("long")))
  }

  /** Unsigned numeric value of a %016x hex string as the nearest IEEE
    * double — `conv` parses the full unsigned range, the double cast
    * rounds to nearest (the same conversion DuckDB's HUGEINT::DOUBLE
    * performs).
    */
  private def unsignedAsDouble(hex: Column): Column =
    conv(hex, 16, 10).cast("double")

  /** Pairwise Jaccard estimates between every pair of groups (one
    * grouping column), from the sketches alone: for groups a < b, take
    * the k smallest of the UNION of their samples, and estimate
    * J(a, b) = |union-sample ∩ S_a ∩ S_b| / |union-sample| — the
    * standard KMV set-operation rule. Output (g_a, g_b, sample_union,
    * n_both, jaccard_est), jaccard 6 dp. The pair join is
    * group-cardinality-sized (sketch rows), never data-sized — right
    * for the compare-a-handful-of-cohorts question this answers
    * (languages, sources, snapshots). All-pairs over MILLIONS of groups
    * is a different problem: pre-filter candidate pairs (e.g. by a
    * shared-minimum-hash bucket join over the sketches, the LSH trick
    * applied to the samples themselves) before calling this.
    */
  def jaccardBetweenGroups(sketched: DataFrame, groupCol: String, k: Int): DataFrame = {
    val a = sketched.select(col(groupCol).as("g_a"), col("sk").as("sk_a"))
    val b = sketched.select(col(groupCol).as("g_b"), col("sk").as("sk_b"))
    a.join(b, col("g_a") < col("g_b"))
      .withColumn("u", slice(array_sort(array_union(col("sk_a"), col("sk_b"))), 1, k))
      .withColumn("sample_union", size(col("u")).cast("long"))
      .withColumn("n_both",
        size(array_intersect(array_intersect(col("u"), col("sk_a")), col("sk_b")))
          .cast("long"))
      .withColumn("jaccard_est",
        round(when(col("sample_union") === 0, 0.0)
          .otherwise(col("n_both").cast("double") / col("sample_union")), 6))
      .select("g_a", "g_b", "sample_union", "n_both", "jaccard_est")
  }
}
