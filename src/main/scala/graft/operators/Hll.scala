package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.functions.expr.HashFunctions.{hash64, nlz64}

/** HyperLogLog distinct-count estimation (Flajolet et al. 2007) built so
  * the ESTIMATE itself is bit-exactly reproducible by a SQL oracle — the
  * sketch twin the engine previously could only rows-only-check (q60's
  * `approx_count_distinct` uses Spark's private HLL++ implementation and
  * seed, so no oracle can replay it).
  *
  * Everything up to the final scalar is integer arithmetic over the
  * engine's public FNV-1a+fmix64 hash:
  *
  *  - register index = top `p` bits of hash64(value); rank rho = leading
  *    zeros of the remaining 64-p bits + 1 (a compiled
  *    `Long.numberOfLeadingZeros` expression — the `floor(log2(x))`
  *    double route is libm-dependent in its last ulp and NOT oracle-safe)
  *  - per-(group, register) MAX(rho) — map-side combinable, the exchange
  *    carries <= groups * m rows regardless of input size
  *  - the indicator sum Z^-1 = sum_j 2^(-M_j) is scaled by 2^maxRho and
  *    accumulated as an EXACT integer (DECIMAL(38,0) here, HUGEINT in the
  *    oracle — it can exceed 2^63), so the only floating-point steps are
  *    one cast and one division
  *  - the linear-counting branch (E_raw <= 2.5m with empty registers)
  *    looks its value up from a BROADCAST table of m*ln(m/V) doubles
  *    computed once on the driver — the same 17-digit literals are
  *    spliced into the oracle, so no libm call happens per-engine
  *
  * Scale shape: one narrow map over the stream, one bounded two-phase
  * aggregation; constant state per group at any cardinality (the reason
  * this exists next to q59's exact Expand-based count distinct).
  *
  * Accuracy contract: the standard ~1.04/sqrt(m) relative error (~6.5%
  * at p=8); SketchSpec bounds it against exact counts in both estimator
  * regimes.
  */
object Hll {

  /** Register-index bit width: m = 2^p registers per group. */
  val p: Int = 8
  val m: Int = 1 << p
  /** Max rank: 64-p suffix bits all zero -> rho = maxRho. */
  val maxRho: Int = 64 - p + 1
  /** Bias correction alpha_m for m >= 128. */
  val alpha: Double = 0.7213 / (1.0 + 1.079 / m)
  /** E_raw = kRaw / S_int, with S_int the 2^maxRho-scaled indicator sum. */
  val kRaw: Double = alpha * m * m * math.pow(2.0, maxRho)
  /** Below this raw estimate (with empty registers), use linear counting. */
  val lcThreshold: Double = 2.5 * m
  /** Linear-counting estimate for V empty registers. */
  def lnEst(v: Int): Double = m * math.log(m.toDouble / v)

  /** Per-`group` HLL distinct estimate of `value`, as (group, est) with
    * est ROUND(..., 4) double. Deterministic: same input set -> same
    * bits, in any engine that replays the integer pipeline.
    */
  def approxCountDistinct(rows: DataFrame, group: String, value: Column): DataFrame = {
    val spark = rows.sparkSession
    import spark.implicits._
    val shifted = shiftleft(col("x"), p)
    val parts = rows.select(col(group), hash64(value.cast("string")).as("x"))
      .select(col(group),
        shiftrightunsigned(col("x"), 64 - p).cast("int").as("j"),
        when(shifted === 0L, lit(maxRho))
          .otherwise(nlz64(shifted) + lit(1)).as("rho"))
    val regs = parts.groupBy(col(group), col("j")).agg(max("rho").as("mj"))
    val lntab = broadcast(
      (1 until m).map(v => (v.toLong, lnEst(v))).toDF("vempty", "lc"))
    regs.groupBy(group).agg(
        sum(expr(s"CAST(shiftleft(CAST(1 AS BIGINT), $maxRho - mj) AS DECIMAL(38,0))"))
          .as("sp"),
        count(lit(1)).as("nregs"))
      .select(col(group), (lit(m.toLong) - col("nregs")).as("vempty"),
        (col("sp") + (lit(m.toLong) - col("nregs")).cast(DecimalType(38, 0))
          * lit(1L << maxRho).cast(DecimalType(38, 0))).cast("double").as("sd"))
      .withColumn("eraw", lit(kRaw) / col("sd"))
      .join(lntab, Seq("vempty"), "left")
      .select(col(group),
        round(
          when(col("vempty") > 0 && col("eraw") <= lit(lcThreshold), col("lc"))
            .otherwise(col("eraw")),
          4).as("est"))
  }

  // ---- oracle-side literal splicing -------------------------------------

  /** Exact decimal literal of a double (round-trips bit-exactly). */
  def dlit(d: Double): String = new java.math.BigDecimal(d).toPlainString

  /** SQL VALUES rows `(v, m*ln(m/v))` for the linear-counting table. */
  def lnTableValues: String =
    (1 until m).map(v => s"($v, ${dlit(lnEst(v))})").mkString(", ")

  /** SQL VALUES rows `(b, 2^(64-b))` for integer-exact rank derivation:
    * rho = MIN b with rest >= 2^(64-b), else maxRho when rest = 0.
    */
  def rankThresholdValues: String =
    (1 to 64 - p).map { b =>
      s"($b, ${(BigInt(1) << (64 - b)).toString}::HUGEINT)"
    }.mkString(", ")

  /** SQL VALUES rows `(mj, 2^(maxRho-mj))` for the scaled indicator sum. */
  def scaleValues: String =
    (1 to maxRho).map { r =>
      s"($r, ${(BigInt(1) << (maxRho - r)).toString}::HUGEINT)"
    }.mkString(", ")
}
