package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Time-DECAYED engagement scoring — the recency-weighted activity
  * signal (feed ranking, churn features): each event contributes its
  * value halved once per hour of age at the reporting horizon,
  *
  *   score(user) = Σ_events  floor(v / 2^age_hours(horizon − ts))
  *
  * The per-TERM floor (instead of flooring the float total) makes the
  * sum EXACT, ORDER-FREE and MERGEABLE: partial sums from any partition
  * of the events combine by addition — so the identical operator runs
  * as a batch aggregate (q178) and as Structured Streaming
  * complete-mode state (q179), and both hash-match one oracle. The
  * horizon is a fixed parameter (the reporting instant), NOT max(ts) —
  * a data-derived horizon would change under late data and break the
  * merge property.
  *
  * Reference scope: no recency weighting in the reference; extension —
  * the decayed-count family (Cormode et al.) in its exactly-computable
  * integer form.
  *
  * Scale shape: one map-side projection (age, shift, floor — all
  * integer, codegen'd) + one user-keyed map-side-combined sum. Nothing
  * else. Ages ≥ 63 contribute zero explicitly (a 2^age shift past the
  * long width is undefined, not zero); negative ages (events after the
  * horizon) clamp to undecayed.
  */
object DecayScore {

  /** Per-event contributions: (user_id, vc decayed). `horizon` is a
    * timestamp literal, e.g. "2024-02-01".
    */
  def contributions(events: DataFrame, horizon: String,
      userCol: String = "user_id", tsCol: String = "ts",
      valueCol: String = "vc"): DataFrame =
    events.select(col(userCol), col(valueCol),
      (unix_micros(lit(horizon).cast("timestamp")) -
        unix_micros(col(tsCol).cast("timestamp"))).as("__age_us"))
      .withColumn("__age", greatest(expr("__age_us div 3600000000"), lit(0L)))
      .withColumn("decayed", when(col("__age") < 63,
        expr(s"$valueCol div shiftleft(cast(1 as bigint), cast(__age as int))"))
        .otherwise(lit(0L)))
      .select(col(userCol), col("decayed"))

  /** The mergeable aggregate: (userCol, n_events, score). */
  def aggregate(contribs: DataFrame, userCol: String = "user_id"): DataFrame =
    contribs.groupBy(userCol)
      .agg(count(lit(1)).as("n_events"), sum(col("decayed")).as("score"))
}
