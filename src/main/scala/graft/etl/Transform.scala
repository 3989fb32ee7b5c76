package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Transform stage — reference parity for `transform_data`
  * (/root/reference/src/etl_pipeline.py:83-141), as one declarative
  * expression block: Catalyst folds the whole chain into a single
  * whole-stage-codegen'd projection over the scan, with the `name IS NOT
  * NULL` filter pushed down.
  *
  * Semantics preserved exactly (SURVEY §3.2):
  *   - duration_days is FRACTIONAL days: total_seconds/86400
  *     (etl_pipeline.py:95) — not integer datediff;
  *   - success_flag is computed BEFORE the null-name filter
  *     (order of :109 vs :113) — same result either way here, but kept for
  *     auditability;
  *   - final projection is the reference's fixed 13-column order
  *     (etl_pipeline.py:123-138).
  */
object Transform {

  /** The reference's post-transform column order (etl_pipeline.py:123-137). */
  val outputColumns: Seq[String] = Seq(
    "ID", "name", "main_category", "category", "country", "backers",
    "pledged_usd", "goal_usd", "success_flag", "state",
    "launched_at", "deadline_at", "duration_days")

  def campaigns(raw: DataFrame): DataFrame = {
    raw
      // F1: two datetime shapes — 'YYYY-MM-DD HH:MM:SS' and bare date
      // (parses to midnight in pandas and Spark alike), etl_pipeline.py:91-92
      .withColumn("launched_at", to_timestamp(col("launched")))
      .withColumn("deadline_at", to_timestamp(col("deadline")))
      // F2: fractional-day duration, etl_pipeline.py:95
      .withColumn("duration_days",
        (unix_micros(col("deadline_at")) - unix_micros(col("launched_at"))) / 86400e6)
      // P1: renames, etl_pipeline.py:100-103
      .withColumnsRenamed(Map(
        "usd_pledged_real" -> "pledged_usd",
        "usd_goal_real" -> "goal_usd"))
      // F3: success flag as a built-in CASE WHEN (the reference uses a
      // Python lambda, etl_pipeline.py:108-109 — no UDF needed)
      .withColumn("success_flag",
        when(col("state") === "successful", 1).otherwise(0))
      // P3: drop null-name rows, etl_pipeline.py:113
      .na.drop(Seq("name"))
      // P2: fixed 13-column projection, etl_pipeline.py:123-138
      .select(outputColumns.map(col): _*)
  }

  /** `inspect_data` parity (etl_pipeline.py:67-80): the state frequency
    * table, A1 in SURVEY §2.4. Returned as a DataFrame, not printed.
    */
  def stateCounts(df: DataFrame): DataFrame =
    df.groupBy("state").agg(count(lit(1)).as("count"))
      .orderBy(desc("count"), col("state"))

  /** Null-count audit used at etl_pipeline.py:300 (A4). */
  def nullCount(df: DataFrame, column: String): Long =
    df.filter(col(column).isNull).count()
}
