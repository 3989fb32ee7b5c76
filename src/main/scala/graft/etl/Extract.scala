package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

/** CSV extract stage — reference parity for `extract_data`
  * (/root/reference/src/etl_pipeline.py:45-64, S1 in SURVEY §2.1).
  *
  * Differences from the reference, by design:
  *   - the schema is EXPLICIT (the pandas run infers dtypes; inference in
  *     Spark double-scans the file and can drift — SURVEY §1.3), and
  *   - the read is distributed and lazy: at 100 TB the CSV splits across
  *     executors and Catalyst prunes columns/pushes filters into the scan.
  */
object Extract {

  /** Raw Kickstarter CSV schema: 15 columns as the pandas baseline infers
    * them (/root/reference/logs/etl_pipeline.log:10-25). Note the column
    * name containing a space (`usd pledged`).
    */
  val kickstarterSchema: StructType = StructType(Seq(
    StructField("ID", LongType, nullable = false),
    StructField("name", StringType, nullable = true),
    StructField("category", StringType, nullable = true),
    StructField("main_category", StringType, nullable = true),
    StructField("currency", StringType, nullable = true),
    StructField("deadline", StringType, nullable = true),
    StructField("goal", DoubleType, nullable = true),
    StructField("launched", StringType, nullable = true),
    StructField("pledged", DoubleType, nullable = true),
    StructField("state", StringType, nullable = true),
    StructField("backers", LongType, nullable = true),
    StructField("country", StringType, nullable = true),
    StructField("usd pledged", DoubleType, nullable = true),
    StructField("usd_pledged_real", DoubleType, nullable = true),
    StructField("usd_goal_real", DoubleType, nullable = true)))

  /** Read the raw campaigns CSV. Quoted fields may contain commas and
    * escaped quotes (campaign names), hence quote/escape options; multiLine
    * stays OFF so the file remains splittable across executors (a multiline
    * CSV forces one task per file — only enable if names embed newlines).
    */
  def campaignsCsv(spark: SparkSession, path: String): DataFrame =
    spark.read
      .schema(kickstarterSchema)
      .option("header", true)
      .option("quote", "\"")
      .option("escape", "\"")
      .option("encoding", "UTF-8")
      .csv(path)
}
