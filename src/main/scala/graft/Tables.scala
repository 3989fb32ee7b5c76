package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-provided parquet tables
  * (`/root/repo/TESTDATA.md`): TPC-H-ish star schema plus `events`,
  * `documents`, `embeddings`.
  *
  * Reads are plain `spark.read.parquet` — schema travels with the file,
  * and Catalyst pushes filters/projections into the vectorized parquet
  * scan, so no per-table schema declarations are needed here (unlike the
  * CSV path in [[graft.etl.Extract]], where an explicit StructType is
  * required — see SURVEY §1.3).
  */
object Tables {
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def lineitem(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "part")
  def nation(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "region")
  /** `events.ts` normalizes to microsecond TimestampType whatever the
    * file carries. Generations of the driver testdata have written it two
    * ways: parquet TIMESTAMP(NANOS) — which Spark 4 refuses to map to
    * TimestampType, so it's read as a nanos long (session flag) and
    * truncated to µs explicitly — and plain TIMESTAMP(MICROS), which
    * loads as TIMESTAMP_NTZ and needs only the NTZ→instant cast (a
    * reinterpretation under the session's UTC zone, not a shift).
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = table(spark, dir, "events")
    val ts = df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => timestamp_micros(expr("ts div 1000"))
      case _ => col("ts").cast("timestamp")
    }
    df.withColumn("ts", ts)
  }
  def documents(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "embeddings")
}
