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
  /** `events.ts` is written as parquet TIMESTAMP(NANOS), which Spark 4
    * refuses to map to TimestampType. Read nanos as long (session flag)
    * and convert to microsecond TimestampType explicitly — the same
    * truncation every µs-precision engine applies.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    table(spark, dir, "events")
      .withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
        org.apache.spark.sql.functions.expr("ts div 1000")))
  }
  def documents(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "embeddings")
}
