package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** A named group of driver-contract queries plus their DuckDB oracles. */
trait QueryFamily {
  def queries: Map[String, (SparkSession, String) => DataFrame]
  def oracleSql: Map[String, String]
}
