package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** A named group of driver-contract queries plus their DuckDB oracles. */
trait QueryFamily {
  def queries: Map[String, (SparkSession, String) => DataFrame]
  def oracleSql: Map[String, String]

  /** Named stage builders — derived artifacts this family builds once
    * per source state ([[Staging]] contract) and shares across queries.
    * Bench pre-builds them UNTIMED and reports their cost as its own
    * metric line: a cold stage otherwise lands entirely on run 1 of
    * whichever query first touches it, invisibly inflating the artifact
    * (the r7 bench's uninterpretable totals). Each returns the stage dir.
    */
  def stages: Map[String, (SparkSession, String) => String] = Map.empty
}
