package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table layout for CO-LOCATED joins — the storage-level answer
  * to repeated large-large joins on a stable key (fact-to-fact,
  * fingerprint-to-fingerprint): write both sides bucketed (and
  * bucket-sorted) by the join key once, and every subsequent join of the
  * two tables plans WITHOUT a shuffle on either side — the bucketed scan
  * itself reports the hash distribution and sort order, so
  * EnsureRequirements elides both exchanges (and with `sortBy`, both
  * sorts). At 100 TB this converts the dominant repeated cost (two
  * full-table exchanges per run) into a one-off at write time.
  *
  * Both sides must use the SAME bucket count; buckets should be sized so
  * one bucket's rows fit an executor's sort buffer (bucket count ≈
  * table size / a few hundred MB). BucketedSpec pins the zero-exchange,
  * zero-sort plan and result parity with the shuffled join.
  */
object Bucketed {

  /** Write `df` as a bucketed, bucket-sorted parquet table in the session
    * catalog (bucketing metadata lives in the catalog, not the files —
    * a plain parquet read of the same directory won't co-locate).
    */
  def writeBucketed(
      df: DataFrame, table: String, key: String, buckets: Int): Unit =
    df.write.mode("overwrite").format("parquet")
      .bucketBy(buckets, key).sortBy(key)
      .saveAsTable(table)

  /** Read a bucketed table back (catalog read — carries the bucket spec). */
  def read(spark: SparkSession, table: String): DataFrame = spark.table(table)
}
