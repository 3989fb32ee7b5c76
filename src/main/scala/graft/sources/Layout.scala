package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.expr.ZOrderFunctions.zValue

/** Z-ORDERED parquet layout for two-column data skipping. A 1-D sorted
  * layout gives narrow per-file min/max ranges only on its leading
  * column; interleaving the bits of BOTH (range-bucketed) columns into a
  * Morton key and range-partitioning + sorting by it keeps every file's
  * footprint small in both dimensions — parquet min/max row-group stats
  * then prune scans filtered on EITHER column. Bucket bounds come from
  * one min/max aggregate (driver-resident scalars, never the data).
  */
object Layout {

  private val bitsPer = 16 // 2 x 16 bits: 65536 buckets per dimension

  /** Write `df` into `files` z-ordered parquet files clustered on the
    * two LONG columns `xCol`/`yCol`.
    */
  def writeZOrdered(
      df: DataFrame, dir: String, xCol: String, yCol: String, files: Int): Unit = {
    require(files >= 1, "files must be >= 1")
    require(!df.columns.contains("__z"), "'__z' column name is reserved")
    val b = df.agg(min(xCol), max(xCol), min(yCol), max(yCol)).head()
    require(!b.isNullAt(0) && !b.isNullAt(2),
      "cannot z-order an empty frame (no min/max bounds)")
    val (xMin, xMax, yMin, yMax) =
      (b.getLong(0), b.getLong(1), b.getLong(2), b.getLong(3))
    def bucket(c: String, lo: Long, hi: Long) = {
      val span = math.max(hi - lo, 1L)
      // scale in DOUBLE: (v - lo) * 65535 in long arithmetic overflows
      // once the span exceeds ~2^63/65535 (epoch-nanos columns), which
      // would silently destroy the clustering
      ((col(c) - lit(lo)).cast("double") * lit((1L << bitsPer) - 1) / lit(span.toDouble))
        .cast("long")
    }
    df.withColumn("__z",
        zValue(bucket(xCol, xMin, xMax), bucket(yCol, yMin, yMax), bitsPer))
      .repartitionByRange(files, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(dir)
  }

  /** Per-file (min, max) of a long column — the footprint a parquet
    * reader's row-group pruning sees. One job over input_file_name()
    * (not a job per file), path-scheme-agnostic.
    */
  def fileRanges(spark: SparkSession, dir: String, c: String): Seq[(Long, Long)] =
    spark.read.parquet(dir)
      .groupBy(input_file_name())
      .agg(min(c).as("lo"), max(c).as("hi"))
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSeq
}
