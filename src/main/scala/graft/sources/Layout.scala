package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.expr.ZOrderFunctions.{stringPrefixKey, zValueN}

/** Z-ORDERED parquet layout for multi-column data skipping. A 1-D sorted
  * layout gives narrow per-file min/max ranges only on its leading
  * column; interleaving the bits of ALL (range-bucketed) clustering
  * columns into a Morton key and range-partitioning + sorting by it keeps
  * every file's footprint small in every dimension — parquet min/max
  * row-group stats then prune scans filtered on ANY of them. Bucket
  * bounds come from one min/max aggregate (driver-resident scalars,
  * never the data).
  *
  * Dimensions may be any integral/date/timestamp/float/string column;
  * each is normalized to an ORDER-PRESERVING long/double key first
  * ([[dimKey]]): timestamps to epoch micros, dates to epoch days, strings
  * to their big-endian 8-byte-prefix key — so the interleave always works
  * over comparable bucketed longs, the lakehouse OPTIMIZE/ZORDER recipe.
  */
object Layout {

  /** Order-preserving numeric key for a clustering column. */
  private[graft] def dimKey(df: DataFrame, c: String): Column =
    df.schema(c).dataType match {
      case ByteType | ShortType | IntegerType | LongType => col(c).cast("long")
      case DateType => unix_date(col(c)).cast("long")
      case TimestampType => unix_micros(col(c))
      // parquet timestamps load as NTZ in Spark 4; session TZ is UTC so
      // the cast is a reinterpretation, not a shift
      case TimestampNTZType => unix_micros(col(c).cast("timestamp"))
      case FloatType | DoubleType => col(c).cast("double")
      case StringType => stringPrefixKey(col(c))
      case dt => throw new IllegalArgumentException(
        s"cannot z-order column '$c' of type ${dt.simpleString}")
    }

  /** The Morton key over `cols` for `df`'s rows — bucket bounds come
    * from one min/max aggregate over `df` (driver scalars), so calling
    * this runs ONE Spark action before returning the column. Shared by
    * [[writeZOrdered]] and [[TxTable.optimizeZorder]].
    */
  /** Bits per dimension in the interleaved key for `dims` columns. */
  private[graft] def zBitsPer(dims: Int): Int = math.min(16, 63 / dims)

  private[graft] def zKey(df: DataFrame, cols: Seq[String]): Column = {
    require(cols.nonEmpty, "need at least one clustering column")
    val bitsPer = zBitsPer(cols.size)
    val keys = cols.map(c => dimKey(df, c).cast("double"))
    val bounds = keys.flatMap(k => Seq(min(k), max(k)))
    val b = df.agg(bounds.head, bounds.tail: _*).head()
    require(cols.indices.forall(i => !b.isNullAt(2 * i)),
      "cannot z-order an empty frame or an all-null dimension (no min/max bounds)")
    val maxBucket = (1L << bitsPer) - 1
    val bucketCols = keys.zipWithIndex.map { case (k, i) =>
      val (lo, hi) = (b.getDouble(2 * i), b.getDouble(2 * i + 1))
      // scale in DOUBLE: (v - lo) * 65535 in long arithmetic overflows
      // once the span exceeds ~2^63/65535 (epoch-nanos columns), which
      // would silently destroy the clustering; a constant dimension
      // (span 0) buckets to 0 everywhere
      val span = math.max(hi - lo, java.lang.Double.MIN_NORMAL)
      ((k - lit(lo)) * lit(maxBucket) / lit(span)).cast("long")
    }
    zValueN(bucketCols, bitsPer)
  }

  /** Write `df` into `files` z-ordered parquet files clustered on
    * `cols` (any mix of supported types; 2–3 dims is the sweet spot —
    * bits per dimension shrink as dims grow).
    */
  def writeZOrdered(df: DataFrame, dir: String, cols: Seq[String], files: Int): Unit = {
    require(files >= 1, "files must be >= 1")
    require(!df.columns.contains("__z"), "'__z' column name is reserved")
    df.withColumn("__z", zKey(df, cols))
      .repartitionByRange(files, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(dir)
  }

  /** 2-column convenience overload (the original surface). */
  def writeZOrdered(
      df: DataFrame, dir: String, xCol: String, yCol: String, files: Int): Unit =
    writeZOrdered(df, dir, Seq(xCol, yCol), files)

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
