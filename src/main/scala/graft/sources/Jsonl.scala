package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

/** JSONL (one JSON object per line) ingestion — the interchange format
  * training-data corpora actually arrive in.
  *
  * Design rules (same as the CSV extract, SURVEY §1.3):
  *   - EXPLICIT schema, never inference: inference double-scans the
  *     input and drifts with the first files sampled; at 100 TB neither
  *     is acceptable.
  *   - Line-delimited (multiLine off) keeps the files splittable —
  *     every executor reads its own byte range.
  *   - PERMISSIVE mode with a corrupt-record capture column: a broken
  *     line lands in `_corrupt_record` instead of failing the job; the
  *     caller audits/filters them explicitly ([[corruptRecords]] /
  *     [[validDocuments]]). DROPMALFORMED would silently change row
  *     counts; FAILFAST turns one bad line in terabytes into a rerun.
  */
object Jsonl {

  val corruptCol = "_corrupt_record"

  /** `documents`-shaped schema plus the corrupt-record capture column. */
  val documentsSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = true),
    StructField("text", StringType, nullable = true),
    StructField("lang", StringType, nullable = true),
    StructField("source", StringType, nullable = true),
    StructField("n_chars", LongType, nullable = true),
    StructField(corruptCol, StringType, nullable = true)))

  def readDocuments(spark: SparkSession, path: String): DataFrame =
    spark.read
      .schema(documentsSchema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", corruptCol)
      .option("encoding", "UTF-8")
      .json(path)

  /** Rows that parsed cleanly, corrupt column dropped. */
  def validDocuments(df: DataFrame): DataFrame =
    df.filter(df(corruptCol).isNull).drop(corruptCol)

  /** The raw text of lines that failed to parse (for auditing). A data
    * column rides along because Spark rejects reads that prune to ONLY
    * the internal corrupt column (QUERY_ONLY_CORRUPT_RECORD_COLUMN).
    */
  def corruptRecords(df: DataFrame): DataFrame =
    df.filter(df(corruptCol).isNotNull).select(df("doc_id"), df(corruptCol).as("raw"))
}
