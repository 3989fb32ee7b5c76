package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.{LongType, StructField, StructType}

import graft.operators.AsOf

/** Streaming FACT enrichment against an SCD2 dimension, time-correct:
  * each micro-batch of facts re-reads the latest COMMITTED dimension
  * snapshot (a [[Scd2Stream]] directory) and as-of joins it on
  * (key, fact ts >= valid_from) — every fact resolves to the dimension
  * VERSION valid at its event time, never to "whatever is current when
  * the fact happens to arrive". This is the reference pipeline's
  * fact-to-dimension key resolution (`/root/reference/src/etl_pipeline.py:260`)
  * upgraded to time-correct keys: the reference looks up one current
  * mapping per key; a warehouse ingesting late or replayed facts must
  * look up the version their EVENT time falls in, or reprocessed history
  * silently picks up future attributes.
  *
  * Facts need NO cross-batch ordering (unlike the dimension maintainer's
  * change feed): each fact resolves independently against the full
  * version history, so late-arriving facts are correct by construction —
  * Scd2EnrichStreamSpec interleaves dimension updates between fact
  * batches (and replays batches against a moved dimension) to pin
  * exactly that.
  *
  * Scale shape: the snapshot is dimension-sized and re-read once per
  * micro-batch (that re-read is the point — it picks up concurrent
  * dimension maintenance, the same pattern as stream-static enrichment);
  * the as-of itself is the union+window form — one key exchange of
  * batch + dimension rows, no pair explosion ([[AsOf.asofBackward]]).
  * Batch output lands in per-batch OVERWRITE directories, so a replayed
  * micro-batch converges instead of duplicating
  * ([[EventStreams.idempotentAppendBatchKeyed]]'s protocol).
  */
object Scd2EnrichStream {

  /** The as-of-joinable view of an SCD2 snapshot: one row per
    * (key, valid_from), with valid_from exposed under the FACT's ts
    * column name. When several versions open at the same timestamp
    * (same-ts attribute flips, ordered by tie columns), only the LAST
    * (max version) is valid "as of" that instant — its zero-duration
    * predecessors are visible to no fact. A backward as-of against
    * valid_from then lands every fact in its containing interval, because
    * SCD2 intervals abut.
    */
  def asOfView(dim: DataFrame, key: String, tsOut: String, attrCols: Seq[String]): DataFrame = {
    val w = Window.partitionBy(col(key), col("valid_from")).orderBy(col("version").desc)
    dim
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .select(col(key) +: col("valid_from").as(tsOut) +: col("version") +:
        attrCols.map(col): _*)
  }

  /** One micro-batch: enrich `facts` with (valid_from, version, attrs)
    * from the latest committed snapshot under `dimDir`. Facts before
    * their key's first version, or with a key the dimension has never
    * seen, keep null dimension columns (left as-of semantics). A MISSING
    * dimension directory is a bootstrap error, not an empty dimension —
    * refuse loudly rather than silently null-enriching a whole feed.
    */
  def enrichBatch(
      facts: DataFrame, dimDir: String, key: String, ts: String,
      attrCols: Seq[String]): DataFrame = {
    val dim = Scd2Stream.latestSnapshot(facts.sparkSession, dimDir).getOrElse(
      throw new IllegalStateException(
        s"no committed SCD2 snapshot under $dimDir — bootstrap the dimension " +
          "(even an empty-feed snapshot) before streaming facts against it"))
    AsOf.asofBackward(facts, asOfView(dim, key, ts, attrCols), key, ts,
      rightTsOut = "valid_from")
  }

  /** File-source harness: drain `factsDir` (schema `factsSchema`,
    * Trigger.AvailableNow, optionally split into multiple micro-batches
    * via `maxFilesPerTrigger`), enriching every batch against the latest
    * committed snapshot under `dimDir` at the time that batch runs, and
    * return the materialized result read back from `outDir`.
    */
  def enrichStream(
      spark: SparkSession, factsDir: String, factsSchema: StructType,
      dimDir: String, outDir: String,
      key: String, ts: String, attrCols: Seq[String],
      maxFilesPerTrigger: Option[Int] = None): DataFrame = {
    // resolve the output schema up front from the dimension the stream
    // will enrich against (also validates the bootstrap-before-facts
    // contract before any batch runs)
    val dim = Scd2Stream.latestSnapshot(spark, dimDir).getOrElse(
      throw new IllegalStateException(
        s"no committed SCD2 snapshot under $dimDir — bootstrap the dimension " +
          "before starting the fact stream"))
    val outSchema = StructType(
      factsSchema.fields.toSeq ++
        Seq(StructField("valid_from", factsSchema(ts).dataType),
          StructField("version", LongType)) ++
        attrCols.map(c => dim.schema(c)))
    val dataDir = s"$outDir/data"
    val reader = spark.readStream.schema(factsSchema)
    val src = maxFilesPerTrigger
      .map(n => reader.option("maxFilesPerTrigger", n)).getOrElse(reader)
      .parquet(factsDir)
    val q = src.writeStream
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        enrichBatch(batch.toDF(), dimDir, key, ts, attrCols)
          .write.mode("overwrite").parquet(s"$dataDir/batch=$batchId")
      }
      .option("checkpointLocation", s"$outDir/_checkpoint")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val p = new org.apache.hadoop.fs.Path(dataDir)
    if (p.getFileSystem(spark.sessionState.newHadoopConf()).exists(p))
      spark.read.schema(outSchema).parquet(dataDir)
        .select(outSchema.fieldNames.map(col).toSeq: _*) // drop the batch= partition col
    else
      spark.createDataFrame(spark.sparkContext.emptyRDD[Row], outSchema)
  }
}
