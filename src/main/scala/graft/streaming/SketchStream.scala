package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{OutputMode, Trigger}
import org.apache.spark.sql.types.StructType

import graft.operators.QuantileSketch

/** The bottom-k quantile sketch ([[QuantileSketch]]) maintained as
  * STREAMING STATE: the same bounded MIN-k aggregate that ranks the batch
  * sketch runs inside a streaming groupBy in Complete mode, so each
  * micro-batch's rows fold into the per-group state and the drained
  * result is the sketch of everything ingested.
  *
  * This is legal — and bit-reproducible — precisely because of the
  * sketch's merge law: bottom-k of a union equals bottom-k of merged
  * bottom-k's, and membership is a pure function of the input SET. So
  * the drained state is IDENTICAL to the single-shot batch sketch over
  * the same rows regardless of how the stream chops them into batches —
  * q113 shares q112's bit-exact oracle verbatim, which is the strongest
  * possible statement of batch-boundary invisibility for a sketch.
  *
  * Scale shape: state per group is the (n, bottom-k sample) pair — k
  * entries, never the group's rows; per batch the map-side partials
  * truncate at k before the state-store exchange, the
  * [[graft.functions.expr.TopKAggregate]] property.
  */
object SketchStream {

  def quantileSketchStreaming(
      spark: SparkSession, feedDir: String, feedSchema: StructType,
      outDir: String, groupCols: Seq[String], idCol: String, valueCol: String,
      k: Int, salt: String, ps: Seq[(String, Int)],
      maxFilesPerTrigger: Option[Int] = None,
      prep: DataFrame => DataFrame = identity): DataFrame = {
    var reader = spark.readStream.schema(feedSchema)
    maxFilesPerTrigger.foreach(m => reader = reader.option("maxFilesPerTrigger", m))
    val stream = prep(reader.parquet(feedDir))
    val state = QuantileSketch.sample(stream, groupCols, idCol, valueCol, k, salt)
    // Complete mode: every trigger emits the full current state; the
    // keyed-overwrite sink keeps only the latest — after an
    // AvailableNow drain, that IS the sketch of the whole feed. A
    // replayed final batch rewrites the same state (idempotent). The
    // state dir is a SIBLING of the checkpoint, never its parent — the
    // per-batch overwrite must not delete the stream's own commit log.
    val q = state.writeStream
      .outputMode(OutputMode.Complete)
      .foreachBatch { (b: DataFrame, _: Long) =>
        b.write.mode("overwrite").parquet(s"$outDir/state")
        ()
      }
      .option("checkpointLocation", s"$outDir/_checkpoint")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    QuantileSketch.quantiles(spark.read.parquet(s"$outDir/state"), groupCols, ps)
  }

  /** The Count-Min counter grid ([[graft.operators.Freq.cmsGrid]]) as
    * streaming state — counters merge by SUM, so the drained
    * complete-mode state equals the batch grid exactly, and the
    * heavy-hitter READOUT then runs as a batch question against the
    * drained grid plus the feed's candidate vocabulary. Sketch
    * maintenance and readout are decoupled the way a production
    * heavy-hitters service runs: the stream keeps the state current,
    * consumers query it. Shares q103's bit-exact oracle verbatim
    * (q116).
    */
  def cmsHeavyHittersStreaming(
      spark: SparkSession, feedDir: String, feedSchema: StructType,
      outDir: String, items: DataFrame => DataFrame, phi: Double,
      d: Int = 4, logW: Int = 10,
      maxFilesPerTrigger: Option[Int] = None): DataFrame = {
    import org.apache.spark.sql.functions.col
    var reader = spark.readStream.schema(feedSchema)
    maxFilesPerTrigger.foreach(m => reader = reader.option("maxFilesPerTrigger", m))
    val grid = graft.operators.Freq.cmsGrid(
      items(reader.parquet(feedDir)), col("item"), d, logW)
    val q = grid.writeStream
      .outputMode(OutputMode.Complete)
      .foreachBatch { (b: DataFrame, _: Long) =>
        b.write.mode("overwrite").parquet(s"$outDir/state")
        ()
      }
      .option("checkpointLocation", s"$outDir/_checkpoint")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    graft.operators.Freq.cmsHeavyHittersFromGrid(
      spark.read.parquet(s"$outDir/state"),
      items(spark.read.parquet(feedDir)), col("item"), phi, d, logW)
  }
}
