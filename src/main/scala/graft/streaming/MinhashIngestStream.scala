package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.StructType

import graft.operators.Dedup

/** Streaming near-dup ingest against a persisted MinHash index — the
  * "keep the index current" half of [[Dedup.writeMinhashIndex]]'s
  * deployment contract as a RUNNING operator, not a comment: each
  * micro-batch of arriving documents (a) probes the index for pairs
  * touching the batch and (b) APPENDS its own bucket/set rows
  * ([[Dedup.appendToMinhashIndex]]), so every later batch's probe sees
  * everything ingested before it.
  *
  * Batch boundaries are invisible in the result: a pair (x in batch N,
  * y in batch M > N) forms exactly once — during M, whose probe side
  * holds y and whose index already holds x's appended rows; within-batch
  * pairs form id-ordered in their own batch; corpus-vs-corpus never
  * forms. Appended rows behave as "corpus" on later probes, which is
  * semantically right — "already ingested" and "original corpus" are the
  * same thing to a probe. Drained with Trigger.AvailableNow over a
  * staged feed, the accumulated output EQUALS the single-shot
  * [[Dedup.incrementalNearDupPairs]] over the whole increment (q92's
  * oracle and MinhashIngestStreamSpec pin the equality).
  *
  * The index MUTATES — that is the point — so callers ingest into a
  * per-run COPY of a staged index, never a shared stage itself.
  *
  * Scale shape: per batch, probe cost is the q70 shape (batch broadcasts,
  * index streams) and the append writes batch-sized files; the index
  * grows by exactly the ingested rows, and nothing ever rewrites or
  * re-shuffles the corpus side. At a real deployment the same loop runs
  * continuously; compaction of the appended small files is the existing
  * [[graft.sources.Compact]] job.
  */
object MinhashIngestStream {

  /** Drain `feedDir` (parquet file stream; `maxFilesPerTrigger` controls
    * micro-batch granularity) into `indexDir`, writing each batch's
    * touching pairs to `outDir`. Returns the accumulated pairs, read
    * back sorted-stable for deterministic comparison.
    */
  def ingest(
      spark: SparkSession, feedDir: String, feedSchema: StructType,
      indexDir: String, outDir: String, checkpointDir: String,
      idCol: String = "doc_id", textCol: String = "text",
      threshold: Double = 0.8,
      maxFilesPerTrigger: Option[Int] = None): DataFrame = {
    var reader = spark.readStream.schema(feedSchema)
    maxFilesPerTrigger.foreach(m => reader = reader.option("maxFilesPerTrigger", m))
    val query = reader.parquet(feedDir)
      .writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        graft.operators.CacheScope.scoped {
          // probe FIRST (against everything ingested before this batch),
          // append SECOND — the ordering that makes each pair form once
          Dedup.incrementalNearDupPairs(batch.sparkSession, indexDir, batch,
              idCol, textCol, threshold)
            .write.mode("append").parquet(outDir)
          Dedup.appendToMinhashIndex(batch, indexDir, idCol, textCol)
        }
        ()
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
    query.awaitTermination()
    spark.read.parquet(outDir)
  }
}
