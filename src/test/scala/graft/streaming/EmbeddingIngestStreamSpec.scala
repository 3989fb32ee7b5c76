package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types.{ArrayType, FloatType, LongType, StructField, StructType}

import graft.SparkTestBase
import graft.operators.Dedup
import graft.sources.Segments

/** [[EmbeddingIngestStream]] — drained == single-shot probe, the
  * cross-batch pair planted across batches 1 and 3 is caught, the index
  * grows, and a post-commit batch replay rewrites identical output.
  */
class EmbeddingIngestStreamSpec extends SparkTestBase {
  import spark.implicits._

  private val dim = 64

  /** Unit vector at angle `t` in the (e0, e1) plane — cosine between two
    * of these is cos(t1 - t2), so near-dup chains are planted by angle.
    */
  private def a(t: Double): Array[Float] = {
    val v = new Array[Float](dim)
    v(0) = math.cos(t).toFloat
    v(1) = math.sin(t).toFloat
    v
  }

  private def axis(i: Int): Array[Float] = {
    val v = new Array[Float](dim)
    v(i) = 1f
    v
  }

  private val feedSchema = StructType(Seq(
    StructField("vec_id", LongType),
    StructField("embedding", ArrayType(FloatType, containsNull = false))))

  // corpus 0 at angle 0; increment 100 at 0.2 (cos .980 vs 0) and 102 at
  // 0.4 (cos .980 vs 100, but .921 vs 0 — BELOW the .95 threshold): the
  // (100, 102) pair exists only through the chain, and it spans batches
  // 1 and 3. 1/101 are orthogonal background.
  private lazy val corpus = Seq(
    (0L, a(0.0).toSeq), (1L, axis(5).toSeq)).toDF("vec_id", "embedding")

  private val inc = Seq(
    (100L, a(0.2).toSeq), (101L, axis(7).toSeq), (102L, a(0.4).toSeq))

  private def tmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_eingest_$tag").toString

  private def freshIndex(): String = {
    val dir = tmp("idx")
    Dedup.writeEmbeddingIndex(corpus, dir)
    dir
  }

  private def pairSet(df: DataFrame): Set[(Long, Long)] =
    df.select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  private lazy val oneShotRows: Set[Seq[Any]] =
    Dedup.incrementalEmbeddingNearDupPairs(
        spark, freshIndex(), inc.toDF("vec_id", "embedding"), threshold = 0.95)
      .collect().map(_.toSeq).toSet

  test("3-batch drain == single-shot probe; cross-batch pair; index grows") {
    val indexDir = freshIndex()
    val feedDir = tmp("feed")
    inc.foreach { v =>
      Seq(v).toDF("vec_id", "embedding")
        .coalesce(1).write.mode("append").parquet(feedDir)
    }
    val streamed = EmbeddingIngestStream.ingest(
      spark, feedDir, feedSchema, indexDir, tmp("out"), tmp("ckpt"),
      threshold = 0.95, maxFilesPerTrigger = Some(1))
    assert(streamed.collect().map(_.toSeq).toSet === oneShotRows)
    val got = pairSet(streamed)
    assert(got === Set((0L, 100L), (100L, 102L)),
      s"expected exactly the planted chain pairs, got $got")
    // (100, 102) spans batches 1 and 3 — only the batch-3 probe against
    // batch-1's APPENDED rows can form it
    // index grew: a later increment pairs with a stream-ingested vector
    val second = Dedup.incrementalEmbeddingNearDupPairs(
      spark, indexDir, Seq((200L, a(0.5).toSeq)).toDF("vec_id", "embedding"),
      threshold = 0.95)
    assert(pairSet(second).contains((102L, 200L)),
      s"index did not grow with the ingested batches: ${pairSet(second)}")
  }

  test("post-commit batch replay rewrites identical output, no duplicate segment") {
    val indexDir = freshIndex()
    val outDir = tmp("out")
    def b(i: Int): DataFrame = Seq(inc(i)).toDF("vec_id", "embedding")
    EmbeddingIngestStream.ingestBatch(b(0), 0L, indexDir, outDir, threshold = 0.95)
    val afterFirst = spark.read.parquet(outDir).drop("batch")
      .collect().map(_.toSeq).toSet
    // checkpoint commit lost — streaming re-runs batch 0 against an index
    // that already holds its rows
    EmbeddingIngestStream.ingestBatch(b(0), 0L, indexDir, outDir, threshold = 0.95)
    assert(spark.read.parquet(outDir).drop("batch")
      .collect().map(_.toSeq).toSet === afterFirst)
    assert(Segments.liveSegs(spark, indexDir) === Seq("batch-0"))
    EmbeddingIngestStream.ingestBatch(b(1), 1L, indexDir, outDir, threshold = 0.95)
    EmbeddingIngestStream.ingestBatch(b(2), 2L, indexDir, outDir, threshold = 0.95)
    assert(spark.read.parquet(outDir).drop("batch")
      .collect().map(_.toSeq).toSet === oneShotRows)
  }
  test("job budget: the 3-batch drain stays within the pinned job count") {
    val indexDir = freshIndex()
    val feedDir = tmp("feed")
    inc.foreach { v =>
      Seq(v).toDF("vec_id", "embedding")
        .coalesce(1).write.mode("append").parquet(feedDir)
    }
    val jobs = JobBudget.count(spark) {
      EmbeddingIngestStream.ingest(
        spark, feedDir, feedSchema, indexDir, tmp("out"), tmp("ckpt"),
        threshold = 0.95, maxFilesPerTrigger = Some(1), compactEvery = 2)
        .collect()
      ()
    }
    info(s"embedding ingest drain jobs = $jobs")
    // measured 61 on two consecutive runs (stable); budget = measured
    // + 6 == the "+2 jobs/batch over 3 batches" drift bound
    assert(jobs <= 67, s"per-batch job overhead crept: $jobs jobs for a 3-batch drain (budget 67)")
  }
}
