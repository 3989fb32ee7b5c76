package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

import graft.SparkTestBase
import graft.operators.Dedup

/** [[MinhashIngestStream]] — the streamed ingest must equal the
  * single-shot probe (batch boundaries invisible), catch pairs planted
  * ACROSS micro-batches, and leave the index genuinely grown (a later
  * increment probes against what the stream appended).
  */
class MinhashIngestStreamSpec extends SparkTestBase {
  import spark.implicits._

  private val feedSchema = StructType(Seq(
    StructField("doc_id", LongType), StructField("text", StringType)))

  private val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " +
    "lambda mu nu xi omicron pi rho sigma tau upsilon phi chi"

  // corpus doc 0 and increment docs 100/102 are a near-dup chain built by
  // APPENDING one word per step (J = |shared|/|larger| ≈ 0.91-0.95 at
  // 3-shingles, all >= 0.8); 1 and 101 are unrelated background
  private lazy val corpus = Seq(
    (0L, base),
    (1L, "totally different subject matter about cooking pasta with fresh " +
      "tomato sauce basil leaves and olive oil for dinner tonight")
  ).toDF("doc_id", "text")

  private val inc = Seq(
    (100L, s"$base extra1"),
    (101L, "another unrelated document describing mountain hiking trails " +
      "weather conditions and camping equipment for the summer season"),
    (102L, s"$base extra1 extra2"))

  private def tmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_ingest_$tag").toString

  private def pairSet(df: DataFrame): Set[(Long, Long)] =
    df.select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("3-batch drain == single-shot probe; cross-batch pair caught; index grows") {
    val indexDir = tmp("idx")
    Dedup.writeMinhashIndex(corpus, indexDir)
    // feed: one file per APPEND write => one doc per micro-batch, with
    // the 100/102 near-dup pair split across batches 1 and 3
    val feedDir = tmp("feed")
    inc.foreach { doc =>
      Seq(doc).toDF("doc_id", "text")
        .coalesce(1).write.mode("append").parquet(feedDir)
    }
    val streamed = MinhashIngestStream.ingest(
      spark, feedDir, feedSchema, indexDir, tmp("out"), tmp("ckpt"),
      threshold = 0.8, maxFilesPerTrigger = Some(1))
    // reference: a single-shot probe against a FRESH copy of the corpus
    // index (the streamed one has mutated)
    val refIndexDir = tmp("refidx")
    Dedup.writeMinhashIndex(corpus, refIndexDir)
    val oneShot = Dedup.incrementalNearDupPairs(
      spark, refIndexDir, inc.toDF("doc_id", "text"), threshold = 0.8)
    assert(streamed.collect().map(_.toSeq).toSet ===
      oneShot.collect().map(_.toSeq).toSet)
    val got = pairSet(streamed)
    assert(got.contains((100L, 102L)),
      s"cross-batch near-dup pair must be caught: $got")
    assert(got.contains((0L, 100L)), s"corpus-vs-increment pair missing: $got")
    assert(!got.contains((0L, 1L)), "corpus-vs-corpus pair must never surface")
    // the stream appended its batches: a SECOND increment's probe against
    // the mutated index pairs with a doc the STREAM ingested (102), which
    // the original corpus index never contained
    val second = Dedup.incrementalNearDupPairs(
      spark, indexDir, Seq((200L, s"$base extra1 extra2 extra3")).toDF("doc_id", "text"),
      threshold = 0.8)
    assert(pairSet(second).contains((102L, 200L)),
      s"index did not grow with the ingested batches: ${pairSet(second)}")
  }
}
