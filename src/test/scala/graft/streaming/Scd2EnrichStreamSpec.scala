package graft.streaming

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.operators.{AsOf, Scd}

/** Streaming SCD2 as-of fact enrichment ([[Scd2EnrichStream]]): the
  * multi-batch behaviors the single-batch oracle run cannot see —
  * per-batch snapshot re-read picking up dimension updates made BETWEEN
  * fact batches, late facts resolving to the version valid at their
  * EVENT time, replay convergence of the per-batch OVERWRITE protocol,
  * bootstrap refusal, and the empty-feed branch.
  */
case class Fact(k: Long, ts: Int, id: Long)

class Scd2EnrichStreamSpec extends SparkTestBase {
  import spark.implicits._

  private val factsSchema = Encoders.product[Fact].schema

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  /** Seed dimension: k=1 is "A" from ts=10, k=2 is "X" from ts=10. */
  private def seedDim(dimDir: String): Unit =
    Scd2Stream.scd2UpsertBatch(
      Seq((1L, "A", 10, 1), (2L, "X", 10, 2)).toDF("k", "status", "ts", "tie"),
      dimDir, 0L, Seq("k"), Seq("status"), "ts", Seq("tie"))

  /** Update: k=1 flips to "B" at ts=30 (committed as snapshot v=`batchId`). */
  private def flipK1(dimDir: String, batchId: Long): Unit =
    Scd2Stream.scd2UpsertBatch(
      Seq((1L, "B", 30, 3)).toDF("k", "status", "ts", "tie"),
      dimDir, batchId, Seq("k"), Seq("status"), "ts", Seq("tie"))

  /** Write `facts` as ONE new parquet file under `dir` with an explicit
    * modification time, so the file stream source's maxFilesPerTrigger=1
    * batching processes files in the order this spec wrote them.
    */
  private def addFactsFile(dir: String, facts: Seq[Fact], mtimeSec: Long): Unit = {
    val before = Option(new java.io.File(dir).listFiles()).map(_.toSet).getOrElse(Set.empty)
    facts.toDF().coalesce(1).write.mode("append").parquet(dir)
    for (f <- new java.io.File(dir).listFiles().toSet -- before)
      f.setLastModified(mtimeSec * 1000L)
  }

  private def collectEnriched(df: DataFrame) =
    df.orderBy("id").select("id", "k", "ts", "status", "version").collect().map(_.toSeq).toSeq

  private def batchDirs(outDir: String): Seq[String] =
    Option(new java.io.File(s"$outDir/data").listFiles()).getOrElse(Array.empty)
      .map(_.getName).filter(_.startsWith("batch=")).sorted.toSeq

  test("asOfView: only the last same-instant version is visible as of that instant") {
    val dim = Seq(
      (1L, 10, null, 1L, "A", false),
      (1L, 10, null, 2L, "B", true) // same valid_from, higher version wins
    ).toDF("k", "valid_from", "valid_to", "version", "status", "is_current")
    val view = Scd2EnrichStream.asOfView(dim, "k", "ts", Seq("status"))
    assert(view.collect().map(_.toSeq).toSeq == Seq(Seq(1L, 10, 2L, "B")))
  }

  test("a batch re-reads the latest committed snapshot; facts resolve by EVENT time") {
    val dimDir = tmp("graft_enrich_dim")
    seedDim(dimDir)
    // batch 0 against v=0: k=1 at ts=15 sees "A"
    val b0 = Scd2EnrichStream.enrichBatch(
      Seq(Fact(1L, 15, 100L)).toDF(), dimDir, "k", "ts", Seq("status"))
    assert(collectEnriched(b0) == Seq(Seq(100L, 1L, 15, "A", 1L)))
    // dimension maintained between fact batches: k=1 -> "B" at ts=30
    flipK1(dimDir, 1L)
    // batch 1 re-reads the NEW snapshot: ts=35 resolves to "B" (the
    // update is visible), the LATE fact ts=12 still resolves to "A"
    // (event-time version, not current), an unseen key keeps nulls
    val b1 = Scd2EnrichStream.enrichBatch(
      Seq(Fact(1L, 35, 101L), Fact(1L, 12, 102L), Fact(9L, 50, 103L)).toDF(),
      dimDir, "k", "ts", Seq("status"))
    assert(collectEnriched(b1) == Seq(
      Seq(101L, 1L, 35, "B", 2L),
      Seq(102L, 1L, 12, "A", 1L),
      Seq(103L, 9L, 50, null, null)))
  }

  test("enrichStream drains a multi-file feed as multiple micro-batches = batch as-of") {
    val factsDir = tmp("graft_enrich_facts")
    val dimDir = tmp("graft_enrich_dim2")
    val outDir = s"${tmp("graft_enrich_out")}/run"
    seedDim(dimDir); flipK1(dimDir, 1L)
    val all = Seq(
      Seq(Fact(1L, 15, 100L)),
      Seq(Fact(1L, 35, 101L), Fact(1L, 12, 102L)),
      Seq(Fact(2L, 40, 103L), Fact(3L, 40, 104L)))
    for ((fs, i) <- all.zipWithIndex) addFactsFile(factsDir, fs, 1000000L + i * 60)
    val out = Scd2EnrichStream.enrichStream(spark, factsDir, factsSchema,
      dimDir, outDir, "k", "ts", Seq("status"), maxFilesPerTrigger = Some(1))
    assert(batchDirs(outDir) == Seq("batch=0", "batch=1", "batch=2"),
      s"expected 3 micro-batches, got ${batchDirs(outDir)}")
    val batchTwin = AsOf.asofBackward(all.flatten.toDF(),
      Scd2EnrichStream.asOfView(Scd2Stream.latestSnapshot(spark, dimDir).get,
        "k", "ts", Seq("status")),
      "k", "ts", rightTsOut = "valid_from")
    assert(collectEnriched(out) == collectEnriched(batchTwin))
  }

  test("dimension updated between fact batches: restart picks it up; replay converges") {
    val factsDir = tmp("graft_enrich_facts3")
    val dimDir = tmp("graft_enrich_dim3")
    val outDir = s"${tmp("graft_enrich_out3")}/run"
    seedDim(dimDir)
    addFactsFile(factsDir, Seq(Fact(1L, 15, 100L)), 1000000L)
    addFactsFile(factsDir, Seq(Fact(2L, 20, 101L)), 1000060L)
    val run1 = Scd2EnrichStream.enrichStream(spark, factsDir, factsSchema,
      dimDir, outDir, "k", "ts", Seq("status"), maxFilesPerTrigger = Some(1))
    assert(batchDirs(outDir) == Seq("batch=0", "batch=1"))
    assert(collectEnriched(run1) == Seq(
      Seq(100L, 1L, 15, "A", 1L), Seq(101L, 2L, 20, "X", 1L)))
    // dimension updated while the fact stream is down; new facts arrive
    flipK1(dimDir, 1L)
    addFactsFile(factsDir, Seq(Fact(1L, 35, 102L), Fact(1L, 12, 103L)), 1000120L)
    // restart with the SAME checkpoint: only the new file becomes a batch,
    // enriched against the updated snapshot — post-update event time sees
    // "B", the late fact still lands in its event-time version "A"
    val run2 = Scd2EnrichStream.enrichStream(spark, factsDir, factsSchema,
      dimDir, outDir, "k", "ts", Seq("status"), maxFilesPerTrigger = Some(1))
    assert(batchDirs(outDir) == Seq("batch=0", "batch=1", "batch=2"))
    val expected = Seq(
      Seq(100L, 1L, 15, "A", 1L),
      Seq(101L, 2L, 20, "X", 1L),
      Seq(102L, 1L, 35, "B", 2L),
      Seq(103L, 1L, 12, "A", 1L))
    assert(collectEnriched(run2) == expected)
    // full replay (fresh checkpoint, same outDir): per-batch OVERWRITE
    // dirs converge — same rows, no duplicates, batch count unchanged
    val fs = new org.apache.hadoop.fs.Path(s"$outDir/_checkpoint")
    fs.getFileSystem(spark.sessionState.newHadoopConf()).delete(fs, true)
    val replayed = Scd2EnrichStream.enrichStream(spark, factsDir, factsSchema,
      dimDir, outDir, "k", "ts", Seq("status"), maxFilesPerTrigger = Some(1))
    assert(batchDirs(outDir) == Seq("batch=0", "batch=1", "batch=2"))
    assert(replayed.count() == 4)
    assert(collectEnriched(replayed) == expected)
  }

  test("missing dimension directory is a bootstrap error, not an empty dimension") {
    val dimDir = s"${tmp("graft_enrich_nodim")}/never_written"
    val e = intercept[IllegalStateException] {
      Scd2EnrichStream.enrichStream(spark, tmp("graft_enrich_facts4"), factsSchema,
        dimDir, s"${tmp("graft_enrich_out4")}/run", "k", "ts", Seq("status"))
    }
    assert(e.getMessage.contains("bootstrap"))
    val e2 = intercept[IllegalStateException] {
      Scd2EnrichStream.enrichBatch(Seq(Fact(1L, 15, 1L)).toDF(),
        dimDir, "k", "ts", Seq("status"))
    }
    assert(e2.getMessage.contains("bootstrap"))
  }

  test("an empty feed returns an empty result with the full output schema") {
    val factsDir = tmp("graft_enrich_facts5") // exists, zero files
    val dimDir = tmp("graft_enrich_dim5")
    seedDim(dimDir)
    val out = Scd2EnrichStream.enrichStream(spark, factsDir, factsSchema,
      dimDir, s"${tmp("graft_enrich_out5")}/run", "k", "ts", Seq("status"))
    assert(out.count() == 0)
    assert(out.columns.toSeq == Seq("k", "ts", "id", "valid_from", "version", "status"))
  }
}
