package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.Tables

/** The persisted hyperplane-LSH embedding index (q78): incremental probe
  * parity with the in-memory operator, index-only reads, and meta-driven
  * parameters — the embedding mirror of [[MinhashIndexSpec]].
  */
class EmbeddingIndexSpec extends SparkTestBase {

  private val sfDir = "/root/testdata/sf0.01"
  private def haveTestdata = new java.io.File(s"$sfDir/embeddings.parquet").exists()
  private val split = 250L

  private def buildIndex(emb: org.apache.spark.sql.DataFrame,
      planes: Int = 6, tables: Int = 24, seed: Long = 42L): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_emb_index").toString
    Dedup.writeEmbeddingIndex(emb, dir, planes = planes, tables = tables, seed = seed)
    dir
  }

  test("incremental pairs == full-run LSH pairs restricted to those touching the increment") {
    assume(haveTestdata)
    val emb = Tables.embeddings(spark, sfDir)
    val dir = buildIndex(emb.filter(col("vec_id") < split))
    val inc = Dedup.incrementalEmbeddingNearDupPairs(spark, dir,
        emb.filter(col("vec_id") >= split), threshold = 0.5)
      .orderBy("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val full = Dedup.embeddingNearDupLsh(emb, threshold = 0.5,
        planes = 6, tables = 24, probeRadius = 1)
      .orderBy("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
      .filter(p => p._1 >= split || p._2 >= split)
    assert(full.nonEmpty, "testdata should contain at least one pair touching the increment")
    assert(inc == full, s"incremental $inc vs full-restricted $full")
    // no corpus-vs-corpus pair may surface on the incremental path
    assert(inc.forall(p => p._1 >= split || p._2 >= split))
  }

  test("the incremental path reads ONLY the index — never the corpus source table") {
    assume(haveTestdata)
    val corpusDir =
      java.nio.file.Files.createTempDirectory("graft_emb_corpus").toString + "/emb"
    Tables.embeddings(spark, sfDir).filter(col("vec_id") < split).write.parquet(corpusDir)
    val dir = buildIndex(spark.read.parquet(corpusDir))
    val frame = Dedup.incrementalEmbeddingNearDupPairs(spark, dir,
      Tables.embeddings(spark, sfDir).filter(col("vec_id") >= split), threshold = 0.5)
    val files = frame.inputFiles.filterNot(_.contains("embeddings.parquet"))
    assert(files.nonEmpty)
    assert(!files.exists(_.contains("graft_emb_corpus")),
      "search plan reads the corpus embeddings themselves")
    assert(files.forall(_.contains(dir.substring(dir.lastIndexOf('/') + 1))),
      s"search plan reads outside the index: ${files.take(3).toSeq}")
  }

  test("candidate generation is widened: both the increment and the streamed " +
      "base side pass ScaleOut (r7 perf root cause — a 2-split base side " +
      "serialized millions of candidate rows onto 2 cores)") {
    assume(haveTestdata)
    val emb = Tables.embeddings(spark, sfDir)
    val dir = buildIndex(emb.filter(col("vec_id") < split))
    val frame = Dedup.incrementalEmbeddingNearDupPairs(spark, dir,
      emb.filter(col("vec_id") >= split), threshold = 0.5)
    val phys = frame.queryExecution.executedPlan.toString
    val widens = phys.linesIterator.count(_.contains("RoundRobinPartitioning"))
    assert(widens >= 2,
      s"expected ScaleOut widens on the increment AND the index bucket scan " +
        s"(tiny inputs in local test => both must repartition); found $widens:\n" +
        phys.linesIterator.filter(_.contains("Exchange")).mkString("\n"))
  }

  test("appendToEmbeddingIndex keeps the index current: a second increment's " +
      "probe pairs against appended vectors, and equals a from-scratch index " +
      "over corpus+first-increment") {
    assume(haveTestdata)
    val emb = Tables.embeddings(spark, sfDir)
    val firstInc = emb.filter(col("vec_id") >= split && col("vec_id") < 400)
    val secondInc = emb.filter(col("vec_id") >= 400)
    // ingest: probe-then-append the first increment
    val dir = buildIndex(emb.filter(col("vec_id") < split))
    Dedup.incrementalEmbeddingNearDupPairs(spark, dir, firstInc, threshold = 0.5).collect()
    Dedup.appendToEmbeddingIndex(firstInc, dir)
    val grown = Dedup.incrementalEmbeddingNearDupPairs(spark, dir, secondInc, threshold = 0.5)
      .collect().map(_.toSeq).toSet
    // reference: an index built from scratch over corpus + first increment
    val refDir = buildIndex(emb.filter(col("vec_id") < 400))
    val ref = Dedup.incrementalEmbeddingNearDupPairs(spark, refDir, secondInc, threshold = 0.5)
      .collect().map(_.toSeq).toSet
    assert(grown === ref, "appended index must behave exactly like a rebuilt one")
  }

  test("probe parameters come from the index meta, surviving non-default builds") {
    assume(haveTestdata)
    val emb = Tables.embeddings(spark, sfDir)
    val dir = buildIndex(emb.filter(col("vec_id") < split),
      planes = 5, tables = 30, seed = 7L)
    val inc = Dedup.incrementalEmbeddingNearDupPairs(spark, dir,
        emb.filter(col("vec_id") >= split), threshold = 0.5)
      .orderBy("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    // fewer planes / more tables = an even higher-recall configuration:
    // the exact twin's increment-touching pairs must all be present
    val exact = Dedup.embeddingNearDupExact(emb, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      .filter(p => p._1 >= split || p._2 >= split)
    assert(exact.nonEmpty)
    assert(exact.subsetOf(inc) && inc == exact)
  }
}
