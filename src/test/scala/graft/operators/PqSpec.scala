package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** [[Pq]] — product quantization + ADC shortlist + exact re-rank.
  * Planted clustered corpus (PQ's operating regime): the PQ top-k must
  * EQUAL brute force at the default shortlist; at a full-corpus
  * shortlist it must equal brute force on ANY data (the re-rank covers
  * everything); staged index == in-memory; and the codes must actually
  * compress (the 100 TB story: the scan set is codes, not floats).
  */
class PqSpec extends SparkTestBase {
  import spark.implicits._

  private val dim = 64

  private def randVec(rnd: scala.util.Random): Array[Float] =
    Array.fill(dim)((rnd.nextDouble() * 2 - 1).toFloat)

  private def mix(a: Array[Float], b: Array[Float], wa: Float, wb: Float): Array[Float] =
    a.zip(b).map { case (x, y) => wa * x + wb * y }

  // 6 well-separated clusters of 30 (ids 0..179) — queries are the first
  // member of each cluster, so true neighbors are in-cluster
  private lazy val clustered: DataFrame = {
    val rnd = new scala.util.Random(11L)
    val centers = Array.fill(6)(randVec(rnd))
    (0 until 6).flatMap { c =>
      (0 until 30).map { i =>
        ((c * 30 + i).toLong, mix(centers(c), randVec(rnd), 1f, 0.15f))
      }
    }.toDF("vec_id", "embedding")
  }

  private def rows(df: DataFrame): Seq[Seq[Any]] =
    df.orderBy("query_id", "rank").collect().map(_.toSeq).toSeq

  test("clustered corpus: a shortlist covering the cluster gives EXACT top-k; " +
      "the default shortlist stays in-cluster (the semantic-recall contract)") {
    val queries = clustered.filter(col("vec_id") % 30 === 0)
    val exact = Ann.bruteForceTopK(clustered, queries, 5)
    // Members of one cluster differ by ~0.001 cosine — BELOW ADC
    // resolution by design (codes separate neighbors from background;
    // they do not micro-rank near-identical vectors). The contract is:
    // once the shortlist covers the true neighbor set (factor 8 => 40 >
    // cluster size 30), the exact re-rank makes the final top-k EXACT.
    val deep = Pq.pqTopK(clustered, queries, k = 5, dim = dim, m = 8, ksub = 16,
      shortlistFactor = 8)
    assert(rows(deep).nonEmpty && rows(deep) === rows(exact))
    // at the default factor the top-k may swap near-identical in-cluster
    // ranks, but must never leave the cluster (what a SemDeDup-style
    // consumer actually needs from ANN)
    val dflt = Pq.pqTopK(clustered, queries, k = 5, dim = dim, m = 8, ksub = 16)
    val inCluster = dflt.select(col("query_id"), col("neighbor_id"))
      .collect().forall(r => r.getLong(0) / 30 == r.getLong(1) / 30)
    assert(inCluster, "default-shortlist neighbors must stay within the query's cluster")
  }

  test("full-corpus shortlist degenerates to exact brute force on RANDOM data") {
    val rnd = new scala.util.Random(13L)
    val random = (0L until 120L).map(i => (i, randVec(rnd))).toDF("vec_id", "embedding")
    val queries = random.filter(col("vec_id") < 4)
    // shortlistFactor * k >= corpus size => the re-rank sees every row
    val pq = Pq.pqTopK(random, queries, k = 5, dim = dim, m = 8, ksub = 16,
      shortlistFactor = 24)
    val exact = Ann.bruteForceTopK(random, queries, 5)
    assert(rows(pq) === rows(exact))
  }

  test("IVF+PQ: nprobe=nlist == flat PQ searchIndex; clustered nprobe=2 == " +
      "exact brute force; unprobed cells pruned at the file listing") {
    val flatDir = java.nio.file.Files.createTempDirectory("graft_pq_flat").toString
    val ivfDir = java.nio.file.Files.createTempDirectory("graft_ivfpq").toString
    Pq.writeIndex(clustered, flatDir, dim = dim, m = 8, ksub = 16)
    Pq.writeIvfPqIndex(clustered, ivfDir, dim = dim, m = 8, ksub = 16, nlist = 6)
    val queries = clustered.filter(col("vec_id") % 30 === 0)
    // all cells probed => candidate set == flat scan => identical rows
    val all = Pq.searchIvfPqIndex(spark, ivfDir, queries, k = 5, nprobe = 6,
      shortlistFactor = 8)
    val flat = Pq.searchIndex(spark, flatDir, queries, k = 5, shortlistFactor = 8)
    assert(rows(all) === rows(flat))
    // clustered regime at nprobe=2: the query's own cell dominates; with
    // a cluster-covering shortlist the result is exactly brute force
    val pruned = Pq.searchIvfPqIndex(spark, ivfDir, queries, k = 5, nprobe = 2,
      shortlistFactor = 8)
    assert(rows(pruned) === rows(Ann.bruteForceTopK(clustered, queries, 5)))
    // partition pruning: the code scan's PartitionFilters lists probed
    // cells (the IvfSpec pin, over 32x-smaller rows)
    val scan = pruned.queryExecution.executedPlan.toString
      .linesIterator.find(_.contains("FileScan parquet"))
      .getOrElse(fail("no FileScan in IVF+PQ plan"))
    assert("""PartitionFilters: \[[^\]]*cell#\d+ IN""".r.findFirstIn(scan).isDefined,
      s"IVF+PQ code scan lacks cell-pruning PartitionFilters: $scan")
  }

  test("staged index path == in-memory path; codes genuinely compress") {
    val dir = java.nio.file.Files.createTempDirectory("graft_pq").toString
    Pq.writeIndex(clustered, dir, dim = dim, m = 8, ksub = 16)
    val queries = clustered.filter(col("vec_id") % 30 === 0)
    val staged = Pq.searchIndex(spark, dir, queries, k = 5)
    val mem = Pq.pqTopK(clustered, queries, k = 5, dim = dim, m = 8, ksub = 16)
    assert(rows(staged) === rows(mem))
    // compression contract: the scan set (codes) must be a fraction of
    // the float payload (8 ints vs 64 floats per row pre-encoding;
    // parquet overhead keeps the on-disk ratio looser than 8x)
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(spark.sessionState.newHadoopConf())
    def bytes(p: String): Long =
      fs.getContentSummary(new org.apache.hadoop.fs.Path(p)).getLength
    assert(bytes(s"$dir/codes") * 2 < bytes(s"$dir/vecs"),
      s"codes ${bytes(s"$dir/codes")} B should be well under half of vecs ${bytes(s"$dir/vecs")} B")
  }
}
