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

  /** Shortlist recall vs exact brute force: fraction of a query's true
    * top-k the searcher's top-k covers, averaged over queries.
    */
  private def recallAtK(got: DataFrame, exact: DataFrame, k: Int): Double = {
    def sets(df: DataFrame): Map[Long, Set[Long]] =
      df.select("query_id", "neighbor_id").collect()
        .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val g = sets(got); val e = sets(exact)
    e.map { case (q, t) => (g.getOrElse(q, Set.empty) & t).size.toDouble / t.size }
      .sum / e.size
  }

  test("by_residual=true beats raw coding at the same tight m/ksub on clustered data") {
    // the residual regime: the signal that separates a query's TRUE
    // neighbors is WITHIN-cell displacement. Plant 6 clusters x 3
    // subgroups x 10: members = center + 0.3*subgroup-direction + 0.05*
    // noise, so a query's true top-9 are its subgroup-mates. Residual
    // books spend their whole budget on the subgroup displacement (the
    // centroid is subtracted); raw books at m=4/ksub=4 (4 centroids per
    // 16-dim subspace) must span the 6 dispersed cluster centers and blur
    // the subgroup structure. Shortlist factor 1 makes the ADC stage's
    // recall the measured quantity (no re-rank rescue).
    // centers at 3x scale: the raw books' per-subspace variance is
    // dominated by BETWEEN-cluster separation (6 dispersed centers vs 4
    // centroids), so subgroup displacement is below raw code resolution
    // by construction while residual codes see nothing else
    val rnd = new scala.util.Random(17L)
    val centers = Array.fill(6)(randVec(rnd))
    // displacement directions SHARED across clusters — the residual
    // distribution is 3 clean blobs a tiny codebook separates, while the
    // raw distribution is 18 cluster x subgroup positions it cannot
    val subdirs = Array.fill(3)(randVec(rnd))
    // ids INTERLEAVE subgroups (id = c*30 + i*3 + g): same-cluster rows
    // whose codes collide tie in ADC score, and a tie-break that follows
    // ids must not accidentally follow subgroups — raw coding has to earn
    // its recall from the codes, not the layout. UNIT-NORM vectors: the
    // ADC stage ranks by inner product while the ground truth is cosine;
    // on the sphere the two agree, so the measured difference is coding
    // quality, not metric mismatch.
    def unit(v: Array[Float]): Array[Float] = {
      val n = math.sqrt(v.foldLeft(0.0)((a, x) => a + x.toDouble * x)).toFloat
      v.map(_ / n)
    }
    val structured = (0 until 6).flatMap { c =>
      (0 until 3).flatMap { g =>
        (0 until 10).map { i =>
          val v = unit(mix(mix(centers(c), subdirs(g), 3f, 0.3f), randVec(rnd), 1f, 0.02f))
          ((c * 30 + i * 3 + g).toLong, v)
        }
      }
    }.toDF("vec_id", "embedding")
    // nlist=12 > 6 clusters: cells must be FINER than clusters — a cell
    // merging two clusters puts its mean between them, and residuals then
    // carry cluster-level displacement that drowns the subgroup signal
    // (coarse-quantizer quality is a precondition of residual coding, not
    // its subject). nprobe = nlist so the candidate set is the whole
    // corpus for both variants and only coding quality differs.
    val rawDir = java.nio.file.Files.createTempDirectory("graft_ivfpq_raw").toString
    val resDir = java.nio.file.Files.createTempDirectory("graft_ivfpq_res").toString
    Pq.writeIvfPqIndex(structured, rawDir, dim = dim, m = 4, ksub = 4, nlist = 12)
    Pq.writeIvfPqIndex(structured, resDir, dim = dim, m = 4, ksub = 4, nlist = 12,
      byResidual = true)
    assert(!spark.read.parquet(s"$rawDir/meta").head().getAs[Boolean]("by_residual"))
    assert(spark.read.parquet(s"$resDir/meta").head().getAs[Boolean]("by_residual"))
    val queries = structured.filter(col("vec_id") % 30 === 0) // first member of subgroup 0
    val exact = Ann.bruteForceTopK(structured, queries, 9)
    val raw = Pq.searchIvfPqIndex(spark, rawDir, queries, k = 9, nprobe = 12,
      shortlistFactor = 1)
    val res = Pq.searchIvfPqIndex(spark, resDir, queries, k = 9, nprobe = 12,
      shortlistFactor = 1)
    val rRaw = recallAtK(raw, exact, 9)
    val rRes = recallAtK(res, exact, 9)
    info(f"recall@9 at m=4/ksub=4/shortlist=1x: raw=$rRaw%.3f residual=$rRes%.3f")
    assert(rRes >= rRaw + 0.1,
      f"residual coding must measurably beat raw at fixed budget here: raw=$rRaw%.3f res=$rRes%.3f")
    assert(rRes >= 0.8, f"residual recall@9 too low on its home regime: $rRes%.3f")
  }

  test("appendToIvfPqIndex: stored quantizers untouched, appended rows searchable, " +
      "replay-idempotent") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ivfpq_app").toString
    val corpusPart = clustered.filter(col("vec_id") < 150)
    val increment = clustered.filter(col("vec_id") >= 150)
    Pq.writeIvfPqIndex(corpusPart, dir, dim = dim, m = 8, ksub = 16, nlist = 5,
      byResidual = true)
    val booksBefore = spark.read.parquet(s"$dir/books").orderBy("j", "k")
      .collect().map(_.toSeq).toSeq
    val centsBefore = spark.read.parquet(s"$dir/centroids").orderBy("cell")
      .collect().map(_.toSeq).toSeq
    Pq.appendToIvfPqIndex(increment, dir, seg = Some("batch-0"))
    // nothing retrained on append
    assert(spark.read.parquet(s"$dir/books").orderBy("j", "k")
      .collect().map(_.toSeq).toSeq === booksBefore)
    assert(spark.read.parquet(s"$dir/centroids").orderBy("cell")
      .collect().map(_.toSeq).toSeq === centsBefore)
    // a query whose true neighbors live in the APPENDED cluster (ids
    // 150..179) finds them: the probe reads appended code segments
    val queries = clustered.filter(col("vec_id") === 150L)
    val got = Pq.searchIvfPqIndex(spark, dir, queries, k = 5, nprobe = 5,
      shortlistFactor = 8)
    val exact = Ann.bruteForceTopK(clustered, queries, 5)
    assert(rows(got) === rows(exact),
      "appended increment must be searchable through the stored quantizers")
    // replay of the same segment is a no-op: identical results, one segment
    Pq.appendToIvfPqIndex(increment, dir, seg = Some("batch-0"))
    assert(graft.sources.Segments.liveSegs(spark, dir) === Seq("batch-0"))
    assert(rows(Pq.searchIvfPqIndex(spark, dir, queries, k = 5, nprobe = 5,
      shortlistFactor = 8)) === rows(exact))
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
