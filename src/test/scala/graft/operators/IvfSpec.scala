package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** IVF ANN on a planted clustered corpus — the regime IVF is designed
  * for (training-data embedding corpora cluster by topic/source). The
  * quantizer must align cells with clusters well enough that probing a
  * few cells recovers in-cluster nearest neighbors; with nprobe = nlist
  * the operator degenerates to an exact scan and must reproduce brute
  * force verbatim.
  */
class IvfSpec extends SparkTestBase {
  import spark.implicits._

  private val dim = 32
  private val nClusters = 12
  private val perCluster = 40

  // deterministic clustered corpus: nClusters unit centers, members =
  // center + 15% noise (in-cluster cos ~0.97, cross-cluster ~0.2)
  private lazy val corpus = {
    val rnd = new scala.util.Random(11L)
    def randVec(): Array[Float] = Array.fill(dim)((rnd.nextDouble() * 2 - 1).toFloat)
    val centers = Array.fill(nClusters)(randVec())
    (0 until nClusters).flatMap { c =>
      (0 until perCluster).map { i =>
        val noise = randVec()
        val v = centers(c).zip(noise).map { case (x, e) => x + 0.15f * e }
        ((c * perCluster + i).toLong, v)
      }
    }.toDF("vec_id", "embedding")
  }

  private def pairs(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet

  test("ivfTopK recall@5 >= 0.9 vs brute force at nprobe=3/nlist=16 on clustered data") {
    val queries = corpus.filter(col("vec_id") % perCluster === 0)
    val exact = pairs(Ann.bruteForceTopK(corpus, queries, k = 5))
    val ivf = pairs(Ivf.ivfTopK(corpus, queries, k = 5,
      nlist = 16, nprobe = 3, iters = 3, seed = 42L))
    val recall = (exact & ivf).size.toDouble / exact.size
    info(f"recall@5 = $recall%.3f (${(exact & ivf).size}/${exact.size})")
    assert(recall >= 0.9)
  }

  test("ivfTopK with nprobe = nlist reproduces brute-force top-k verbatim") {
    val queries = corpus.filter(col("vec_id") < 5)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("rank"),
        r.getAs[Long]("neighbor_id"), r.getAs[Double]("cosine"))).toSet
    val exact = rows(Ann.bruteForceTopK(corpus, queries, k = 5))
    val ivf = rows(Ivf.ivfTopK(corpus, queries, k = 5, nlist = 8, nprobe = 8))
    assert(ivf == exact)
  }

  test("persisted index reproduces in-memory ivfTopK and prunes unprobed cells") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ivf").toString
    // a SMALL query batch so the probed-cell union stays well below nlist
    // and pruning is observable, not just present
    val queries = corpus.filter(col("vec_id").isin(0L, perCluster.toLong))
    Ivf.writeIndex(corpus, dir, nlist = 16, iters = 3, seed = 42L)
    val viaIndex = Ivf.searchIndex(spark, dir, queries, k = 5, nprobe = 2)
    val inMemory = Ivf.ivfTopK(corpus, queries, k = 5, nlist = 16, nprobe = 2,
      iters = 3, seed = 42L)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("rank"),
        r.getAs[Long]("neighbor_id"))).toSet
    assert(rows(viaIndex) == rows(inMemory))
    // the probed-cell set must prune the corpus scan down to the probed
    // partitions: PartitionFilters carries `cell INSET ...` with at most
    // queries x nprobe cells, strictly fewer than nlist
    val plan = viaIndex.queryExecution.executedPlan.toString
    val scanLine = plan.linesIterator.find(_.contains("FileScan parquet"))
      .getOrElse(fail(s"no FileScan in plan:\n${plan.take(1500)}"))
    val pf = """PartitionFilters: \[([^\]]*)""".r.findFirstMatchIn(scanLine)
      .map(_.group(1)).getOrElse(fail(s"no PartitionFilters in scan: $scanLine"))
    // small probe sets print as `cell IN (...)`, larger ones as
    // `cell INSET ...` — accept either, but the listed cell count must
    // stay <= queries x nprobe
    val nCells = """cell#\d+ IN(?:SET)? \(?([0-9, ]+)""".r.findFirstMatchIn(pf)
      .map(_.group(1).split(",").length).getOrElse(0)
    assert(nCells > 0, s"no cell pruning predicate in: $pf")
    assert(nCells <= 4 && nCells < 16, s"expected <=4 probed cells, scan lists $nCells in: $pf")
  }

  test("q46 (persisted-index search) reproduces q39 (in-memory IVF) with pruning wired") {
    val sfDir = "/root/testdata/sf0.001"
    assume(new java.io.File(s"$sfDir/embeddings.parquet").exists())
    val q39 = graft.SparkEntry.queries("q39_ann_topk_ivf")(spark, sfDir)
    val q46 = graft.SparkEntry.queries("q46_ann_topk_ivf_index")(spark, sfDir)
    // identical quantizer params + seed -> identical rows, ordered
    assert(q46.collect().toSeq == q39.collect().toSeq)
    // the query path must scan through the partition-pruning predicate
    // (selectivity itself is pinned by the small-batch test above; a
    // 10-query batch here may legitimately probe most cells)
    val scan = q46.queryExecution.executedPlan.toString
      .linesIterator.find(_.contains("FileScan parquet"))
      .getOrElse(fail("no FileScan in q46's plan"))
    assert("""PartitionFilters: \[[^\]]*cell#\d+ IN""".r.findFirstIn(scan).isDefined,
      s"q46 scan lacks cell-pruning PartitionFilters: $scan")
  }

  test("trainCentroids is deterministic and returns unit-norm centroids") {
    val a = Ivf.trainCentroids(corpus, nlist = 8, iters = 2, seed = 7L)
    val b = Ivf.trainCentroids(corpus, nlist = 8, iters = 2, seed = 7L)
    assert(a.length == 8)
    a.foreach { c =>
      val n = math.sqrt(c.map(x => x.toDouble * x).sum)
      assert(math.abs(n - 1.0) < 1e-3, s"centroid norm $n not unit")
    }
    // same seed -> same quantizer (byte-identical floats)
    assert(a.zip(b).forall { case (x, y) => x.sameElements(y) })
  }
}
