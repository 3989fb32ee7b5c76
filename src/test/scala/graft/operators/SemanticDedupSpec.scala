package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Semantic (k-means-cell) near-dup — the SemDeDup shape. Planted
  * clustered corpus as in [[IvfSpec]], with near-dup pairs planted both
  * WITHIN clusters (the regime the operator is designed for) and ON a
  * cell boundary (the regime single assignment provably misses — the
  * testdata's one qualifying pair is exactly this shape, which is why
  * q87 runs with nassign > 1).
  */
class SemanticDedupSpec extends SparkTestBase {
  import spark.implicits._

  private val dim = 32

  private def randVec(rnd: scala.util.Random): Array[Float] =
    Array.fill(dim)((rnd.nextDouble() * 2 - 1).toFloat)

  private def mix(a: Array[Float], b: Array[Float], wa: Float, wb: Float): Array[Float] =
    a.zip(b).map { case (x, y) => wa * x + wb * y }

  // 6 well-separated clusters of 30; ids 0..179. Near-dup plants:
  //   - within-cluster: member i=1 of each cluster = member i=0 + 2% noise
  //   - boundary: ids 1000/1001 straddle the Voronoi boundary between
  //     cluster 0 and cluster 1 ASYMMETRICALLY (0.45/0.55 vs 0.55/0.45
  //     mixtures): for near-orthogonal centers their mutual cosine is
  //     ~0.98 but their NEAREST centroids differ — the pair shape a
  //     single-assignment join cannot see. (A symmetric 50/50 plant
  //     would not do: two near-identical vectors always share a nearest
  //     centroid.)
  private lazy val corpus: DataFrame = {
    val rnd = new scala.util.Random(7L)
    val centers = Array.fill(6)(randVec(rnd))
    val members = (0 until 6).flatMap { c =>
      val base = (0 until 30).map { i =>
        val v = mix(centers(c), randVec(rnd), 1f, 0.15f)
        ((c * 30 + i).toLong, v)
      }
      val dup = (base(1)._1, mix(base(0)._2, randVec(rnd), 1f, 0.02f))
      base.updated(1, dup)
    }
    val boundary = Seq(
      (1000L, mix(mix(centers(0), centers(1), 0.45f, 0.55f), randVec(rnd), 1f, 0.01f)),
      (1001L, mix(mix(centers(0), centers(1), 0.55f, 0.45f), randVec(rnd), 1f, 0.01f)))
    (members ++ boundary).toDF("vec_id", "embedding")
  }

  private def pairSet(df: DataFrame): Set[(Long, Long)] =
    df.select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  private def exact(threshold: Double): DataFrame =
    Dedup.embeddingNearDupExact(corpus, threshold = threshold)

  test("semanticNearDupPairs == exact twin on planted clusters (nassign=2)") {
    val sem = Dedup.semanticNearDupPairs(corpus,
      threshold = 0.9, nlist = 8, nassign = 2)
    val want = exact(0.9)
    assert(pairSet(want).nonEmpty, "plant failed: no qualifying pairs")
    assert(pairSet(sem) === pairSet(want))
    // full rows (incl. rounded cosine) must match, not just the id pairs
    val semRows = sem.collect().map(_.toSeq).toSet
    val wantRows = want.collect().map(_.toSeq).toSet
    assert(semRows === wantRows)
  }

  test("boundary pair: single assignment misses it, multi-assignment catches it") {
    val boundary = (1000L, 1001L)
    // nlist = the planted cluster count, so the quantizer has no spare
    // centroid to park on the boundary region itself
    val one = Dedup.semanticNearDupPairs(corpus,
      threshold = 0.9, nlist = 6, nassign = 1)
    val two = Dedup.semanticNearDupPairs(corpus,
      threshold = 0.9, nlist = 6, nassign = 2)
    assert(pairSet(exact(0.9)).contains(boundary), "plant failed: boundary pair not a near-dup")
    assert(pairSet(two).contains(boundary))
    // the planted boundary pair is only a REGRESSION canary for the
    // multi-assign rationale if single-assign can actually split it;
    // pinned so a quantizer change that silently alters the geometry
    // fails loudly instead of invisibly.
    assert(!pairSet(one).contains(boundary),
      "quantizer geometry changed: boundary pair now co-assigned at nassign=1 — " +
        "re-plant the boundary case so the multi-assignment rationale stays tested")
  }

  test("nassign = nlist degenerates to the exact twin verbatim") {
    val all = Dedup.semanticNearDupPairs(corpus,
      threshold = 0.5, nlist = 4, nassign = 4)
    assert(pairSet(all) === pairSet(exact(0.5)))
  }

  test("plan: cell-keyed equi join, no cartesian / nested-loop all-pairs") {
    val sem = Dedup.semanticNearDupPairs(corpus,
      threshold = 0.9, nlist = 8, nassign = 2)
    val plan = sem.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("staged index path == in-memory path (quantizer trains at build, not per run)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_sem_index").toString
    Dedup.writeSemanticIndex(corpus, dir, nlist = 8, nassign = 2)
    val staged = Dedup.semanticNearDupPairsFromIndex(spark, dir, threshold = 0.9)
    val mem = Dedup.semanticNearDupPairs(corpus, threshold = 0.9, nlist = 8, nassign = 2)
    assert(staged.collect().map(_.toSeq).toSet === mem.collect().map(_.toSeq).toSet)
  }

  test("incremental probe == full-from-index restricted to increment-touching " +
      "pairs; no corpus-vs-corpus pair surfaces") {
    val split = 90L // clusters 0-2 = corpus, 3-5 + boundary ids = increment
    val dir = java.nio.file.Files.createTempDirectory("graft_sem_corpus_idx").toString
    Dedup.writeSemanticIndex(corpus.filter(col("vec_id") < split), dir,
      nlist = 4, nassign = 2)
    val probe = Dedup.incrementalSemanticNearDupPairs(spark, dir,
      corpus.filter(col("vec_id") >= split), threshold = 0.9)
    val got = probe.collect().map(_.toSeq).toSet
    // the reference: assign the FULL corpus with the same stored
    // quantizer (cells from the index, increment assigned on the fly),
    // then restrict to increment-touching pairs — i.e. exactly the full
    // audit the probe claims to be a restriction of
    val assignedAll = spark.read.parquet(s"$dir/assigned").unionByName {
      val cents = spark.read.parquet(s"$dir/centroids")
        .orderBy("cell").collect().map(_.getSeq[Float](1).toArray)
      corpus.filter(col("vec_id") >= split)
        .select(col("vec_id").as("id"), col("embedding").as("vec"))
        .select(col("id"), col("vec"), explode(
          graft.functions.expr.VectorFunctions.nearestCells(
            col("vec"), cents, 2)).as("cell"))
    }
    val full = Dedup.cellPairScore(assignedAll, threshold = 0.9)
      .filter(col("id_a") >= split || col("id_b") >= split)
      .collect().map(_.toSeq).toSet
    assert(got.nonEmpty && got === full)
    assert(!got.exists(r =>
      r(0).asInstanceOf[Long] < split && r(1).asInstanceOf[Long] < split))
  }

  test("appendToSemanticIndex keeps the index current: a second increment's " +
      "probe pairs against appended vectors using the ORIGINAL (unretrained) " +
      "quantizer") {
    val split = 90L
    val dir = java.nio.file.Files.createTempDirectory("graft_sem_append").toString
    Dedup.writeSemanticIndex(corpus.filter(col("vec_id") < split), dir,
      nlist = 4, nassign = 2)
    val centsBefore = spark.read.parquet(s"$dir/centroids")
      .orderBy("cell").collect().map(_.getSeq[Float](1).toSeq)
    // cluster 4 (ids 120-149) is SPLIT across the two increments, so
    // cross-increment within-cluster pairs exist by construction
    val firstInc = corpus.filter(col("vec_id") >= split && col("vec_id") < 135)
    val secondInc = corpus.filter(col("vec_id") >= 135)
    Dedup.appendToSemanticIndex(firstInc, dir)
    // the quantizer must NOT have retrained on append
    val centsAfter = spark.read.parquet(s"$dir/centroids")
      .orderBy("cell").collect().map(_.getSeq[Float](1).toSeq)
    assert(centsBefore.toSeq === centsAfter.toSeq)
    val got = Dedup.incrementalSemanticNearDupPairs(spark, dir, secondInc, threshold = 0.9)
      .collect().map(_.toSeq).toSet
    // the grown-index witness: a cluster-4 pair with its low side in the
    // FIRST increment [120, 135) and high side in the second (>= 135) —
    // visible only because the append put the first increment's rows in
    // the index the second increment probes
    assert(got.exists(r => {
      val a = r(0).asInstanceOf[Long]; val b = r(1).asInstanceOf[Long]
      a >= 120L && a < 135L && b >= 135L && b < 150L
    }), s"no pair against appended first-increment members: ${got.size} pairs")
  }

  test("semanticDrift: planted drifted increment fires; in-distribution does not") {
    val dir = java.nio.file.Files.createTempDirectory("graft_sem_drift").toString
    Dedup.writeSemanticIndex(corpus, dir, nlist = 4, nassign = 2)
    val meta = spark.read.parquet(s"$dir/meta").head()
    assert(meta.getAs[Double]("train_mean_dist") > 0.0)
    assert(meta.getAs[Long]("train_n") === corpus.count())
    val rnd = new scala.util.Random(99L)
    // in-distribution: more members of the trained clusters; drifted: a
    // vector 10x outside the training envelope (a new modality/scale —
    // exactly what a no-retrain append must surface)
    val inDist = corpus.limit(5)
      .select(col("vec_id") + 5000L as "vec_id", col("embedding"))
    val far = Seq((9000L, Array.fill(dim)((rnd.nextDouble() * 20 - 10).toFloat).toSeq))
      .toDF("vec_id", "embedding")
    val drift = Dedup.semanticDrift(spark, dir, inDist.unionByName(far))
      .collect().map(r => r.getLong(0) ->
        ((r.getInt(1), r.getDouble(2), r.getDouble(3)))).toMap
    val (farCell, farDist, farDrift) = drift(9000L)
    assert(farCell >= 0 && farCell < 4)
    assert(farDist > 0.0)
    assert(farDrift > 3.0, s"planted out-of-distribution vector must fire: $farDrift")
    val inDrifts = drift.view.filterKeys(_ < 9000L).values.map(_._3)
    assert(inDrifts.forall(d => d > 0.0 && d < 2.0),
      s"in-distribution members must score near the train mean: ${inDrifts.toList}")
  }

  test("semanticDrift arithmetic == the declarative double fold (oracle contract)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_sem_drift2").toString
    Dedup.writeSemanticIndex(corpus, dir, nlist = 4, nassign = 2)
    val trainMean = spark.read.parquet(s"$dir/meta").head().getAs[Double]("train_mean_dist")
    val cents = spark.read.parquet(s"$dir/centroids")
      .orderBy("cell").collect().map(_.getSeq[Float](1).toArray)
    val inc = corpus.limit(20)
    val got = Dedup.semanticDrift(spark, dir, inc)
      .collect().map(r => r.getLong(0) ->
        ((r.getInt(1), r.getDouble(2), r.getDouble(3)))).toMap
    // reference: the same sqrt(vv - 2*vc + cc) sequential-double fold,
    // computed independently — what the generated SQL oracle replays
    inc.collect().foreach { r =>
      val id = r.getLong(0)
      val v = r.getSeq[Float](1).toArray
      val vv = v.foldLeft(0.0)((a, x) => a + x.toDouble * x.toDouble)
      val d2s = cents.map { c =>
        var vc = 0.0
        var k = 0
        while (k < v.length) { vc += v(k).toDouble * c(k).toDouble; k += 1 }
        vv - 2.0 * vc + graft.functions.expr.DriftOps.selfDot(c)
      }
      val best = d2s.indexOf(d2s.min)
      val dist = math.sqrt(math.max(d2s.min, 0.0))
      def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(got(id) === ((best, r6(dist), r6(dist / trainMean))),
        s"drift mismatch for vec $id")
    }
  }

  test("the incremental probe reads ONLY the index — never the corpus source") {
    val split = 90L
    val srcDir = java.nio.file.Files.createTempDirectory("graft_sem_src").toString + "/emb"
    corpus.filter(col("vec_id") < split).write.parquet(srcDir)
    val dir = java.nio.file.Files.createTempDirectory("graft_sem_idx2").toString
    Dedup.writeSemanticIndex(spark.read.parquet(srcDir), dir, nlist = 4, nassign = 2)
    val frame = Dedup.incrementalSemanticNearDupPairs(spark, dir,
      corpus.filter(col("vec_id") >= split), threshold = 0.9)
    val files = frame.inputFiles
    assert(files.nonEmpty)
    assert(!files.exists(_.contains("graft_sem_src")),
      "probe plan reads the corpus embeddings themselves")
    assert(files.forall(_.contains(dir.substring(dir.lastIndexOf('/') + 1))),
      s"probe plan reads outside the index: ${files.take(3).toSeq}")
  }
}
