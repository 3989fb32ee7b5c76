package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.expr.PqFunctions.{pqAdcScore, pqAdcTable, pqEncode}
import graft.functions.expr.VectorFunctions.{cosineSim, nearestCells}
import graft.sources.Segments

/** Product quantization (Jégou/Douze/Schmid, "Product Quantization for
  * Nearest Neighbor Search", TPAMI 2011) — the ANN representation for
  * the scale where the float vectors CANNOT be the working set: a 100 TB
  * corpus of 64-dim float32 embeddings is 25 TB of vector payload, but
  * its PQ codes at m=8 subspaces are ~800 GB — scannable. Each vector
  * splits into m subvectors; each subspace gets a ksub-centroid L2
  * k-means codebook; a vector is stored as m small codes. A query never
  * meets corpus floats: it precomputes an m x ksub table of subspace
  * inner products (ADC), and scoring a corpus row is m table lookups
  * over its codes.
  *
  * Search here is ADC-shortlist + EXACT re-rank: the code scan ranks all
  * corpus rows approximately, keeps a per-query shortlist (default 4k),
  * and only the shortlist joins back to float vectors for exact cosine —
  * so the expensive exact kernel touches shortlist-bounded rows, not the
  * corpus, and the final top-k is exact whenever the shortlist recall
  * covers it (PqSpec pins recall on planted clusters; the q93 oracle
  * pins EXACT equality with brute force on the testdata). At 100 TB the
  * flat code scan composes with IVF cells ([[Ivf]]) for sub-linear
  * probing; the flat variant is the PQ baseline.
  *
  * Training is one aggregation per iteration for ALL m codebooks: codes
  * are assigned by one [[graft.functions.expr.PqEncode]] pass, the
  * (subspace, cell, dim) means come from a single posexplode aggregate
  * (m x ksub x dsub rows collected — KBs, corpus-size-independent), and
  * `sampleOneIn` bounds the training set exactly as in [[Ivf]].
  */
object Pq {

  /** Train m L2-k-means codebooks of ksub centroids over dsub-wide
    * subspaces. Returns books(j)(k) = centroid k of subspace j. Seeds are
    * the first ksub sampled vectors' slices (deterministic hash order);
    * a cell that loses all members keeps its previous centroid.
    */
  def trainCodebooks(
      corpus: DataFrame, idCol: String = "vec_id", vecCol: String = "embedding",
      dim: Int = 64, m: Int = 8, ksub: Int = 16, iters: Int = 3,
      seed: Long = 42L, sampleOneIn: Int = 1): Array[Array[Array[Float]]] = {
    require(dim % m == 0, s"dim=$dim must split into m=$m equal subspaces")
    val dsub = dim / m
    val sample =
      if (sampleOneIn <= 1) corpus
      else corpus.filter(pmod(xxhash64(col(idCol), lit(seed)), lit(sampleOneIn)) === 0)
    val train = sample.select(col(idCol).as("id"), col(vecCol).as("vec"))
    val seedRows = train.orderBy(xxhash64(col("id"), lit(seed))).limit(ksub)
      .collect().map(_.getSeq[Float](1).toArray)
    // a short sample would train short codebooks while the index meta
    // still promised ksub — every later searchIndex would then throw its
    // books/meta require (and an EMPTY sample would crash adcSearch):
    // fail at the cause with the actionable knobs, not at the symptom
    require(seedRows.length >= ksub,
      s"PQ codebook training needs >= ksub=$ksub sample vectors, got ${seedRows.length}: " +
        "lower ksub (or sampleOneIn) to fit the corpus")
    var books = Array.tabulate(m)(j =>
      seedRows.map(v => java.util.Arrays.copyOfRange(v, j * dsub, (j + 1) * dsub)))
    var it = 0
    while (it < iters) {
      // one pass assigns ALL subspaces; one aggregate recomputes ALL means
      val sums = train
        .select(pqEncode(col("vec"), books, dsub).as("codes"),
          posexplode(col("vec")).as(Seq("pos", "x")))
        .select((col("pos") / dsub).cast("int").as("j"),
          pmod(col("pos"), lit(dsub)).as("d"),
          element_at(col("codes"), (col("pos") / dsub).cast("int") + 1).as("cell"),
          col("x"))
        .groupBy("j", "cell", "d")
        .agg(sum(col("x")).as("s"), count(lit(1)).as("n"))
        .collect()
      val next = books.map(_.map(_.clone()))
      sums.groupBy(r => (r.getInt(0), r.getInt(1))).foreach { case ((j, cell), rows) =>
        rows.foreach { r =>
          next(j)(cell)(r.getAs[Number]("d").intValue) =
            (r.getAs[Double]("s") / r.getAs[Long]("n")).toFloat
        }
      }
      books = next
      it += 1
    }
    books
  }

  /** Shared search tail: ADC-score every (corpus code row, query) pair,
    * keep a per-query `shortlist`, join float vectors back for ONLY the
    * shortlist, exact-cosine re-rank to top-k. `codes` columns:
    * (neighbor_id, codes); `queries` columns: (query_id, qvec);
    * `vectors` columns: (id, vec) — the exact-re-rank side.
    *
    * Both ranking stages run through the bounded-top-k aggregate
    * ([[TopK]]): partial buffers truncate at shortlist/k inside the
    * map-side aggregation, so the per-query exchanges carry capped
    * entry lists, never the scored corpus. The flat ADC scan remains
    * the PQ *baseline* — at 100 TB the deployment shape is IVF+PQ
    * (probe [[Ivf]] cells first, ADC-score only probed cells' codes;
    * both index layouts ship here and compose by partitioning
    * `dir/codes` by cell). The re-rank join is shortlist-bounded.
    */
  private def adcSearch(
      codes: DataFrame, queries: DataFrame, vectors: DataFrame,
      books: Array[Array[Array[Float]]], dsub: Int, k: Int, shortlist: Int): DataFrame = {
    val ksub = books(0).length
    val q = queries.select(col("query_id"), col("qvec"),
      pqAdcTable(col("qvec"), books, dsub).as("table"))
    // both ranking stages run through the bounded-top-k aggregate (see
    // [[TopK]]): the ADC stage's exchange carries <= shortlist entries
    // per (partition, query) instead of the full scored corpus
    val short = TopK.perQuery(
        codes.join(broadcast(q), col("neighbor_id") =!= col("query_id"))
          .select(col("query_id"), col("neighbor_id"),
            pqAdcScore(col("codes"), col("table"), ksub).as("adc")),
        shortlist, scoreCol = "adc")
      .select("query_id", "neighbor_id")
      .join(broadcast(queries.select(col("query_id"), col("qvec"))), "query_id")
    TopK.perQuery(
      short
        .join(vectors.select(col("id").as("neighbor_id"), col("vec").as("nvec")),
          "neighbor_id")
        .select(col("query_id"), col("neighbor_id"),
          cosineSim(col("qvec"), col("nvec")).as("cosine")),
      k)
  }

  /** In-memory PQ top-k (train + encode + search in one call). */
  def pqTopK(
      corpus: DataFrame, queries: DataFrame, k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding",
      dim: Int = 64, m: Int = 8, ksub: Int = 16, iters: Int = 3,
      seed: Long = 42L, sampleOneIn: Int = 1, shortlistFactor: Int = 4): DataFrame = {
    val books = trainCodebooks(corpus, idCol, vecCol, dim, m, ksub, iters, seed, sampleOneIn)
    val dsub = dim / m
    val v = ScaleOut(corpus.select(col(idCol).as("id"), col(vecCol).as("vec")))
    val codes = v.select(col("id").as("neighbor_id"),
      pqEncode(col("vec"), books, dsub).as("codes"))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qvec"))
    adcSearch(codes, q, v, books, dsub, k, shortlistFactor * k)
  }

  /** Persist a PQ index: `dir/codes` (neighbor_id, codes — the compact
    * scan set), `dir/vecs` (id, vec — the exact-re-rank side, touched
    * only shortlist-wide), `dir/books` (j, k, centroid), and `dir/meta`
    * (dim, m, ksub, seed — written LAST as the completion marker).
    */
  def writeIndex(
      corpus: DataFrame, dir: String,
      idCol: String = "vec_id", vecCol: String = "embedding",
      dim: Int = 64, m: Int = 8, ksub: Int = 16, iters: Int = 3,
      seed: Long = 42L, sampleOneIn: Int = 1): Unit = {
    val spark = corpus.sparkSession
    val books = trainCodebooks(corpus, idCol, vecCol, dim, m, ksub, iters, seed, sampleOneIn)
    val dsub = dim / m
    val v = corpus.select(col(idCol).as("id"), col(vecCol).as("vec"))
    v.select(col("id").as("neighbor_id"), pqEncode(col("vec"), books, dsub).as("codes"))
      .write.mode("overwrite").parquet(s"$dir/codes")
    v.write.mode("overwrite").parquet(s"$dir/vecs")
    import spark.implicits._
    books.zipWithIndex.flatMap { case (book, j) =>
      book.zipWithIndex.map { case (c, kk) => (j, kk, c.toSeq) }
    }.toSeq.toDF("j", "k", "centroid")
      .repartition(1).write.mode("overwrite").parquet(s"$dir/books")
    Seq((dim, m, ksub, seed)).toDF("dim", "m", "ksub", "seed")
      .repartition(1).write.mode("overwrite").parquet(s"$dir/meta")
  }

  /** (cell, centroid) frame for a coarse-quantizer matrix — the
    * broadcastable join side of residual encoding/search.
    */
  private def centroidsDf(
      spark: SparkSession, cents: Array[Array[Float]]): DataFrame = {
    import spark.implicits._
    cents.zipWithIndex.map { case (c, i) => (i, c.toSeq) }.toSeq
      .toDF("cell", "centroid")
  }

  /** The per-cell encode input: raw vectors (`by_residual=false`), or
    * residuals v − ref(cell) via the codegen'd [[graft.functions
    * .expr.VectorSub]] kernel and a broadcast reference join. The
    * reference is the CELL MEAN, not the (unit-norm) assignment
    * centroid: the coarse quantizer is spherical (dot-product cells over
    * unit centroids), so subtracting a unit centroid from vectors of
    * arbitrary norm would leave residuals ≈ the raw vectors and buy
    * nothing — the mean is the reconstruction reference that actually
    * cancels the between-cell displacement. Columns: (id, cell, evec).
    */
  private def encodeInput(
      assigned: DataFrame, refs: Array[Array[Float]], byResidual: Boolean): DataFrame =
    if (byResidual)
      assigned.join(broadcast(centroidsDf(assigned.sparkSession, refs)), "cell")
        .select(col("id"), col("cell"),
          graft.functions.expr.VectorFunctions.vecSub(col("vec"), col("centroid")).as("evec"))
    else assigned.select(col("id"), col("cell"), col("vec").as("evec"))

  /** Per-cell MEAN vectors of an assigned corpus — the residual
    * reconstruction reference (`dir/cellmeans`). One aggregate; the
    * collected result is nlist x dim, corpus-size-independent. Empty
    * cells keep the zero vector (their residual IS the raw vector).
    */
  private def cellMeans(assigned: DataFrame, nlist: Int, dim: Int): Array[Array[Float]] = {
    val rows = assigned
      .select(col("cell"), posexplode(col("vec")).as(Seq("pos", "x")))
      .groupBy("cell", "pos").agg(avg(col("x")).as("m"))
      .collect()
    val out = Array.fill(nlist)(new Array[Float](dim))
    rows.foreach(r => out(r.getInt(0))(r.getInt(1)) = r.getAs[Double]("m").toFloat)
    out
  }

  /** Persist the COMPOSED IVF+PQ index — the FAISS-standard shape for
    * ANN over a corpus whose floats cannot be the working set AND whose
    * size forbids even a flat code scan: a coarse [[Ivf]] quantizer
    * assigns every vector to one of `nlist` cells, PQ codes are written
    * PARTITIONED BY cell, and a search ADC-scans only the probed cells'
    * code files (partition pruning at the file listing, exactly
    * [[Ivf.writeIndex]]'s trick, over rows 32× smaller).
    *
    * `byResidual` selects the coding domain (both public IVFPQ variants
    * ship; PqSpec measures the recall trade at fixed m/ksub):
    *
    *   - `false` (default): codes over RAW vectors — one global ADC
    *     table per query, cheapest queries, coarser codes (the codebooks
    *     must span the whole space); at nprobe = nlist the search is
    *     EXACTLY the flat [[searchIndex]] (PqSpec pins the equality).
    *   - `true`: codes over v − mean(cell) (the reconstruction reference
    *     is the CELL MEAN, stored in `dir/cellmeans` — see
    *     [[encodeInput]] for why the unit assignment centroid would not
    *     do) — the codebooks only span within-cell displacements, so the
    *     same m/ksub budget quantizes much finer when data is clustered
    *     (which is why IVF exists). For the inner-product metric the
    *     score decomposes exactly: ⟨q,v̂⟩ = ⟨q,mean⟩ + ⟨q,r̂⟩, so a search
    *     adds one per-(query, probed cell) scalar to the SAME
    *     global-table ADC lookups — no per-cell table rebuild, query
    *     cost within a dot product of the raw variant.
    *
    * Layout: `dir/codes` (cell=<c>/ partitioned; neighbor_id, codes),
    * `dir/vecs`, `dir/books`, `dir/centroids`, `dir/meta` (written LAST).
    * Maintainable across ingests via [[appendToIvfPqIndex]].
    */
  def writeIvfPqIndex(
      corpus: DataFrame, dir: String,
      idCol: String = "vec_id", vecCol: String = "embedding",
      dim: Int = 64, m: Int = 8, ksub: Int = 16, nlist: Int = 16,
      iters: Int = 3, seed: Long = 42L, sampleOneIn: Int = 1,
      byResidual: Boolean = false): Unit = {
    val spark = corpus.sparkSession
    val cents = Ivf.trainCentroids(corpus, idCol, vecCol, nlist, iters, seed, sampleOneIn)
    val dsub = dim / m
    val v = corpus.select(col(idCol).as("id"), col(vecCol).as("vec"))
    val assigned = v.withColumn("cell", element_at(nearestCells(col("vec"), cents, 1), 1))
    val refs = if (byResidual) cellMeans(assigned, nlist, dim) else Array.empty[Array[Float]]
    val enc = encodeInput(assigned, refs, byResidual)
    val books = trainCodebooks(enc, "id", "evec", dim, m, ksub, iters, seed, sampleOneIn)
    enc.select(col("id").as("neighbor_id"),
        pqEncode(col("evec"), books, dsub).as("codes"), col("cell"))
      .write.mode("overwrite").partitionBy("cell").parquet(s"$dir/codes")
    v.write.mode("overwrite").parquet(s"$dir/vecs")
    import spark.implicits._
    books.zipWithIndex.flatMap { case (book, j) =>
      book.zipWithIndex.map { case (c, kk) => (j, kk, c.toSeq) }
    }.toSeq.toDF("j", "k", "centroid")
      .repartition(1).write.mode("overwrite").parquet(s"$dir/books")
    if (byResidual)
      centroidsDf(spark, refs)
        .repartition(1).write.mode("overwrite").parquet(s"$dir/cellmeans")
    centroidsDf(spark, cents)
      .repartition(1).write.mode("overwrite").parquet(s"$dir/centroids")
    Seq((dim, m, ksub, nlist, seed, byResidual))
      .toDF("dim", "m", "ksub", "nlist", "seed", "by_residual")
      .repartition(1).write.mode("overwrite").parquet(s"$dir/meta")
  }

  /** Append an increment to a [[writeIvfPqIndex]] directory: assign to
    * the STORED cells, encode with the STORED books (residual or raw,
    * whichever the index was built with — nothing retrains; codebook
    * drift across a long append history is the documented rebuild
    * trigger, observable the same way as [[Dedup.semanticDrift]]), and
    * commit codes + vecs as one [[Segments]] segment — the maintenance
    * contract of the other three persisted indexes, completing the set.
    */
  def appendToIvfPqIndex(
      increment: DataFrame, dir: String,
      idCol: String = "vec_id", vecCol: String = "embedding",
      seg: Option[String] = None): Unit = {
    val spark = increment.sparkSession
    appendToIvfPqIndexWith(loadIvfPqState(spark, dir), increment, dir, idCol, vecCol, seg)
  }

  /** [[appendToIvfPqIndex]] with ALREADY-LOADED quantizer state, so the
    * streaming ingest shares one driver read per batch with the search
    * ([[ivfPqIngestBatch]]).
    */
  def appendToIvfPqIndexWith(
      st: IvfPqState, increment: DataFrame, dir: String,
      idCol: String = "vec_id", vecCol: String = "embedding",
      seg: Option[String] = None): Unit = {
    val spark = increment.sparkSession
    val segName = seg.getOrElse(
      "append-" + java.util.UUID.randomUUID().toString.take(8))
    if (Segments.isCommitted(spark, dir, segName)) return
    val v = increment.select(col(idCol).as("id"), col(vecCol).as("vec"))
    val enc = encodeInput(
      v.withColumn("cell", element_at(nearestCells(col("vec"), st.cents, 1), 1)),
      st.cellMeans, st.byResidual)
    // the two part writes are independent (separate dirs, separate
    // sources; the marker commit below is the only publish point) —
    // submit them concurrently (§2.6, [[ConcurrentJobs]])
    ConcurrentJobs.awaitAll(
      () => Segments.writePart(
        enc.select(col("id").as("neighbor_id"),
          pqEncode(col("evec"), st.books, st.dsub).as("codes"), col("cell")),
        dir, "codes", segName, partitionBy = Seq("cell")),
      () => Segments.writePart(v, dir, "vecs", segName))
    Segments.commit(spark, dir, segName)
  }

  /** Driver-resident quantizer state of a [[writeIvfPqIndex]] directory —
    * codebook-sized by contract (books m×ksub×dsub floats, centroids
    * nlist×dim, cell means only when residual coding is on). The
    * quantizers are immutable after the build (appends encode with the
    * STORED quantizers; compaction rewrites codes/vecs, never
    * books/meta), so state loaded once is valid for a whole ingest batch.
    */
  final case class IvfPqState(
      dim: Int, m: Int, ksub: Int, byResidual: Boolean,
      books: Array[Array[Array[Float]]], cents: Array[Array[Float]],
      cellMeans: Array[Array[Float]]) {
    def dsub: Int = dim / m
  }

  def loadIvfPqState(spark: SparkSession, dir: String): IvfPqState = {
    val meta = spark.read.parquet(s"$dir/meta").head()
    val m = meta.getAs[Int]("m")
    val byResidual = meta.getAs[Boolean]("by_residual")
    IvfPqState(
      meta.getAs[Int]("dim"), m, meta.getAs[Int]("ksub"), byResidual,
      readBooks(spark, dir, m), readCentroids(spark, dir),
      if (byResidual) readCellMeans(spark, dir) else Array.empty)
  }

  private def readBooks(
      spark: SparkSession, dir: String, m: Int): Array[Array[Array[Float]]] = {
    val rows = spark.read.parquet(s"$dir/books").orderBy("j", "k").collect()
    Array.tabulate(m)(j => rows.filter(_.getInt(0) == j).map(_.getSeq[Float](2).toArray))
  }

  private def readCentroids(spark: SparkSession, dir: String): Array[Array[Float]] =
    spark.read.parquet(s"$dir/centroids")
      .orderBy("cell").collect().map(_.getSeq[Float](1).toArray)

  private def readCellMeans(spark: SparkSession, dir: String): Array[Array[Float]] =
    spark.read.parquet(s"$dir/cellmeans")
      .orderBy("cell").collect().map(_.getSeq[Float](1).toArray)

  /** Top-k against a [[writeIvfPqIndex]] directory: probe each query's
    * `nprobe` nearest cells, push the union of probed cells as a static
    * partition filter on the code scan (unprobed cells' files never
    * enter the listing), ADC-score only rows whose cell one of the
    * query's probes covers, then shortlist + exact re-rank as in the
    * flat path.
    */
  def searchIvfPqIndex(
      spark: SparkSession, dir: String, queries: DataFrame, k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding",
      nprobe: Int = 4, shortlistFactor: Int = 4,
      excludeIds: Option[DataFrame] = None): DataFrame =
    searchIvfPqIndexWith(loadIvfPqState(spark, dir), spark, dir, queries, k,
      idCol, vecCol, nprobe, shortlistFactor, excludeIds)

  /** [[searchIvfPqIndex]] with ALREADY-LOADED quantizer state (see
    * [[ivfPqIngestBatch]]).
    */
  def searchIvfPqIndexWith(
      st: IvfPqState, spark: SparkSession, dir: String, queries: DataFrame,
      k: Int, idCol: String = "vec_id", vecCol: String = "embedding",
      nprobe: Int = 4, shortlistFactor: Int = 4,
      excludeIds: Option[DataFrame] = None): DataFrame = {
    val ksub = st.ksub
    val dsub = st.dsub
    val books = st.books
    val cents = st.cents
    // residual scoring: v̂ = mean(cell) + r̂, so ⟨q,v̂⟩ = ⟨q,mean⟩ + ⟨q,r̂⟩
    // EXACTLY — the per-(query, probed cell) constant ⟨q,mean⟩ rides the
    // exploded probe rows and the ADC lookups stay one global table per
    // query; raw scoring is the qc = 0 degenerate case of the same plan
    val q0 = queries.select(col(idCol).as("query_id"), col(vecCol).as("qvec"))
      .withColumn("cell", explode(nearestCells(col("qvec"), cents, nprobe)))
      .withColumn("table", pqAdcTable(col("qvec"), books, dsub))
    val q =
      if (st.byResidual)
        q0.join(broadcast(centroidsDf(spark, st.cellMeans)), "cell")
          .withColumn("qc",
            graft.functions.expr.VectorFunctions.dotProduct(col("qvec"), col("centroid")))
          .drop("centroid")
      else q0.withColumn("qc", lit(0.0))
    val probed = q.select("cell").distinct().collect().map(_.getInt(0)).sorted
    val codes = ScaleOut(Segments.readPart(spark, dir, "codes")
      .filter(col("cell").isin(probed.map(Int.box): _*)))
    // cell-keyed join (not a cross): a code row is scored only by the
    // queries probing ITS cell, and since a corpus row lives in exactly
    // one cell while a query's probes are distinct cells, (query, row)
    // candidates are already unique — no dedup needed. ADC shortlist +
    // exact re-rank follow the flat path's bounded-aggregate tail
    val cand0 = codes.join(broadcast(q),
        codes("cell") === q("cell") && col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        (pqAdcScore(col("codes"), col("table"), ksub) + col("qc")).as("adc"))
    // exclusion BEFORE ranking (not a post-filter): an excluded id must
    // not occupy a shortlist slot a real neighbor should get — the
    // ingest-replay contract (a replayed batch excludes its own already-
    // appended vectors and must reproduce its pre-crash output exactly)
    val cand = excludeIds.fold(cand0)(ex =>
      cand0.join(broadcast(ex.select(col(idCol).as("neighbor_id"))),
        Seq("neighbor_id"), "left_anti"))
    val short = TopK.perQuery(cand, shortlistFactor * k, scoreCol = "adc")
      .select("query_id", "neighbor_id")
      .join(broadcast(queries.select(col(idCol).as("query_id"), col(vecCol).as("qvec"))),
        "query_id")
    TopK.perQuery(
      short
        .join(Segments.readPart(spark, dir, "vecs")
          .select(col("id").as("neighbor_id"), col("vec").as("nvec")), "neighbor_id")
        .select(col("query_id"), col("neighbor_id"),
          cosineSim(col("qvec"), col("nvec")).as("cosine")),
      k)
  }

  /** Top-k against a [[writeIndex]] directory: codebooks and parameters
    * come from the index (driver-resident KBs); the code scan is widened
    * ([[ScaleOut]] — per-row ADC work would otherwise serialize on a
    * small index's 1-2 file splits, the q78 under-split class); the
    * float vectors are read ONLY for the shortlist join.
    */
  def searchIndex(
      spark: SparkSession, dir: String, queries: DataFrame, k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding",
      shortlistFactor: Int = 4): DataFrame = {
    val meta = spark.read.parquet(s"$dir/meta").head()
    val dim = meta.getAs[Int]("dim")
    val m = meta.getAs[Int]("m")
    val ksub = meta.getAs[Int]("ksub")
    val dsub = dim / m
    val books: Array[Array[Array[Float]]] = {
      val rows = spark.read.parquet(s"$dir/books")
        .orderBy("j", "k").collect()
      Array.tabulate(m)(j => rows.filter(_.getInt(0) == j)
        .map(_.getSeq[Float](2).toArray))
    }
    require(books.forall(_.length == ksub), "books/meta ksub mismatch")
    val codes = ScaleOut(spark.read.parquet(s"$dir/codes"))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qvec"))
    adcSearch(codes, q, spark.read.parquet(s"$dir/vecs"), books, dsub, k,
      shortlistFactor * k)
  }
}
