package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.functions.TextFunctions.normText
import graft.functions.expr.ClassifierFunctions.charGramBuckets

/** DSIR — Data Selection via Importance Resampling (Xie et al.,
  * NeurIPS 2023): select raw-corpus documents whose hashed-n-gram
  * feature distribution looks like a TARGET domain, by importance
  * weight under two bag-of-hashed-n-grams multinomials,
  *
  *   log w(x) = Σ_grams ( ln p_target[b(g)] − ln p_raw[b(g)] ),
  *
  * the published cheap alternative to classifier-based selection (the
  * q118 family): no training loop — both "models" are smoothed bucket
  * count tables. Reference scope: the reference has no curation
  * surface; extension (training-data pipeline family).
  *
  * Determinism contract (the q118/q194 micro-unit discipline): the
  * per-BUCKET log-ratio freezes to integer micro-nats with one fixed
  * IEEE expression — ln(ct+1) − ln(Ct+dim) − ln(cr+1) + ln(Cr+dim),
  * add-one smoothing over `dim` buckets — rounded once on the
  * dim-bounded table; the per-document weight is then an EXACT integer
  * dot product (Σ occurrences' bucket scores), so no corpus-sized
  * double summation exists and the oracle replays bit-for-bit through
  * the shared FNV-1a64+fmix64 hash chain.
  *
  * Scale shape: gram hashing is the compiled [[charGramBuckets]]
  * kernel, map-side in the scan; the exploded (doc, bucket) stream is
  * pinned (feeds the raw counts, the target counts, and the scoring
  * join); both count tables and the score table are dim-bounded, the
  * score join BROADCASTS; the close is one doc-keyed map-side-combined
  * sum. Selection of the top ⌈fraction·N⌉ by (weight desc, id) is a
  * bounded-histogram WEIGHT THRESHOLD + map-side flag
  * ([[flagByThreshold]]) — never a take-ordered limit or a global
  * single-partition sort, so the fraction path survives k past 2³¹.
  */
object Dsir {

  /** The two multinomials' sufficient statistics in ONE dim-bounded
    * aggregate: (b, ct, cr) — target and raw occurrence counts per
    * hashed bucket. This aggregate is MERGEABLE (plain sums), which is
    * what lets the streaming variant maintain it as state with the
    * drained table bit-identical to this batch one.
    */
  def bucketCounts(
      docs: DataFrame, targetPred: Column,
      idCol: String = "doc_id", textCol: String = "text",
      n: Int = 4, dim: Int = 1024): DataFrame =
    ScaleOut(docs.select(col(idCol), targetPred.as("is_tgt"), col(textCol)))
      .select(col("is_tgt"),
        explode(charGramBuckets(normText(col(textCol)), n, dim)).as("b"))
      .groupBy("b")
      .agg(sum(when(col("is_tgt"), 1L).otherwise(0L)).as("ct"),
        count(lit(1)).as("cr"))

  /** Per-bucket micro-nat log-ratio, frozen ONCE on the dim-bounded
    * count table: (b, sc). Expression tree mirrors the oracle SQL
    * op-for-op; totals derive from the counts themselves, so a drained
    * streaming count table scores identically to a batch one.
    */
  def scoreTable(counts: DataFrame, dim: Int): DataFrame = {
    val tots = counts.agg(sum("ct").as("ctot"), sum("cr").as("rtot"))
    counts.crossJoin(broadcast(tots)) // 1-row scalar
      .select(col("b"),
        round((log(col("ct") + lit(1))
          - log(col("ctot") + lit(dim))
          - log(col("cr") + lit(1))
          + log(col("rtot") + lit(dim))) * lit(1000000.0), 0)
          .cast("long").as("sc"))
  }

  /** Score `docs` against a frozen score table: (idCol, n_grams,
    * w_micro) for EVERY input document — zero-gram documents carry
    * (0, 0) rather than dropping (a selector must see them lose
    * deterministically, not vanish). The score join broadcasts; the
    * close is one doc-keyed map-side-combined sum.
    */
  def weightsAgainst(
      docs: DataFrame, scores: DataFrame,
      idCol: String = "doc_id", textCol: String = "text",
      n: Int = 4, dim: Int = 1024): DataFrame = {
    val dots = ScaleOut(docs.select(col(idCol), col(textCol)))
      .select(col(idCol),
        explode(charGramBuckets(normText(col(textCol)), n, dim)).as("b"))
      .join(broadcast(scores), Seq("b"))
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_grams"), sum("sc").as("w_micro"))
    docs.select(col(idCol)).join(dots, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_grams"), lit(0L)).as("n_grams"),
        coalesce(col("w_micro"), lit(0L)).as("w_micro"))
  }

  /** Per-document DSIR importance weight in integer micro-nats:
    * (idCol, n_grams, w_micro) for EVERY input document.
    *
    * `targetPred` marks the target-domain rows INSIDE `docs` (the
    * paper's target sample; e.g. `col("lang") === "en"`). `dim` must be
    * a power of two (the hash-bucket contract of [[charGramBuckets]]).
    * Composed from the modular pieces: one dim-bounded count aggregate,
    * the frozen score table, one scoring pass. (Two compiled map-side
    * kernel passes over the text rather than a corpus-sized pin of the
    * exploded gram stream — at 100 TB re-running a codegen'd scan is
    * cheaper than materializing rows × grams.)
    */
  def importanceWeights(
      docs: DataFrame, targetPred: Column,
      idCol: String = "doc_id", textCol: String = "text",
      n: Int = 4, dim: Int = 1024): DataFrame =
    weightsAgainst(docs,
      scoreTable(bucketCounts(docs, targetPred, idCol, textCol, n, dim), dim),
      idCol, textCol, n, dim)

  /** [[importanceWeights]] + selection flag: the top ⌈fraction·N⌉
    * documents by (w_micro desc, id asc). k here is CORPUS-PROPORTIONAL
    * (the DSIR paper's usage: fraction·N can be billions), so the
    * selection is [[flagByThreshold]] — a bounded-histogram weight
    * cutoff + map-side flag, never a take-ordered limit (the r13
    * verdict's scale finding: `orderBy(...).limit(k)` funnels k rows
    * through one partition and `limit` overflows Int past 2³¹).
    */
  def selectTop(
      docs: DataFrame, targetPred: Column, fraction: Double,
      idCol: String = "doc_id", textCol: String = "text",
      n: Int = 4, dim: Int = 1024): DataFrame = {
    require(fraction > 0 && fraction <= 1, "fraction in (0, 1]")
    val w = CacheScope.pin(
      importanceWeights(docs, targetPred, idCol, textCol, n, dim),
      StorageLevel.MEMORY_AND_DISK)
    // the fraction's k = ceil(f·n) resolves inside the walk's first
    // probe — no separate count job
    flagFromCut(w, OrderStat.rankStatFraction(w, "w_micro", fraction,
      largest = true), idCol)
  }

  /** Flag EXACTLY the top `k` rows of a weight frame by
    * (w_micro desc, id asc) with NO row set larger than a 2^16-bucket
    * histogram ever leaving the executors:
    *
    *   1. the k-th largest weight ([[OrderStat.kthLargest]] — four
    *      bounded-histogram passes) is the CUTOFF;
    *   2. rows strictly above it are selected map-side;
    *   3. the boundary residual r = k − |above| admits the r
    *      smallest-id rows AT the cutoff — the id threshold is the same
    *      bounded order statistic over the tie set.
    *
    * Output is bit-identical to `orderBy(w_micro desc, id).limit(k)`
    * semantics for any k up to the row count — there is just no limit
    * operator to overflow or single partition to funnel through.
    * Requires an integer-typed unique `idCol` (the weight-frame
    * contract: one row per document).
    */
  def flagByThreshold(weights: DataFrame, k: Long, idCol: String = "doc_id"): DataFrame = {
    require(k >= 1, s"selection budget must be >= 1, got $k")
    val w = CacheScope.pin(weights, StorageLevel.MEMORY_AND_DISK)
    flagFromCut(w, OrderStat.rankStat(w, "w_micro", k, largest = true), idCol)
  }

  private def flagFromCut(w: DataFrame, cut: OrderStat.Ranked,
      idCol: String): DataFrame = {
    // rows to admit AT the cutoff weight; >= 1 because rank k IS cut.value
    val residual = cut.rank - cut.beyond
    val selected =
      if (residual >= cut.atValue)
        // every cutoff-weight row is in — the no-boundary-tie common
        // case costs zero extra jobs (the walk already counted them)
        col("w_micro") >= cut.value
      else {
        // a strict subset of the ties is admitted, smallest ids first —
        // the id bound is again a bounded-histogram rank, over the
        // tie-restricted (map-side filtered) pinned frame
        val tieBound = OrderStat.kthSmallest(
          w.filter(col("w_micro") === cut.value), idCol, residual)
        col("w_micro") > cut.value ||
          (col("w_micro") === cut.value && col(idCol) <= tieBound)
      }
    w.select(col(idCol), col("n_grams"), col("w_micro"), selected.as("selected"))
  }

  /** Flag the top `k` rows of a weight frame by (w_micro desc, id asc)
    * through a distributed take-ordered: k ids land on the driver, so
    * this is ONLY for BOUNDED k — a fixed selection budget or an
    * increment-bounded batch (the q75/q112/q215 discipline), never a
    * corpus-proportional fraction (that path is [[flagByThreshold]],
    * which [[selectTop]] uses). The require makes the contract a fast
    * failure instead of a wrapped-negative `limit` at 2³¹ (r13 advice).
    */
  def flagTop(weights: DataFrame, k: Long, idCol: String = "doc_id"): DataFrame = {
    require(k >= 1 && k <= Int.MaxValue,
      s"flagTop is the BOUNDED-k path (driver-sized selection budgets); " +
        s"got k=$k — corpus-proportional selection must use flagByThreshold")
    val w = CacheScope.pin(weights, StorageLevel.MEMORY_AND_DISK)
    val top = w.orderBy(col("w_micro").desc, col(idCol)).limit(k.toInt)
      .select(col(idCol), lit(true).as("selected"))
    w.join(top, Seq(idCol), "left")
      .select(col(idCol), col("n_grams"), col("w_micro"),
        coalesce(col("selected"), lit(false)).as("selected"))
  }
}
