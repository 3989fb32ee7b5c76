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
  * sum. Selection takes the top ⌈fraction·N⌉ by (weight desc, id) via
  * a distributed take-ordered — never a global single-partition sort.
  */
object Dsir {

  /** Per-document DSIR importance weight in integer micro-nats:
    * (idCol, n_grams, w_micro) for EVERY input document — zero-gram
    * documents carry (0, 0) rather than dropping (a selector must see
    * them lose deterministically, not vanish).
    *
    * `targetPred` marks the target-domain rows INSIDE `docs` (the
    * paper's target sample; e.g. `col("lang") === "en"`). `dim` must be
    * a power of two (the hash-bucket contract of [[charGramBuckets]]).
    */
  def importanceWeights(
      docs: DataFrame, targetPred: Column,
      idCol: String = "doc_id", textCol: String = "text",
      n: Int = 4, dim: Int = 1024): DataFrame = {
    val b = CacheScope.pin(
      ScaleOut(docs.select(col(idCol), targetPred.as("is_tgt"), col(textCol)))
        .select(col(idCol), col("is_tgt"),
          explode(charGramBuckets(normText(col(textCol)), n, dim)).as("b")),
      StorageLevel.MEMORY_AND_DISK)
    val rawC = b.groupBy("b").agg(count(lit(1)).as("cr"))
    val tgtC = b.filter(col("is_tgt")).groupBy("b").agg(count(lit(1)).as("ct"))
    val tots = b.agg(
      sum(when(col("is_tgt"), 1L).otherwise(0L)).as("ctot"),
      count(lit(1)).as("rtot"))
    // per-bucket micro-nat log-ratio, frozen ONCE on the dim-bounded
    // table; expression tree mirrors the oracle SQL op-for-op
    val score = rawC.join(tgtC, Seq("b"), "left")
      .crossJoin(broadcast(tots)) // 1-row scalar
      .select(col("b"),
        round((log(coalesce(col("ct"), lit(0L)) + lit(1))
          - log(col("ctot") + lit(dim))
          - log(col("cr") + lit(1))
          + log(col("rtot") + lit(dim))) * lit(1000000.0), 0)
          .cast("long").as("sc"))
    val dots = b.join(broadcast(score), Seq("b"))
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_grams"), sum("sc").as("w_micro"))
    docs.select(col(idCol)).join(dots, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_grams"), lit(0L)).as("n_grams"),
        coalesce(col("w_micro"), lit(0L)).as("w_micro"))
  }

  /** [[importanceWeights]] + selection flag: the top ⌈fraction·N⌉
    * documents by (w_micro desc, id asc). The cutoff set materializes
    * through a distributed take-ordered (k ids to the driver — k is
    * selection-budget-sized by the sampler contract, the q75/q112
    * bounded-k discipline), then flags ride a semi-join back.
    */
  def selectTop(
      docs: DataFrame, targetPred: Column, fraction: Double,
      idCol: String = "doc_id", textCol: String = "text",
      n: Int = 4, dim: Int = 1024): DataFrame = {
    require(fraction > 0 && fraction <= 1, "fraction in (0, 1]")
    val w = CacheScope.pin(
      importanceWeights(docs, targetPred, idCol, textCol, n, dim),
      StorageLevel.MEMORY_AND_DISK)
    val total = docs.count()
    val k = math.ceil(fraction * total).toLong
    val top = w.orderBy(col("w_micro").desc, col(idCol)).limit(k.toInt)
      .select(col(idCol), lit(true).as("selected"))
    w.join(top, Seq(idCol), "left")
      .select(col(idCol), col("n_grams"), col("w_micro"),
        coalesce(col("selected"), lit(false)).as("selected"))
  }
}
