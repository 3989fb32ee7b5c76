package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.functions.TextFunctions

/** Exact repeated-SUBSTRING dedup signals: find every k-token span whose
  * content occurs in at least `minDocs` distinct documents and report, per
  * document, how much of it is covered by such repeated spans — the
  * operation of Lee et al., "Deduplicating Training Data Makes Language
  * Models Better" (ACL'22), where repeated spans (licenses, boilerplate,
  * quoted passages) inside otherwise-unique documents are removed, not
  * just whole near-duplicate documents (that is the shingle-Jaccard
  * family's granularity, [[Dedup.ngramJaccardPairs]]).
  *
  * Method: fixed-width token-window hashing instead of the paper's suffix
  * array. A repeated span of length >= k tokens necessarily contains a
  * repeated k-token window, and a maximal run of overlapping/adjacent
  * repeated windows reconstructs the repeated region at granularity k
  * (spans shorter than k are invisible — the contract, since k IS the
  * minimum span length of interest). Suffix arrays don't distribute —
  * they need the corpus concatenated and globally sorted — while window
  * hashes shard perfectly: the kernel is one compiled pass per document
  * ([[graft.functions.expr.ShingleWindowHashes]]), and everything after
  * it moves 8-byte hashes, never text.
  *
  * Scale shape: one shuffle keyed by window hash for the document-
  * frequency aggregate (map-side combinable; a hot boilerplate window
  * arrives pre-aggregated), a join of the hits against the repeated tail
  * (df >= minDocs — the overwhelming majority of windows in a real corpus
  * are unique, so the tail is small and AQE broadcasts it), and one
  * id-keyed exchange for the per-document span merge (window state is
  * bounded by a single document's hit count). No all-pairs surface
  * anywhere; cost is linear in corpus size.
  */
object Spans {

  /** Per-document repeated-span coverage: (idCol, n_tokens,
    * covered_tokens, n_spans, frac_covered), every input document present
    * (zero coverage kept — the audit must list clean docs).
    *
    * Hash-equality stands in for window equality (the same premise as the
    * inverted-index Jaccard path); at 64 bits a false merge needs a
    * corpus-scale birthday collision AND the colliding windows to sit in
    * the same document pair.
    */
  def repeatedSpanCoverage(
      docs: DataFrame, idCol: String = "doc_id", textCol: String = "text",
      k: Int = 50, minDocs: Int = 2): DataFrame = {
    require(k >= 1, "span width must be >= 1")
    require(minDocs >= 2, "a span repeated in fewer than 2 docs is not repeated")
    // (id, token count, ordered window hashes) in ONE kernel pass over the
    // text; pinned because base counts and both hit-path consumers read it
    val doc = CacheScope.pin(
      ScaleOut(docs.select(col(idCol).as("id"), col(textCol).as("text")))
        .select(col("id"),
          size(TextFunctions.tokens(col("text"))).cast("long").as("n_tokens"),
          TextFunctions.shingleWindowHashes(col("text"), k).as("hs")),
      StorageLevel.MEMORY_AND_DISK)
    // (id, token position, window hash) — positions survive the explode
    val win = doc
      .select(col("id"), posexplode(col("hs")).as(Seq("pos", "h")))
      .filter(col("h").isNotNull)
    // the repeated tail: windows occurring in >= minDocs DISTINCT docs
    val rep = win.groupBy("h")
      .agg(countDistinct(col("id")).as("nd"))
      .filter(col("nd") >= minDocs)
      .select("h")
    // positions covered by a repeated window, merged into maximal spans:
    // window at pos covers tokens [pos, pos+k-1], so the next hit starts a
    // new span only when it clears the previous hit's coverage (pos gaps
    // are monotone for fixed-width windows — lag is sufficient)
    val w = Window.partitionBy("id").orderBy("pos")
    val merged = win.join(rep, Seq("h"))
      .select(col("id"), col("pos"))
      .withColumn("prev", lag("pos", 1).over(w))
      .withColumn("new_span",
        when(col("prev").isNull || col("pos") > col("prev") + k, 1L).otherwise(0L))
      .withColumn("span_id", sum("new_span").over(w))
    val spans = merged.groupBy("id", "span_id")
      .agg((max("pos") - min("pos") + k).cast("long").as("span_len"))
    val perDoc = spans.groupBy("id")
      .agg(sum("span_len").as("covered_tokens"), count(lit(1)).as("n_spans"))
    doc.select("id", "n_tokens")
      .join(perDoc, Seq("id"), "left")
      .select(col("id").as(idCol), col("n_tokens"),
        coalesce(col("covered_tokens"), lit(0L)).as("covered_tokens"),
        coalesce(col("n_spans"), lit(0L)).as("n_spans"),
        round(coalesce(col("covered_tokens"), lit(0L)).cast("double") / col("n_tokens"), 6)
          .as("frac_covered"))
  }
}
