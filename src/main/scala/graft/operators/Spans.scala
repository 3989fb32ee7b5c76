package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
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
  *
  * Deployment shape ([[writeSpanIndex]]): the kernel pass and the
  * document-frequency aggregate are built ONCE per corpus state as a
  * staged parquet artifact (`docs` + `df`), so the full-corpus audit
  * ([[repeatedSpanCoverageFromIndex]]), the per-source boilerplate audit
  * ([[groupedSpanCoverageFromIndex]]) and the daily-ingest probe
  * ([[incrementalSpanCoverage]]) all read the stage — the corpus text is
  * tokenized and hashed exactly once per state, and no consumer holds a
  * corpus-sized block in executor memory (a staged artifact is a scan,
  * not a spill storm).
  */
object Spans {

  /** (id [, carry…], n_tokens, hs): ONE compiled kernel pass over the
    * text — token count and ordered window hashes together, the text
    * column dropped on the way out.
    */
  private def windowPass(
      docs: DataFrame, idCol: String, textCol: String, k: Int,
      carry: Seq[String] = Nil): DataFrame = {
    val reserved = Set("id", "n_tokens", "hs", idCol, textCol)
    require(carry.forall(c => !reserved.contains(c)),
      s"carry columns $carry collide with the index schema $reserved")
    ScaleOut(docs.select(col(idCol).as("id") +: carry.map(col) :+ col(textCol).as("text"): _*))
      .select(col("id") +: carry.map(col) :+
        size(TextFunctions.tokens(col("text"))).cast("long").as("n_tokens") :+
        TextFunctions.shingleWindowHashes(col("text"), k).as("hs"): _*)
  }

  /** (id, pos) repeated-window hits -> (id, covered_tokens, n_spans):
    * positions covered by a repeated window, merged into maximal spans.
    * The window at pos covers tokens [pos, pos+k-1], so the next hit
    * starts a new span only when it clears the previous hit's coverage
    * (pos gaps are monotone for fixed-width windows — lag is sufficient);
    * window state is bounded by a single document's hit count.
    */
  private def mergeSpans(hits: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy("id").orderBy("pos")
    hits
      .withColumn("prev", lag("pos", 1).over(w))
      .withColumn("new_span",
        when(col("prev").isNull || col("pos") > col("prev") + k, 1L).otherwise(0L))
      .withColumn("span_id", sum("new_span").over(w))
      .groupBy("id", "span_id")
      .agg((max("pos") - min("pos") + k).cast("long").as("span_len"))
      .groupBy("id")
      .agg(sum("span_len").as("covered_tokens"), count(lit(1)).as("n_spans"))
  }

  /** Left-join the per-doc span totals back onto the full document list
    * (zero coverage kept — the audit must list clean docs) and shape the
    * output row. `extra` columns (e.g. the grouping source) pass through
    * from `doc`.
    */
  private def finishCoverage(
      doc: DataFrame, perDoc: DataFrame, idCol: String,
      extra: Seq[String] = Nil): DataFrame =
    doc.select(("id" +: extra :+ "n_tokens").map(col): _*)
      .join(perDoc, Seq("id"), "left")
      .select(col("id").as(idCol) +: extra.map(col) :+
        col("n_tokens") :+
        coalesce(col("covered_tokens"), lit(0L)).as("covered_tokens") :+
        coalesce(col("n_spans"), lit(0L)).as("n_spans") :+
        round(coalesce(col("covered_tokens"), lit(0L)).cast("double") / col("n_tokens"), 6)
          .as("frac_covered"): _*)

  /** (id, token position, window hash) — positions survive the explode;
    * windows containing a null token carry a null hash and are dropped
    * here (positions must not shift, so the kernel cannot drop them).
    */
  private def explodeWindows(doc: DataFrame, extra: Seq[String] = Nil): DataFrame =
    doc
      .select(col("id") +: extra.map(col) :+ posexplode(col("hs")).as(Seq("pos", "h")): _*)
      .filter(col("h").isNotNull)

  /** Per-document repeated-span coverage: (idCol, n_tokens,
    * covered_tokens, n_spans, frac_covered), every input document present.
    *
    * Hash-equality stands in for window equality (the same premise as the
    * inverted-index Jaccard path); at 64 bits a false merge needs a
    * corpus-scale birthday collision AND the colliding windows to sit in
    * the same document pair.
    *
    * Self-contained, in-memory form: the kernel output is pinned because
    * base counts and the hit path both read it (lifetime follows the
    * caller's [[CacheScope]]). For a corpus that outgrows executor
    * memory, build the staged index once and use
    * [[repeatedSpanCoverageFromIndex]] — same output, scan instead of pin.
    */
  def repeatedSpanCoverage(
      docs: DataFrame, idCol: String = "doc_id", textCol: String = "text",
      k: Int = 50, minDocs: Int = 2): DataFrame = {
    require(k >= 1, "span width must be >= 1")
    require(minDocs >= 2, "a span repeated in fewer than 2 docs is not repeated")
    val doc = CacheScope.pin(
      windowPass(docs, idCol, textCol, k), StorageLevel.MEMORY_AND_DISK)
    val win = explodeWindows(doc)
    // the repeated tail: windows occurring in >= minDocs DISTINCT docs
    val rep = win.groupBy("h")
      .agg(countDistinct(col("id")).as("nd"))
      .filter(col("nd") >= minDocs)
      .select("h")
    val perDoc = mergeSpans(win.join(rep, Seq("h")).select("id", "pos"), k)
    finishCoverage(doc, perDoc, idCol)
  }

  /** Persist the window-hash index for a corpus: the per-document kernel
    * output (`dir/docs`: id[, carry…], n_tokens, hs — ordered window
    * hashes, never the text) and the per-window document frequencies
    * (`dir/df`: h, nd), plus the build width (`dir/meta`: k, written LAST
    * as the completion marker).
    *
    * This is the daily-ingest deployment shape: [[repeatedSpanCoverage]]
    * re-tokenizes and re-hashes the WHOLE corpus on every audit — at
    * 100 TB that is petabytes of kernel work per run, held in a
    * corpus-sized persist. Built once per corpus state, the index makes
    * the full audit a parquet scan (the df aggregate is pre-computed, so
    * the audit-time shuffle disappears too) and lets an increment probe
    * with only its own kernel work ([[incrementalSpanCoverage]]). The df
    * table derives FROM the written docs artifact, so the kernel runs
    * exactly once and nothing corpus-sized is ever pinned.
    *
    * `carry` names narrow metadata columns (e.g. `source`) stored
    * alongside each doc so grouped consumers
    * ([[groupedSpanCoverageFromIndex]]) need no join back to the corpus.
    * `nd` is the FULL distinct-doc count per window (not a thresholded
    * tail), so any `minDocs >= 2` can be answered by filtering the stored
    * aggregate.
    */
  def writeSpanIndex(
      docs: DataFrame, dir: String, idCol: String = "doc_id",
      textCol: String = "text", k: Int = 50, carry: Seq[String] = Nil): Unit = {
    require(k >= 1, "span width must be >= 1")
    val spark = docs.sparkSession
    windowPass(docs, idCol, textCol, k, carry)
      .write.mode("overwrite").parquet(s"$dir/docs")
    explodeWindows(spark.read.parquet(s"$dir/docs"))
      .groupBy("h")
      // min_id: the canonical OWNER of a repeated window (smallest doc id
      // containing it) — the strip transform keeps the owner's copy
      .agg(countDistinct(col("id")).as("nd"), min(col("id")).as("min_id"))
      .write.mode("overwrite").parquet(s"$dir/df")
    import spark.implicits._
    Seq(k).toDF("k").repartition(1).write.mode("overwrite").parquet(s"$dir/meta")
  }

  /** [[repeatedSpanCoverage]] against a [[writeSpanIndex]] directory —
    * identical output, but the kernel never runs (hashes are stored), the
    * repeated tail is a FILTER of the stored df aggregate (no audit-time
    * document-frequency shuffle), and nothing corpus-sized is pinned: the
    * two readers of the doc artifact are parquet scans.
    */
  def repeatedSpanCoverageFromIndex(
      spark: SparkSession, dir: String, idCol: String = "doc_id",
      minDocs: Int = 2): DataFrame = {
    require(minDocs >= 2, "a span repeated in fewer than 2 docs is not repeated")
    val k = spark.read.parquet(s"$dir/meta").head().getAs[Int]("k")
    val doc = spark.read.parquet(s"$dir/docs")
    val rep = spark.read.parquet(s"$dir/df")
      .filter(col("nd") >= minDocs).select("h")
    val hits = explodeWindows(doc).join(rep, Seq("h")).select("id", "pos")
    finishCoverage(doc, mergeSpans(hits, k), idCol)
  }

  /** Repeated-span coverage for an INCREMENT batch against a
    * [[writeSpanIndex]] corpus index: each increment document's coverage
    * counts a window as repeated when corpus-df + increment-df >=
    * minDocs — exactly the full-corpus audit over corpus ∪ increment,
    * restricted to the increment's rows (the append-side audit; corpus
    * rows whose coverage changed are the staged full audit's job, once
    * per corpus state). Increment ids must be disjoint from corpus ids
    * (the ingest invariant).
    *
    * The corpus participates ONLY through its stored df aggregate: its
    * text is never read and its kernel never re-runs (the spec pins
    * `inputFiles` to the index directory). The increment's window-hash
    * set is small, so it BROADCASTS against the stored aggregate and the
    * corpus side streams through the join shuffle-free — the q76
    * contamination-probe asymmetry. The span width comes from the index
    * meta, so probe and build cannot disagree.
    */
  def incrementalSpanCoverage(
      spark: SparkSession, dir: String, increment: DataFrame,
      idCol: String = "doc_id", textCol: String = "text",
      minDocs: Int = 2): DataFrame = {
    require(minDocs >= 2, "a span repeated in fewer than 2 docs is not repeated")
    val k = spark.read.parquet(s"$dir/meta").head().getAs[Int]("k")
    // the increment kernel feeds its own df, the hit join, and the final
    // token counts — pin so it runs once (increment-sized, caller's scope)
    val doc = CacheScope.pin(
      windowPass(increment, idCol, textCol, k), StorageLevel.MEMORY_AND_DISK)
    val win = explodeWindows(doc)
    val incDf = win.groupBy("h").agg(countDistinct(col("id")).as("inc_nd"))
    // corpus df restricted to the increment's hashes: increment side
    // broadcast, the stored aggregate streams shuffle-free
    val corpusNd = spark.read.parquet(s"$dir/df")
      .join(broadcast(incDf.select("h")), Seq("h"))
    val rep = incDf.join(corpusNd, Seq("h"), "left")
      .filter(col("inc_nd") + coalesce(col("nd"), lit(0L)) >= minDocs)
      .select("h")
    val perDoc = mergeSpans(win.join(rep, Seq("h")).select("id", "pos"), k)
    finishCoverage(doc, perDoc, idCol)
  }

  /** REMOVE repeated spans, keeping one canonical occurrence — the
    * transform half of Lee et al. ACL'22 (the coverage operators are the
    * audit half): for every repeated window the document with the
    * smallest id containing it is the OWNER and keeps its copy; every
    * other document has the window's tokens stripped. Owners are
    * per-window, so a document can keep one span and lose another, and
    * an owner's tokens still strip where a DIFFERENT window owned
    * elsewhere covers them — deterministic, order-free semantics.
    *
    * Output: (idCol, n_tokens, n_removed, clean_text), one row per input
    * document; `clean_text` is the whitespace-normalized token stream
    * (the same normalization every operator in the family tokenizes by)
    * with removed positions deleted, `""` when everything was repeated.
    *
    * Scale shape: removal HITS live only in repeated windows (the df
    * tail), so the interval list per document is small; it rides an
    * id-keyed join onto the documents scan, and the per-row strip is a
    * bounded array traversal (token count × intervals of ONE document) —
    * no token-level shuffle exists. The owner (`min_id`) is precomputed
    * in the staged index's df table, so the strip never re-aggregates
    * the corpus. The per-row array work runs as interpreted higher-order
    * functions, acceptable because this transform runs once per corpus
    * state (stage its output); promote to a compiled kernel only if a
    * profile says so.
    */
  def stripRepeatedSpans(
      spark: SparkSession, dir: String, docs: DataFrame,
      idCol: String = "doc_id", textCol: String = "text",
      minDocs: Int = 2): DataFrame = {
    require(minDocs >= 2, "a span repeated in fewer than 2 docs is not repeated")
    val k = spark.read.parquet(s"$dir/meta").head().getAs[Int]("k")
    val rep = spark.read.parquet(s"$dir/df")
      .filter(col("nd") >= minDocs).select("h", "min_id")
    // non-owner hits only; same maximal-interval merge as the audits
    val hits = explodeWindows(spark.read.parquet(s"$dir/docs"))
      .join(rep, Seq("h"))
      .filter(col("id") =!= col("min_id"))
      .select("id", "pos")
    stripByHits(docs, hits, k, idCol, textCol)
  }

  /** INCREMENTAL strip against a corpus span index: each increment
    * document loses every occurrence of a window that is repeated across
    * corpus+increment and whose owner (global min id over BOTH sides) is
    * a different document — exactly [[stripRepeatedSpans]] over the
    * combined corpus with the output restricted to increment rows, paid
    * for with increment-kernel work plus one stored-df probe. The corpus
    * contributes only its stored (hash, df, min_id) aggregate — its text
    * never re-tokenizes, the corollary of the [[incrementalSpanCoverage]]
    * audit for the transform half.
    *
    * Scale shape: the increment's window pass is pinned (feeds its own
    * df, the owner resolution, and the strip); the corpus df scan is
    * restricted to the increment's hashes through a broadcast semi-join
    * (increment-sized), so the stored aggregate streams shuffle-free.
    */
  def stripIncrement(
      spark: SparkSession, dir: String, increment: DataFrame,
      idCol: String = "doc_id", textCol: String = "text",
      minDocs: Int = 2): DataFrame = {
    require(minDocs >= 2, "a span repeated in fewer than 2 docs is not repeated")
    val k = spark.read.parquet(s"$dir/meta").head().getAs[Int]("k")
    val doc = CacheScope.pin(
      windowPass(increment, idCol, textCol, k), StorageLevel.MEMORY_AND_DISK)
    // the exploded windows feed BOTH the increment df and the hit join
    val win = CacheScope.pin(explodeWindows(doc), StorageLevel.MEMORY_AND_DISK)
    val incDf = win.groupBy("h")
      .agg(countDistinct(col("id")).as("inc_nd"), min(col("id")).as("inc_min"))
    val corpusDf = spark.read.parquet(s"$dir/df")
      .join(broadcast(incDf.select("h")), Seq("h"))
    // repeated across the union; owner = min id over both sides (no
    // assumption that corpus ids precede increment ids)
    val rep = incDf.join(corpusDf, Seq("h"), "left")
      .filter(col("inc_nd") + coalesce(col("nd"), lit(0L)) >= minDocs)
      .select(col("h"),
        least(coalesce(col("min_id"), col("inc_min")), col("inc_min")).as("owner"))
    val hits = win.join(rep, Seq("h"))
      .filter(col("id") =!= col("owner"))
      .select("id", "pos")
    stripByHits(increment, hits, k, idCol, textCol)
  }

  /** CROSS-SET span EXCISION — decontamination by REMOVAL: strip from
    * every `docs` row each >= k-token window that occurs anywhere in
    * `contaminated` (the eval/benchmark set), leaving the rest of the
    * document intact. The excision complement of the REJECTION-shaped
    * decontamination family (q76 flags overlap fractions, q148 drops
    * whole near-dup docs): when a training document merely QUOTES an
    * eval item, dropping the document wastes its clean text — a real
    * pipeline cuts the quoted span and keeps the rest (the Lee et al.
    * ACL'22 excision applied cross-set). No ownership rule: EVERY
    * match strips, including single occurrences — eval text has no
    * legitimate keeper inside a training corpus.
    *
    * Output: the [[stripRepeatedSpans]] shape — (idCol, n_tokens,
    * n_removed, clean_text) for every `docs` row.
    *
    * Scale shape: the eval side contributes only its DISTINCT window
    * hashes (eval-set-bounded — benchmarks are tiny next to a corpus),
    * broadcast into the train side's window join; the train side pays
    * one kernel pass + the id-keyed interval merge, never a
    * corpus-vs-corpus surface.
    */
  def stripMatching(
      spark: SparkSession, docs: DataFrame, contaminated: DataFrame,
      k: Int, idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(k >= 2, "a span of fewer than 2 tokens is a stopword, not contamination")
    val evalHashes = explodeWindows(
        windowPass(contaminated, idCol, textCol, k))
      .select("h").distinct()
    val hits = explodeWindows(windowPass(docs, idCol, textCol, k))
      .join(broadcast(evalHashes), Seq("h"))
      .select("id", "pos")
    stripByHits(docs, hits, k, idCol, textCol)
  }

  /** (id, pos) removal hits -> per-document stripped text: maximal
    * k-wide interval merge, then a pure per-row indexed-array filter of
    * the re-tokenized text (shared by [[stripRepeatedSpans]],
    * [[stripIncrement]] and [[stripMatching]] so the normalization
    * contract cannot drift).
    */
  private def stripByHits(
      docs: DataFrame, hits: DataFrame, k: Int,
      idCol: String, textCol: String): DataFrame = {
    val w = Window.partitionBy("id").orderBy("pos")
    val spans = hits
      .withColumn("prev", lag("pos", 1).over(w))
      .withColumn("new_span",
        when(col("prev").isNull || col("pos") > col("prev") + k, 1L).otherwise(0L))
      .withColumn("span_id", sum("new_span").over(w))
      .groupBy("id", "span_id")
      .agg(min("pos").as("s"), (max("pos") + k - 1).cast("long").as("e"))
      .groupBy("id")
      .agg(collect_list(struct(col("s").cast("long").as("s"), col("e"))).as("spans"))
    val toks = TextFunctions.tokens(col(textCol))
    val noSpans = array().cast("array<struct<s:bigint,e:bigint>>")
    // token kept <=> its position is outside every removal interval; the
    // indexed transform carries positions so the filter is pure per-row
    // array work
    val kept = filter(
      transform(col("toks"), (t, i) => struct(t.as("t"), i.cast("long").as("i"))),
      x => !exists(col("spans"), sp => x("i") >= sp("s") && x("i") <= sp("e")))
    docs
      .select(col(idCol).as("id"), toks.as("toks"))
      .join(spans, Seq("id"), "left")
      .withColumn("spans", coalesce(col("spans"), noSpans))
      .withColumn("kept", kept)
      .select(col("id").as(idCol),
        size(col("toks")).cast("long").as("n_tokens"),
        (size(col("toks")) - size(col("kept"))).cast("long").as("n_removed"),
        array_join(transform(col("kept"), x => x("t")), " ").as("clean_text"))
  }

  /** WITHIN-GROUP repeated-span coverage against a [[writeSpanIndex]]
    * directory whose `carry` included `groupCol`: a window counts as
    * repeated only when it occurs in >= minDocs distinct documents OF THE
    * SAME GROUP. With `groupCol = "source"` this is boilerplate
    * detection: real-corpus boilerplate (site chrome, license headers,
    * forum signatures) is source-specific, and a cross-source global df
    * both dilutes it (threshold shared with unrelated quotes) and misses
    * the attribution — which source's template is polluting the corpus.
    *
    * Reuses the staged kernel output: the only per-audit work is one
    * map-combinable (group, hash)-keyed aggregate over stored 8-byte
    * hashes and the usual id-keyed span merge. Output adds `groupCol`
    * after the id.
    */
  def groupedSpanCoverageFromIndex(
      spark: SparkSession, dir: String, groupCol: String,
      idCol: String = "doc_id", minDocs: Int = 2): DataFrame = {
    require(minDocs >= 2, "a span repeated in fewer than 2 docs is not repeated")
    val k = spark.read.parquet(s"$dir/meta").head().getAs[Int]("k")
    val doc = spark.read.parquet(s"$dir/docs")
    require(doc.columns.contains(groupCol),
      s"index at $dir does not carry '$groupCol' — rebuild with carry = Seq($groupCol)")
    val win = explodeWindows(doc, extra = Seq(groupCol))
    val rep = win.groupBy(groupCol, "h")
      .agg(countDistinct(col("id")).as("nd"))
      .filter(col("nd") >= minDocs)
      .select(groupCol, "h")
    val hits = win.join(rep, Seq(groupCol, "h")).select("id", "pos")
    finishCoverage(doc, mergeSpans(hits, k), idCol, extra = Seq(groupCol))
  }
}
