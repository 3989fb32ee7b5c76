package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus-wide PARAGRAPH deduplication with keep-first semantics — the
  * CCNet preprocessing step (Wenzek et al. 2020: documents are split on
  * line boundaries, each normalized line is hashed, and every
  * occurrence after the global first is removed before any LM scoring).
  * Structurally distinct from the repeated-span family ([[Spans]]):
  * spans are fixed-width TOKEN windows under a rolling hash (license
  * blobs at any alignment), paragraphs are DELIMITER-structured exact
  * units (site chrome, headers, footers) — real pipelines run both.
  *
  * Reference scope: the reference has no text processing at all;
  * extension surface of the curation family.
  *
  * Keep-first rule: a paragraph occurrence survives iff it is the
  * globally FIRST occurrence of its normalized form, ordered by
  * (doc_id, position) — duplicated boilerplate keeps exactly one copy
  * corpus-wide, singletons are untouched. Normalization for the match
  * key is lowercase+trim (the CCNet shape); the SURVIVING text keeps
  * its original bytes.
  *
  * Scale shape: one posexplode (map-side), one md5-keyed
  * min-aggregate (map-side combinable — the hot key a global footer
  * creates is combined per partition before the exchange), one
  * md5-keyed join of occurrences to their group's first key, and one
  * per-doc re-aggregate. Deliberately NOT a window function
  * (`row_number over (partition by hash)`): the window shape forces
  * every occurrence of the hottest paragraph into ONE task, while the
  * aggregate+join shape keeps the hot group map-side-combined and the
  * join output occurrence-sized. First-occurrence keys are
  * `doc_id * PosBase + pos` — integer, so the DuckDB twin replays them
  * exactly; `pos` must stay below [[PosBase]] (enforced).
  */
object ParagraphDedup {

  /** Positions-per-document bound for the packed first-occurrence key;
    * far above any real paragraph count per document.
    */
  val PosBase = 1000000L

  /** Strip corpus-duplicated paragraphs from `textCol`, keeping each
    * normalized paragraph's globally first occurrence. Output:
    * (idCol, n_pars, n_kept, clean_text), one row per input row,
    * `clean_text` = surviving paragraphs rejoined with `sep` in
    * original order ("" when nothing survives).
    */
  /** (id, pos, par, h, occ) per paragraph: normalized-form md5 key and
    * the packed first-occurrence ordering key.
    */
  def paragraphs(df: DataFrame, idCol: String, textCol: String,
      sep: String = "\n"): DataFrame =
    ScaleOut(df.select(col(idCol).cast("long").as("id"), col(textCol).as("t")))
      .select(col("id"), posexplode(split(col("t"), java.util.regex.Pattern.quote(sep))))
      .select(col("id"), col("pos").cast("long").as("pos"), col("col").as("par"),
        md5(encode(lower(trim(col("col"))), "UTF-8")).as("h"))
      // fail fast: a position at or past PosBase would collide packed keys
      .filter(when(col("pos") < PosBase, lit(true))
        .otherwise(raise_error(lit(
          s"ParagraphDedup: paragraph position >= $PosBase")).cast("boolean")))
      .withColumn("occ", col("id") * PosBase + col("pos"))

  /** Per normalized paragraph: the globally first occurrence key — the
    * corpus-side state an incremental consumer persists.
    */
  def firstOccurrences(pars: DataFrame): DataFrame =
    pars.groupBy("h").agg(min(col("occ")).as("first_occ"))

  /** Reassemble surviving paragraph rows (id, pos, par) into the
    * per-document output contract, re-attaching rows whose every
    * paragraph dropped (n_kept = 0, clean_text = "").
    */
  private def reassemble(pars: DataFrame, kept: DataFrame, idCol: String,
      sep: String): DataFrame = {
    val totals = pars.groupBy("id").agg(count(lit(1)).as("n_pars"))
    val keptAgg = kept.groupBy("id").agg(
      count(lit(1)).as("n_kept"),
      concat_ws(sep, transform(
        array_sort(collect_list(struct(col("pos"), col("par")))),
        s => s.getField("par"))).as("clean_text"))
    totals.join(keptAgg, Seq("id"), "left")
      .select(col("id").as(idCol), col("n_pars"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        coalesce(col("clean_text"), lit("")).as("clean_text"))
  }

  def stripDuplicatedParagraphs(
      df: DataFrame, idCol: String, textCol: String,
      sep: String = "\n"): DataFrame = {
    val pars = paragraphs(df, idCol, textCol, sep)
    val kept = pars.join(firstOccurrences(pars), "h")
      .filter(col("occ") === col("first_occ"))
    reassemble(pars, kept, idCol, sep)
  }

  /** Incremental maintenance: strip an INCREMENT against a persisted
    * corpus first-occurrence table ([[firstOccurrences]] of the corpus,
    * columns (h, first_occ)) without re-reading the corpus. A paragraph
    * occurrence in the increment survives iff it is the first
    * occurrence across corpus ∪ increment — i.e. its normalized form is
    * absent from the corpus state AND it is the increment's own first.
    * Equals the from-scratch [[stripDuplicatedParagraphs]] over
    * corpus ∪ increment restricted to increment rows, provided corpus
    * keys precede increment keys (the append-only id contract the
    * incremental dedup family assumes); ParagraphDedupSpec pins the
    * equality including the general min-merge when they don't.
    *
    * Scale shape: the corpus contributes its STATE (one row per
    * distinct paragraph), never a re-scan; the join is keyed on the
    * paragraph hash.
    */
  def stripIncrement(incDf: DataFrame, corpusFirst: DataFrame,
      idCol: String, textCol: String, sep: String = "\n"): DataFrame = {
    val pars = paragraphs(incDf, idCol, textCol, sep)
    val incFirst = firstOccurrences(pars)
      .select(col("h"), col("first_occ").as("inc_first"))
    val kept = pars.join(incFirst, "h")
      .join(corpusFirst.select(col("h"), col("first_occ").as("corp_first")),
        Seq("h"), "left")
      .filter(col("occ") === least(
        coalesce(col("corp_first"), col("inc_first")), col("inc_first")))
    reassemble(pars, kept, idCol, sep)
  }
}
