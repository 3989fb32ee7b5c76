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
  def stripDuplicatedParagraphs(
      df: DataFrame, idCol: String, textCol: String,
      sep: String = "\n"): DataFrame = {
    val keyed = ScaleOut(df.select(col(idCol).cast("long").as("id"), col(textCol).as("t")))
    val pars = keyed
      .select(col("id"), posexplode(split(col("t"), java.util.regex.Pattern.quote(sep))))
      .select(col("id"), col("pos").cast("long").as("pos"), col("col").as("par"),
        md5(encode(lower(trim(col("col"))), "UTF-8")).as("h"))
      // fail fast: a position at or past PosBase would collide packed keys
      .filter(when(col("pos") < PosBase, lit(true))
        .otherwise(raise_error(lit(
          s"ParagraphDedup: paragraph position >= $PosBase")).cast("boolean")))
      .withColumn("occ", col("id") * PosBase + col("pos"))
    val first = pars.groupBy("h").agg(min(col("occ")).as("first_occ"))
    val kept = pars.join(first, "h").filter(col("occ") === col("first_occ"))
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
}
