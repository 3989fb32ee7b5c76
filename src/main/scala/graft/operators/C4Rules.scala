package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** C4-style LINE-LEVEL cleaning + page gating (Raffel et al., JMLR
  * 2020 §2.2 — the rule set behind the C4 corpus), the line-granularity
  * member of the rule-filter family beside the doc-level Gopher rules
  * (q124) and the paragraph-dedup family (q140/q142):
  *
  *   line KEPT  iff it ends in terminal punctuation (. ! ? "),
  *              has >= `minLineWords` whitespace words, and does not
  *              mention "javascript" (case-folded);
  *   page KEPT  iff its raw text contains neither "lorem ipsum"
  *              (case-folded) nor a curly brace '{', and >= `minLines`
  *              lines survived the line rules.
  *
  * Output: (idCol, page_kept, n_lines, n_kept_lines, clean_text) for
  * EVERY input page — dropped pages keep their audit columns (a
  * curation run reports what it removed and why; it does not silently
  * shrink), `clean_text` = the surviving lines joined by newline in
  * original order.
  *
  * Scale shape: the whole operator is ONE map-side pass in the scan —
  * `split` on newline, a per-row array `filter`, `array_join` — no
  * exchange of any kind before the caller's presentation sort. The
  * per-row array work runs as interpreted higher-order functions,
  * acceptable because this transform runs once per corpus state (the
  * [[Spans.stripRepeatedSpans]] tradeoff note); every predicate is
  * regex-backreference-free so the identical rules replay under Java
  * regex and RE2 (the DuckDB oracle).
  */
object C4Rules {

  def clean(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", minLineWords: Int = 3,
      minLines: Int = 2): DataFrame = {
    val lines = split(col(textCol), "\n")
    // \s+ split: a run of spaces/tabs is ONE separator, so "a  b." counts
    // 2 words — the C4 paper's whitespace-word semantics (r13 advice; a
    // single-space split counted the empties between consecutive spaces)
    def lineKept(l: Column): Column =
      l.rlike("[.!?\"]$") &&
        size(split(trim(l), "\\s+")) >= minLineWords &&
        !lower(l).contains("javascript")
    val kept = filter(lines, lineKept _)
    docs.select(
      col(idCol),
      (!lower(col(textCol)).contains("lorem ipsum") &&
        !col(textCol).contains("{") &&
        size(filter(lines, lineKept _)) >= minLines).as("page_kept"),
      size(lines).cast("long").as("n_lines"),
      size(kept).cast("long").as("n_kept_lines"),
      array_join(kept, "\n").as("clean_text"))
  }
}
