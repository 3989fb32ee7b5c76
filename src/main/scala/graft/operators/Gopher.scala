package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions.{normText, tokenCountWs}

/** Rule-based document quality filtering in the Gopher style (Rae et al.
  * 2021, App. A — the word-level subset; the line-shape rules need a
  * line-structured corpus and are out of scope for a single-line one):
  * per document the auditable metrics and a composite keep verdict —
  * the cheap FIRST filter a curation pipeline runs before the
  * corpus-LM (q89/q97/q114) and trained-classifier (q118) rungs.
  *
  * Everything is built-ins over the normalized text, one scan, zero
  * shuffle, no higher-order functions (Spark 4 evaluates those
  * interpreted):
  *
  *  - `n_words`: whitespace token count;
  *  - `mean_word_len`: total word chars / words, computed WITHOUT
  *    touching the token array — the normalized text joins words with
  *    single spaces, so total chars = length(norm) − (n_words − 1);
  *  - `alpha_word_frac`: words containing a letter, counted by one
  *    codegen'd regexp pass over ' ' || norm (every word owns exactly
  *    one leading space; ` [^ ]*[a-z]` matches that space iff its word
  *    contains a letter, and non-overlapping scanning counts each word
  *    at most once — identical counts under RE2 and Java regex);
  *  - `symbol_word_ratio`: '#' or '...' occurrences per word (the
  *    Gopher symbol rule);
  *  - `stop_present`: how many of the 8 canonical stopwords appear
  *    (presence, not frequency — the rule wants evidence of running
  *    prose, and presence is corpus-size-free).
  *
  * Ratios are rounded to 6 dp BEFORE the verdict compares them, so the
  * keep flag is a pure function of the reported metrics (no hidden
  * precision the oracle cannot see).
  */
object Gopher {

  val stopwords: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  def metrics(
      docs: DataFrame, idCol: String = "doc_id", textCol: String = "text",
      minWords: Long = 50, maxWords: Long = 100000,
      minMeanWordLen: Double = 3.0, maxMeanWordLen: Double = 10.0,
      maxSymbolRatio: Double = 0.1, minAlphaFrac: Double = 0.8,
      minStopwords: Int = 2): DataFrame = {
    val norm = normText(col(textCol))
    val nWords = tokenCountWs(col(textCol))
    val meanLen = round(
      when(col("n_words") === 0, 0.0)
        .otherwise((length(col("nrm")) - col("n_words") + 1).cast("double") /
          col("n_words")), 6)
    val alphaWords =
      size(regexp_extract_all(concat(lit(" "), col("nrm")),
        lit(" [^ ]*[a-z]"), lit(0))).cast("long")
    val symbols =
      size(regexp_extract_all(col(textCol), lit("#|\\.\\.\\."), lit(0))).cast("long")
    val stopPresent: Column = stopwords
      .map(w => when(contains(concat(lit(" "), col("nrm"), lit(" ")),
        lit(s" $w ")), 1).otherwise(0))
      .reduce(_ + _)
    docs
      .select(col(idCol), col(textCol), norm.as("nrm"), nWords.as("n_words"))
      .select(
        col(idCol),
        col("n_words"),
        meanLen.as("mean_word_len"),
        round(when(col("n_words") === 0, 0.0)
          .otherwise(alphaWords.cast("double") / col("n_words")), 6)
          .as("alpha_word_frac"),
        round(when(col("n_words") === 0, 0.0)
          .otherwise(symbols.cast("double") / col("n_words")), 6)
          .as("symbol_word_ratio"),
        stopPresent.cast("long").as("stop_present"))
      .withColumn("keep",
        col("n_words") >= minWords && col("n_words") <= maxWords &&
          col("mean_word_len") >= minMeanWordLen &&
          col("mean_word_len") <= maxMeanWordLen &&
          col("symbol_word_ratio") <= maxSymbolRatio &&
          col("alpha_word_frac") >= minAlphaFrac &&
          col("stop_present") >= minStopwords)
  }
}
