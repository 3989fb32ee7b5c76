package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions.tokens

/** Corpus-language-model quality scoring — the CCNet-shaped filter
  * (Wenzek et al., LREC 2020): score every document by its negative
  * log-likelihood under a language model of the corpus itself, then
  * keep/bucket by score. CCNet uses a KenLM 5-gram; the distributed
  * in-engine stand-in is the unigram MLE — same filter surface
  * (well-formed prose scores low, gibberish / OCR noise / rare-token
  * spam scores high), no external model artifact, and the whole
  * computation is two token-keyed aggregations. (A KenLM-grade model
  * plugs in as a broadcast scorer over the same per-doc token arrays —
  * the [[graft.multimodal]] stub pattern; the pipeline shape here is the
  * real, tested part.)
  *
  * score(doc) = mean over tokens of −ln p(token), with
  * p(token) = cf(token) / N from THIS corpus (MLE; no token is unseen by
  * construction). Equivalently ln N − mean(ln cf) — the form computed,
  * so the corpus total N enters once as a scalar, not per row.
  *
  * Scale shape: corpus frequencies are one map-combinable token-keyed
  * aggregate (vocabulary-sized result); scoring is one (token)-keyed
  * join of exploded (doc_id, token) rows against that table, then one
  * doc-keyed mean. Token rows cross two exchanges but carry only
  * (doc_id, token); at web scale the standard refinement is a broadcast
  * head-vocabulary (Zipf: a few MB covers >99% of token mass) with a
  * shuffle tail for the rest.
  */
object UnigramLm {

  /** Per-document unigram NLL over the corpus MLE: (idCol, n_tokens,
    * nll rounded to 6dp). Tokens are the engine's normalized whitespace
    * tokens; every token of the doc counts (term frequency, not
    * presence).
    */
  def scoreDocs(
      docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val tok = ScaleOut(docs.select(col(idCol), col(textCol)))
      .select(col(idCol), explode(tokens(col(textCol))).as("token"))
    val cf = tok.groupBy("token").agg(count(lit(1)).as("cf"))
    val n = cf.agg(sum("cf").cast("double").as("n"))
    tok.join(cf, "token")
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_tokens"), avg(log(col("cf"))).as("mean_ln_cf"))
      .crossJoin(broadcast(n)) // 1-row scalar, not a data-sized cross
      .select(col(idCol), col("n_tokens"),
        round(log(col("n")) - col("mean_ln_cf"), 6).as("nll"))
  }
}
