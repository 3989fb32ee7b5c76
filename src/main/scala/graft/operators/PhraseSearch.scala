package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions.tokens

/** POSITIONAL PHRASE SEARCH — exact consecutive-token phrase matching
  * over an inverted index with positions, the retrieval primitive BM25
  * (q99, bag-of-words) cannot express: "spark sql" must match the
  * adjacent pair, not documents containing both words apart.
  *
  * Algorithm: the ALIGNMENT join. A phrase is rows (phrase_id, offset,
  * term); every posting (doc, pos, token) matching a phrase term
  * proposes the candidate start `pos − offset`; a start having ALL
  * `len(phrase)` offsets matched is an occurrence. One term-keyed join
  * + one (phrase, doc, start)-keyed count — and a phrase with repeated
  * terms ("b a b") needs no special case: each (term, offset) row
  * matches its own posting, so the count reaches len(phrase) only on
  * full alignment.
  *
  * Reference scope: no text search in the reference; extension beside
  * BM25 (q99) and the all-pairs similarity join (q152).
  *
  * Scale shape: the phrase table is query-sized (BROADCAST); the join
  * touches only the QUERY TERMS' postings (Σ df(term) rows, the
  * classic postings-bounded cost), and the occurrence aggregation is
  * map-side-combinable on (phrase, doc, start). The corpus-sized
  * posting build is one tokenize pass, shared/staged by the caller.
  */
object PhraseSearch {

  /** Positional postings (idCol, pos, token) of the engine's normalized
    * whitespace tokens; blank docs contribute nothing.
    */
  def postings(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame =
    ScaleOut(docs.select(col(idCol), col(textCol)))
      .select(col(idCol), posexplode(tokens(col(textCol))).as(Seq("pos", "token")))
      .filter(col("token") =!= "")

  /** Occurrences (phrase_id, idCol, start) — one row per exact
    * consecutive match. `phrases`: (phrase_id, offset, term) with
    * offsets 0..len−1 (duplicate terms allowed; rows must be unique).
    */
  def occurrences(postings: DataFrame, phrases: DataFrame,
      idCol: String = "doc_id"): DataFrame = {
    val plen = phrases.groupBy("phrase_id")
      .agg(count(lit(1)).as("len"), (max("offset") + 1).as("span"))
      .select(col("phrase_id"),
        when(col("len") === col("span"), col("len"))
          .otherwise(raise_error(concat(lit("PhraseSearch: non-contiguous offsets for phrase "),
            col("phrase_id").cast("string")))).as("len"))
    postings.join(broadcast(phrases), col("token") === col("term"))
      .select(col("phrase_id"), col(idCol), (col("pos") - col("offset")).as("start"))
      .groupBy("phrase_id", idCol, "start")
      .agg(count(lit(1)).as("matched"))
      .join(broadcast(plen), Seq("phrase_id"))
      .filter(col("matched") === col("len"))
      .select(col("phrase_id"), col(idCol), col("start"))
  }
}
