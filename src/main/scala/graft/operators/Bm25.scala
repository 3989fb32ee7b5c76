package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions.{tokenCountWs, tokens}
import graft.functions.expr.TopKFunctions.boundedTopK

/** BM25 keyword search (Robertson/Spärck Jones probabilistic ranking,
  * the Lucene `1 + (N-df+0.5)/(df+0.5)` idf form) — the lexical
  * retrieval twin of the ANN family, for query sets known up front
  * (eval-suite retrieval, contamination probes, corpus triage).
  *
  * Execution shape for 100 TB:
  *  - the token stream is filtered to the union of query terms
  *    IMMEDIATELY after the explode — only rows for query terms ever
  *    reach an exchange; everything else dies map-side;
  *  - doc length travels WITH the exploded rows (computed once per doc
  *    pre-explode), so no corpus-wide doc_id join is needed;
  *  - corpus stats (N, Σdl) are one scalar aggregate; df is an
  *    aggregate of the restricted term frequencies (≤ #terms rows,
  *    broadcast back);
  *  - ranking runs through the bounded top-k aggregate
  *    ([[graft.functions.expr.BoundedTopK]]), so the per-query exchange
  *    carries ≤ k entries per partition, and ranking happens on the
  *    ROUNDED score (6 dp) with doc_id tiebreak — deterministic and
  *    engine-portable (the raw double differs in summation order only).
  *
  * Scores are round(Σ_t idf·tf·(k1+1)/(tf + k1·(1−b+b·dl/avgdl)), 6)
  * with k1=1.2, b=0.75; arithmetic is written to match the DuckDB
  * oracle literal-for-literal.
  */
object Bm25 {

  /** Top-k docs per keyword query as (query_id, rank, doc_id, score). */
  def search(
      docs: DataFrame,
      queries: Seq[(String, Seq[String])],
      k: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._

    val allTerms = queries.flatMap(_._2).distinct
    val qTable = broadcast(
      queries.flatMap { case (q, ts) => ts.map(t => (q, t)) }.toDF("query_id", "token"))

    // dl rides along pre-explode; non-query-term rows die before any shuffle
    val toks = docs
      .select(col("doc_id"), tokenCountWs(col("text")).as("dl"),
        explode(tokens(col("text"))).as("token"))
      .filter(col("token").isin(allTerms: _*))

    val stats = docs
      .agg(count(lit(1)).cast("double").as("n"),
        sum(tokenCountWs(col("text"))).cast("double").as("sumdl"))
      .head()
    val n = stats.getDouble(0)
    val avgdl = stats.getDouble(1) / n

    val tf = toks.groupBy("doc_id", "token")
      .agg(count(lit(1)).as("tf"), first(col("dl")).as("dl"))
    val df = broadcast(
      tf.groupBy("token").agg(count(lit(1)).cast("double").as("df")))

    val idf = log(lit(1.0) + (lit(n) - col("df") + lit(0.5)) / (col("df") + lit(0.5)))
    val tfNorm = col("tf") * lit(2.2) /
      (col("tf") + lit(1.2) * (lit(0.25) + lit(0.75) * col("dl") / lit(avgdl)))

    val scored = tf.join(df, "token").join(qTable, "token")
      .groupBy("query_id", "doc_id")
      .agg(round(sum(idf * tfNorm), 6).as("score"))

    scored.groupBy("query_id")
      .agg(boundedTopK(col("score"), col("doc_id"), k).as("top"))
      .select(col("query_id"), posexplode(col("top")))
      .select(col("query_id"), (col("pos") + 1).cast("long").as("rank"),
        col("col.id").as("doc_id"), col("col.score").as("score"))
      .orderBy("query_id", "rank")
  }
}
