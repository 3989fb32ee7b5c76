package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

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
  * Scale shape — skew is the design constraint here, not volume: token
  * frequency is Zipfian, so a token-keyed shuffle of OCCURRENCE rows
  * sends every "the"/"of" row to one reducer — single hot partitions
  * carrying a significant fraction of the corpus at 100× scale. The
  * scoring join therefore splits by frequency: the top-`headVocab`
  * tokens by cf BROADCAST (Zipf: a few MB of head vocabulary covers
  * >99% of token mass), and only the residual tail — rare tokens, so
  * near-uniform by construction — shuffles by token. The exploded
  * (doc_id, token) stream is pinned ([[CacheScope]]) for the duration:
  * it feeds the cf aggregate and the scoring join, and without the pin
  * the corpus would tokenize twice. The closing doc-keyed aggregation
  * map-side-combines to per-doc partials before its exchange.
  */
object UnigramLm {

  /** Per-document unigram NLL over the corpus MLE: (idCol, n_tokens,
    * nll rounded to 6dp). Tokens are the engine's normalized whitespace
    * tokens; every token of the doc counts (term frequency, not
    * presence). Documents whose tokenization is empty (null/empty/
    * whitespace-only text) are emitted with n_tokens=0 and a NULL nll —
    * a quality-filter consumer wants exactly those rows flagged, not
    * silently absent.
    *
    * `headVocab` sizes the broadcast head (see object doc); the split is
    * purely an execution strategy — results are identical for any value,
    * pinned by UnigramLmSpec against the single-join reference.
    */
  def scoreDocs(
      docs: DataFrame, idCol: String = "doc_id", textCol: String = "text",
      headVocab: Int = 1 << 16): DataFrame = {
    // split("") yields [""], so blank text would otherwise contribute one
    // empty-string "token" to cf and score against it — filter it: blank
    // docs are ZERO-token docs (consistent with tokenCountWs)
    val tok = CacheScope.pin(
      ScaleOut(docs.select(col(idCol), col(textCol)))
        .select(col(idCol), explode(tokens(col(textCol))).as("token"))
        .filter(col("token") =!= ""),
      StorageLevel.MEMORY_AND_DISK)
    val cf = tok.groupBy("token").agg(count(lit(1)).as("cf"))
    val n = cf.agg(sum("cf").cast("double").as("n"))
    // Zipf head: vocab-sized sort-limit, then one broadcast join covers
    // >99% of occurrence rows; only head-miss rows reach the tail shuffle
    val head = cf.orderBy(col("cf").desc, col("token")).limit(headVocab)
    val tailCf = cf.join(broadcast(head.select("token")), Seq("token"), "left_anti")
    val headJoined = tok.join(broadcast(head), Seq("token"), "left")
    val scored = headJoined.filter(col("cf").isNotNull).unionByName(
        headJoined.filter(col("cf").isNull).drop("cf")
          .join(tailCf, Seq("token")))
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_tokens"), avg(log(col("cf"))).as("mean_ln_cf"))
      .crossJoin(broadcast(n)) // 1-row scalar, not a data-sized cross
      .select(col(idCol), col("n_tokens"),
        round(log(col("n")) - col("mean_ln_cf"), 6).as("nll"))
    docs.select(col(idCol)).join(scored, Seq(idCol), "left")
      .select(col(idCol), coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        col("nll"))
  }
}
