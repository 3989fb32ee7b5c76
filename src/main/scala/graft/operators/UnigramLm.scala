package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
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

  /** Per-document BIGRAM NLL with add-one (Laplace) smoothing — the next
    * model up the CCNet ladder from [[scoreDocs]]: unigram MLE scores
    * word-salad reorderings exactly like prose, a bigram model does not
    * (gibberish pays through unseen transitions). Same surface and
    * zero-token contract as [[scoreDocs]]: (idCol, n_tokens, nll 6dp),
    * blank/whitespace docs emitted with n_tokens=0 and NULL nll.
    *
    * Model: every position scores its transition, the first against the
    * BOS context `""` (never a real token — blank splits are filtered —
    * so the sentinel cannot collide and n_positions == n_tokens):
    *
    *   p(cur | prev) = (bcf(prev, cur) + 1) / (ctx(prev) + V)
    *
    * with bcf the corpus bigram count, ctx(prev) = Σ_cur bcf(prev, cur)
    * (so BOS's context mass is the doc count), and V the unigram
    * vocabulary size — the standard add-one estimator, every transition
    * seen or unseen gets positive mass.
    *
    * Scale shape mirrors [[scoreDocs]], with bigram keys: token
    * adjacency comes from one `lag` window keyed by (doc, pos) — a
    * per-document shuffle with no hot key, docs being bounded — and the
    * Zipfian scoring joins split by frequency: the top-`headVocab`
    * bigrams and contexts BROADCAST (bigram frequency is itself Zipfian
    * — "of the" is the new "the"), only the near-uniform tails shuffle
    * by their keys. The adjacency stream is pinned (feeds the bigram
    * count and the scoring join); bcf is pinned (feeds head selection,
    * the tail join, and the context aggregate, and is vocab²-bounded —
    * corpus-size-independent). The closing doc-keyed aggregation
    * map-side-combines as in the unigram.
    */
  def scoreDocsBigram(
      docs: DataFrame, idCol: String = "doc_id", textCol: String = "text",
      headVocab: Int = 1 << 16): DataFrame = {
    val w = Window.partitionBy(col(idCol)).orderBy(col("pos"))
    val tok = CacheScope.pin(
      ScaleOut(docs.select(col(idCol), col(textCol)))
        .select(col(idCol), posexplode(tokens(col(textCol))).as(Seq("pos", "token")))
        .filter(col("token") =!= ""),
      StorageLevel.MEMORY_AND_DISK)
    val bg = CacheScope.pin(
      tok.select(col(idCol),
        coalesce(lag(col("token"), 1).over(w), lit("")).as("prev"),
        col("token").as("cur")),
      StorageLevel.MEMORY_AND_DISK)
    val bcf = CacheScope.pin(
      bg.groupBy("prev", "cur").agg(count(lit(1)).as("bcf")),
      StorageLevel.MEMORY_AND_DISK)
    val ctx = bcf.groupBy("prev").agg(sum("bcf").as("ctx"))
    val vRow = tok.agg(countDistinct(col("token")).cast("double").as("v"))
    // Zipf head of the BIGRAM table: one broadcast join covers the bulk
    // of transition rows; only head-miss rows shuffle by (prev, cur)
    val headBg = bcf.orderBy(col("bcf").desc, col("prev"), col("cur")).limit(headVocab)
    val tailBg = bcf.join(broadcast(headBg.select("prev", "cur")), Seq("prev", "cur"), "left_anti")
    val bgJoined = bg.join(broadcast(headBg), Seq("prev", "cur"), "left")
    val withBcf = bgJoined.filter(col("bcf").isNotNull).unionByName(
      bgJoined.filter(col("bcf").isNull).drop("bcf")
        .join(tailBg, Seq("prev", "cur")))
    // same split for the CONTEXT counts, keyed by prev alone
    val headCtx = ctx.orderBy(col("ctx").desc, col("prev")).limit(headVocab)
    val tailCtx = ctx.join(broadcast(headCtx.select("prev")), Seq("prev"), "left_anti")
    val ctxJoined = withBcf.join(broadcast(headCtx), Seq("prev"), "left")
    val scored = ctxJoined.filter(col("ctx").isNotNull).unionByName(
        ctxJoined.filter(col("ctx").isNull).drop("ctx").join(tailCtx, Seq("prev")))
      .crossJoin(broadcast(vRow)) // 1-row scalar, not a data-sized cross
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_tokens"),
        avg(log(col("ctx") + col("v")) - log(col("bcf") + lit(1))).as("mean_nll"))
      .select(col(idCol), col("n_tokens"), round(col("mean_nll"), 6).as("nll"))
    docs.select(col(idCol)).join(scored, Seq(idCol), "left")
      .select(col(idCol), coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        col("nll"))
  }

  /** Per-document INTERPOLATED KNESER-NEY bigram NLL — the rung above
    * [[scoreDocsBigram]]'s add-one estimator (Kneser & Ney 1995; the
    * smoothing KenLM — CCNet's actual scorer — uses, here at bigram
    * order with a fixed absolute discount):
    *
    *   p(cur | prev) = max(bcf − d, 0)/ctx(prev)
    *                   + (d · N1+(prev,·)/ctx(prev)) · (N1+(·,cur)/B)
    *
    * with N1+(prev,·) the distinct continuations of prev, N1+(·,cur)
    * the distinct contexts cur follows (the CONTINUATION count — "how
    * many kinds of places does this word appear after", the insight
    * that separates KN from Katz backoff), and B the number of distinct
    * bigram types. Add-one gives every unseen transition the same mass
    * regardless of the word; KN's continuation probability makes a
    * versatile word cheap and a fixed-collocation word ("Francisco")
    * expensive outside its collocation. Same surface and zero-token
    * contract as the siblings: (idCol, n_tokens, nll 6dp), NULL nll for
    * blank docs. `discount` defaults to the standard 0.75 (exactly
    * representable, so the arithmetic replays bit-identically in an
    * oracle).
    *
    * Scale shape — ONE key improvement over [[scoreDocsBigram]]: every
    * KN ingredient (ctx, both N1+ tables, B) is a pure function of the
    * bigram-count table, so the per-pair log-probability PRECOMPUTES on
    * that vocab²-bounded model table — the corpus-sized occurrence
    * stream pays exactly one (prev, cur) → lnp lookup join, split
    * Zipf-head/tail like the siblings (the head broadcast ordered by
    * pair frequency, so it covers the same occurrence mass).
    */
  def scoreDocsKneserNey(
      docs: DataFrame, idCol: String = "doc_id", textCol: String = "text",
      headVocab: Int = 1 << 16, discount: Double = 0.75): DataFrame = {
    require(discount > 0 && discount < 1, "absolute discount in (0, 1)")
    val w = Window.partitionBy(col(idCol)).orderBy(col("pos"))
    val tok = CacheScope.pin(
      ScaleOut(docs.select(col(idCol), col(textCol)))
        .select(col(idCol), posexplode(tokens(col(textCol))).as(Seq("pos", "token")))
        .filter(col("token") =!= ""),
      StorageLevel.MEMORY_AND_DISK)
    val bg = CacheScope.pin(
      tok.select(col(idCol),
        coalesce(lag(col("token"), 1).over(w), lit("")).as("prev"),
        col("token").as("cur")),
      StorageLevel.MEMORY_AND_DISK)
    val bcf = CacheScope.pin(
      bg.groupBy("prev", "cur").agg(count(lit(1)).as("bcf")),
      StorageLevel.MEMORY_AND_DISK)
    // model-table aggregates: context mass + distinct-continuation count
    // in ONE prev-keyed pass; continuation counts cur-keyed; B scalar
    val ctxN1p = bcf.groupBy("prev")
      .agg(sum("bcf").as("ctx"), count(lit(1)).as("n1p"))
    val n1c = bcf.groupBy("cur").agg(count(lit(1)).as("n1c"))
    val btRow = bcf.agg(count(lit(1)).cast("double").as("bt"))
    // per-pair KN log-prob, precomputed on the model table (joins here
    // are vocab²-bounded, never corpus-sized); expression tree written
    // to match the oracle's SQL op-for-op so the doubles are identical
    val pairLnp = CacheScope.pin(
      bcf.join(ctxN1p, Seq("prev"))
        .join(n1c, Seq("cur"))
        .crossJoin(broadcast(btRow)) // 1-row scalar
        .select(col("prev"), col("cur"), col("bcf"),
          log(greatest(col("bcf") - lit(discount), lit(0.0)) / col("ctx")
            + ((lit(discount) * col("n1p")) / col("ctx"))
              * (col("n1c") / col("bt"))).as("lnp")),
      StorageLevel.MEMORY_AND_DISK)
    // the occurrence stream's ONLY model join: Zipf head (by pair
    // frequency) broadcasts, tail shuffles by (prev, cur)
    val headP = pairLnp.orderBy(col("bcf").desc, col("prev"), col("cur"))
      .limit(headVocab).select("prev", "cur", "lnp")
    val tailP = pairLnp.select("prev", "cur", "lnp")
      .join(broadcast(headP.select("prev", "cur")), Seq("prev", "cur"), "left_anti")
    val joined = bg.join(broadcast(headP), Seq("prev", "cur"), "left")
    val scored = joined.filter(col("lnp").isNotNull).unionByName(
        joined.filter(col("lnp").isNull).drop("lnp")
          .join(tailP, Seq("prev", "cur")))
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_tokens"), avg(-col("lnp")).as("mean_nll"))
      .select(col(idCol), col("n_tokens"), round(col("mean_nll"), 6).as("nll"))
    docs.select(col(idCol)).join(scored, Seq(idCol), "left")
      .select(col(idCol), coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        col("nll"))
  }

  /** Per-document TRIGRAM interpolated Kneser-Ney NLL — the full Chen &
    * Goodman three-level recursion above [[scoreDocsKneserNey]]'s bigram
    * order (KenLM's shape, two orders of it):
    *
    *   p(w₃|w₁w₂) = max(c(w₁w₂w₃) − d, 0)/c(w₁w₂·)
    *                + (d · N1+(w₁w₂,·)/c(w₁w₂·)) · p_mid(w₃|w₂)
    *   p_mid(w₃|w₂) = max(N1+(·w₂w₃) − d, 0)/N1+(·w₂·)
    *                + (d · N1+(w₂,·)/N1+(·w₂·)) · p_uni(w₃)
    *   p_uni(w₃) = N1+(·w₃)/B
    *
    * — the highest order uses RAW counts, every lower order uses
    * CONTINUATION (type) counts, the defining property of interpolated
    * KN: the middle level asks "in how many distinct left contexts does
    * (w₂, w₃) occur", not "how often". All lower-order tables derive
    * from the trigram-TYPE table, so N1+(·w₂w₃) > 0 ⟺ c(w₂w₃) > 0
    * (every occurrence has a BOS-padded predecessor) and the recursion
    * grounds in bigram types B = |{(w₂,w₃)}|. Contexts pad with the
    * BOS sentinel `""` twice, so position 1 scores against ("", "") and
    * position 2 against ("", w₁) — n_positions == n_tokens as in the
    * siblings, and the same zero-token contract holds.
    *
    * Scale shape: the per-TRIGRAM-TYPE log-probability precomputes on
    * the type table (vocab³-bounded in principle, corpus-TYPE-bounded
    * in practice — every join there is keyed by type, never by
    * occurrence), and the corpus-sized occurrence stream pays exactly
    * one (p₂, p₁, cur) → lnp lookup join, Zipf-split head/tail like
    * every LM sibling. Expression tree written op-for-op against the
    * oracle's SQL so the doubles agree at 6 dp.
    */
  def scoreDocsKneserNeyTrigram(
      docs: DataFrame, idCol: String = "doc_id", textCol: String = "text",
      headVocab: Int = 1 << 16, discount: Double = 0.75): DataFrame = {
    require(discount > 0 && discount < 1, "absolute discount in (0, 1)")
    val w = Window.partitionBy(col(idCol)).orderBy(col("pos"))
    val tok = CacheScope.pin(
      ScaleOut(docs.select(col(idCol), col(textCol)))
        .select(col(idCol), posexplode(tokens(col(textCol))).as(Seq("pos", "token")))
        .filter(col("token") =!= ""),
      StorageLevel.MEMORY_AND_DISK)
    val tg = CacheScope.pin(
      tok.select(col(idCol),
        coalesce(lag(col("token"), 2).over(w), lit("")).as("p2"),
        coalesce(lag(col("token"), 1).over(w), lit("")).as("p1"),
        col("token").as("cur")),
      StorageLevel.MEMORY_AND_DISK)
    val tcf = CacheScope.pin(
      tg.groupBy("p2", "p1", "cur").agg(count(lit(1)).as("tcf")),
      StorageLevel.MEMORY_AND_DISK)
    // highest order: raw context mass + distinct continuations per (p2, p1)
    val ctx3 = tcf.groupBy("p2", "p1")
      .agg(sum("tcf").as("ctx3"), count(lit(1)).as("n1p3"))
    // middle order: continuation counts over trigram TYPES — c2 =
    // N1+(·p1 cur); one more pass gives N1+(·p1·) and N1+(p1,·)
    val cont2 = CacheScope.pin(
      tcf.groupBy("p1", "cur").agg(count(lit(1)).as("c2")),
      StorageLevel.MEMORY_AND_DISK)
    val mid = cont2.groupBy("p1")
      .agg(sum("c2").as("cmid"), count(lit(1)).as("n1pmid"))
    // lowest order over bigram types: N1+(·cur) and B
    val cont1 = cont2.groupBy("cur").agg(count(lit(1)).as("c1"))
    val btRow = cont2.agg(count(lit(1)).cast("double").as("bt"))
    val pairLnp = CacheScope.pin(
      tcf.join(ctx3, Seq("p2", "p1"))
        .join(cont2, Seq("p1", "cur"))
        .join(mid, Seq("p1"))
        .join(cont1, Seq("cur"))
        .crossJoin(broadcast(btRow)) // 1-row scalar
        .select(col("p2"), col("p1"), col("cur"), col("tcf"),
          log(greatest(col("tcf") - lit(discount), lit(0.0)) / col("ctx3")
            + ((lit(discount) * col("n1p3")) / col("ctx3"))
              * (greatest(col("c2") - lit(discount), lit(0.0)) / col("cmid")
                + ((lit(discount) * col("n1pmid")) / col("cmid"))
                  * (col("c1") / col("bt")))).as("lnp")),
      StorageLevel.MEMORY_AND_DISK)
    // the occurrence stream's ONLY model join: Zipf head (by type
    // frequency) broadcasts, tail shuffles by (p2, p1, cur)
    val headP = pairLnp.orderBy(col("tcf").desc, col("p2"), col("p1"), col("cur"))
      .limit(headVocab).select("p2", "p1", "cur", "lnp")
    val tailP = pairLnp.select("p2", "p1", "cur", "lnp")
      .join(broadcast(headP.select("p2", "p1", "cur")), Seq("p2", "p1", "cur"), "left_anti")
    val joined3 = tg.join(broadcast(headP), Seq("p2", "p1", "cur"), "left")
    val scored = joined3.filter(col("lnp").isNotNull).unionByName(
        joined3.filter(col("lnp").isNull).drop("lnp")
          .join(tailP, Seq("p2", "p1", "cur")))
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_tokens"), avg(-col("lnp")).as("mean_nll"))
      .select(col(idCol), col("n_tokens"), round(col("mean_nll"), 6).as("nll"))
    docs.select(col(idCol)).join(scored, Seq(idCol), "left")
      .select(col(idCol), coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        col("nll"))
  }

  /** Per-document 4-GRAM interpolated Kneser-Ney NLL — one more level
    * of the Chen & Goodman recursion above
    * [[scoreDocsKneserNeyTrigram]] (KenLM defaults to order 5; order 4
    * is the last rung where the type tables still shrink meaningfully
    * per level on natural text):
    *
    *   p(w₄|w₁w₂w₃) = max(c(w₁w₂w₃w₄) − d, 0)/c(w₁w₂w₃·)
    *                + (d · N1+(w₁w₂w₃,·)/c(w₁w₂w₃·)) · p₃(w₄|w₂w₃)
    *   p₃(w₄|w₂w₃) = max(N1+(·w₂w₃w₄) − d, 0)/N1+(·w₂w₃·)
    *                + (d · N1+(w₂w₃,·)/N1+(·w₂w₃·)) · p₂(w₄|w₃)
    *   p₂(w₄|w₃)   = max(N1+(·w₃w₄) − d, 0)/N1+(·w₃·)
    *                + (d · N1+(w₃,·)/N1+(·w₃·)) · p_uni(w₄)
    *   p_uni(w₄)   = N1+(·w₄)/B
    *
    * — raw counts ONLY at the highest order, continuation (type)
    * counts at every lower one, each lower table derived from the one
    * above by a groupBy-count over types (N1+(·w₃w₄) here counts
    * distinct w₂ with N1+(·w₂w₃w₄) > 0, which by BOS padding equals
    * distinct w₂ with c(w₂w₃w₄) > 0 — the same telescoping the trigram
    * order documents). Contexts pad with the BOS sentinel `""` three
    * times; n_positions == n_tokens and the zero-token contract hold
    * as in every sibling.
    *
    * Scale shape identical to the trigram order: every model join is
    * keyed by TYPE (4-gram-type-bounded, not occurrence-bounded), the
    * per-type log-prob precomputes once, and the corpus-sized
    * occurrence stream pays exactly one (p₃, p₂, p₁, cur) → lnp lookup
    * join, Zipf-split head/tail. Written op-for-op against the
    * oracle's SQL so the doubles agree at 6 dp.
    */
  def scoreDocsKneserNey4gram(
      docs: DataFrame, idCol: String = "doc_id", textCol: String = "text",
      headVocab: Int = 1 << 16, discount: Double = 0.75): DataFrame = {
    require(discount > 0 && discount < 1, "absolute discount in (0, 1)")
    val w = Window.partitionBy(col(idCol)).orderBy(col("pos"))
    val tok = CacheScope.pin(
      ScaleOut(docs.select(col(idCol), col(textCol)))
        .select(col(idCol), posexplode(tokens(col(textCol))).as(Seq("pos", "token")))
        .filter(col("token") =!= ""),
      StorageLevel.MEMORY_AND_DISK)
    val qg = CacheScope.pin(
      tok.select(col(idCol),
        coalesce(lag(col("token"), 3).over(w), lit("")).as("p3"),
        coalesce(lag(col("token"), 2).over(w), lit("")).as("p2"),
        coalesce(lag(col("token"), 1).over(w), lit("")).as("p1"),
        col("token").as("cur")),
      StorageLevel.MEMORY_AND_DISK)
    val qcf = CacheScope.pin(
      qg.groupBy("p3", "p2", "p1", "cur").agg(count(lit(1)).as("qcf")),
      StorageLevel.MEMORY_AND_DISK)
    // highest order: raw context mass + distinct continuations
    val ctx4 = qcf.groupBy("p3", "p2", "p1")
      .agg(sum("qcf").as("ctx4"), count(lit(1)).as("n1p4"))
    // third order: continuation counts over 4-gram TYPES
    val cont3 = CacheScope.pin(
      qcf.groupBy("p2", "p1", "cur").agg(count(lit(1)).as("c3")),
      StorageLevel.MEMORY_AND_DISK)
    val mid3 = cont3.groupBy("p2", "p1")
      .agg(sum("c3").as("cmid3"), count(lit(1)).as("n1pmid3"))
    // second order over trigram types
    val cont2 = CacheScope.pin(
      cont3.groupBy("p1", "cur").agg(count(lit(1)).as("c2")),
      StorageLevel.MEMORY_AND_DISK)
    val mid2 = cont2.groupBy("p1")
      .agg(sum("c2").as("cmid2"), count(lit(1)).as("n1pmid2"))
    // lowest order over bigram types
    val cont1 = cont2.groupBy("cur").agg(count(lit(1)).as("c1"))
    val btRow = cont2.agg(count(lit(1)).cast("double").as("bt"))
    val quadLnp = CacheScope.pin(
      qcf.join(ctx4, Seq("p3", "p2", "p1"))
        .join(cont3, Seq("p2", "p1", "cur"))
        .join(mid3, Seq("p2", "p1"))
        .join(cont2, Seq("p1", "cur"))
        .join(mid2, Seq("p1"))
        .join(cont1, Seq("cur"))
        .crossJoin(broadcast(btRow)) // 1-row scalar
        .select(col("p3"), col("p2"), col("p1"), col("cur"), col("qcf"),
          log(greatest(col("qcf") - lit(discount), lit(0.0)) / col("ctx4")
            + ((lit(discount) * col("n1p4")) / col("ctx4"))
              * (greatest(col("c3") - lit(discount), lit(0.0)) / col("cmid3")
                + ((lit(discount) * col("n1pmid3")) / col("cmid3"))
                  * (greatest(col("c2") - lit(discount), lit(0.0)) / col("cmid2")
                    + ((lit(discount) * col("n1pmid2")) / col("cmid2"))
                      * (col("c1") / col("bt"))))).as("lnp")),
      StorageLevel.MEMORY_AND_DISK)
    // the occurrence stream's ONLY model join: Zipf head broadcasts,
    // tail shuffles by the full 4-gram key
    val keys = Seq("p3", "p2", "p1", "cur")
    val headP = quadLnp.orderBy(col("qcf").desc, col("p3"), col("p2"), col("p1"), col("cur"))
      .limit(headVocab).select("p3", "p2", "p1", "cur", "lnp")
    val tailP = quadLnp.select("p3", "p2", "p1", "cur", "lnp")
      .join(broadcast(headP.select(keys.map(col): _*)), keys, "left_anti")
    val joined4 = qg.join(broadcast(headP), keys, "left")
    val scored = joined4.filter(col("lnp").isNotNull).unionByName(
        joined4.filter(col("lnp").isNull).drop("lnp")
          .join(tailP, keys))
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_tokens"), avg(-col("lnp")).as("mean_nll"))
      .select(col(idCol), col("n_tokens"), round(col("mean_nll"), 6).as("nll"))
    docs.select(col(idCol)).join(scored, Seq(idCol), "left")
      .select(col(idCol), coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        col("nll"))
  }
}
