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

  /** (doc, context…, cur) n-gram stream read straight out of each
    * document's token ARRAY: one narrow projection on the scan —
    * `transform` over the blank-filtered token array, each position
    * packing its `order − 1` BOS-padded (`""`) predecessors via direct
    * array indexing — where the lag-window original paid a full
    * per-document shuffle + sort before the first aggregate. Same rows
    * (same tokens, same order, same padding), no exchange.
    * `outCols` names the struct fields, context-first (e.g. Seq("p2",
    * "p1", "cur") for order 3); blank/null docs yield no rows, exactly
    * like the filtered posexplode they replace.
    *
    * The tuple projection is the COMPILED
    * [[graft.functions.expr.NgramStructs]] kernel (one pass, blank
    * filter + BOS windowing fused, whole-stage codegen — the rung the
    * first interpreted `filter`/`transform` draft documented, r19;
    * NgramKernelSpec holds that draft as its declarative reference and
    * pins row-identical output, the ShingleKernelSpec convention). The
    * window shuffle the array form replaced stays gone: linear,
    * partition-local, no exchange (measured: the array swap plus the
    * cached-plan-AQE fix took the trigram scorer from 3.7 s to 1.2 s
    * at sf0.1).
    */
  private def ngramsFromArray(
      docs: DataFrame, idCol: String, textCol: String,
      order: Int, outCols: Seq[String]): DataFrame = {
    require(outCols.length == order, s"order-$order n-gram needs $order names")
    ScaleOut(docs.select(col(idCol), col(textCol)))
      .select(col(idCol),
        explode(graft.functions.expr.NgramFunctions.ngramStructs(
          tokens(col(textCol)), order, outCols)).as("g"))
      .select(col(idCol) +: outCols.map(n => col("g." + n).as(n)): _*)
  }

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
    val cf = CacheScope.pin(
      tok.groupBy("token").agg(count(lit(1)).as("cf")),
      StorageLevel.MEMORY_AND_DISK)
    val n = cf.agg(sum("cf").cast("double").as("n"))
    // the occurrence stream's ONLY model join; when the whole vocabulary
    // fits the head budget the Zipf head IS the table and the tail is
    // empty, so take the single broadcast join directly (same broadcast
    // bytes, none of the TakeOrdered/anti-join/union scaffolding)
    val scored = (if (cf.count() <= headVocab) {
        tok.join(broadcast(cf), Seq("token"))
      } else {
        // Zipf head: vocab-sized sort-limit, then one broadcast join covers
        // >99% of occurrence rows; only head-miss rows reach the tail shuffle
        val head = cf.orderBy(col("cf").desc, col("token")).limit(headVocab)
        val tailCf = cf.join(broadcast(head.select("token")), Seq("token"), "left_anti")
        val headJoined = tok.join(broadcast(head), Seq("token"), "left")
        headJoined.filter(col("cf").isNotNull).unionByName(
          headJoined.filter(col("cf").isNull).drop("cf")
            .join(tailCf, Seq("token")))
      })
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
    * adjacency is read straight out of the token array
    * ([[ngramsFromArray]] — no per-document window shuffle), the
    * per-pair transition cost log(ctx + V) − log(bcf + 1) PRECOMPUTES
    * on the vocab²-bounded model table (every join there is pair- or
    * context-keyed over counts, never corpus-sized — the same
    * model-side discipline as the KN siblings; the doubles are the
    * identical ops per row, just evaluated once per TYPE instead of
    * once per occurrence), and the corpus stream pays one (prev, cur)
    * → cost lookup join — Zipf-split head/tail (bigram frequency is
    * itself Zipfian — "of the" is the new "the"), collapsing to a
    * single broadcast join when the whole pair table fits the head
    * budget. The closing doc-keyed aggregation map-side-combines as in
    * the unigram.
    */
  def scoreDocsBigram(
      docs: DataFrame, idCol: String = "doc_id", textCol: String = "text",
      headVocab: Int = 1 << 16): DataFrame = {
    val bg = CacheScope.pin(
      ngramsFromArray(docs, idCol, textCol, 2, Seq("prev", "cur")),
      StorageLevel.MEMORY_AND_DISK)
    val bcf = CacheScope.pin(
      bg.groupBy("prev", "cur").agg(count(lit(1)).as("bcf")),
      StorageLevel.MEMORY_AND_DISK)
    val ctx = bcf.groupBy("prev").agg(sum("bcf").as("ctx"))
    // V = unigram vocabulary: every token occurrence appears exactly once
    // as a `cur`, so the distinct count reads off the pinned pair table
    val vRow = bcf.agg(countDistinct(col("cur")).cast("double").as("v"))
    // per-pair transition cost, precomputed on the model table
    val pairCostPlan = bcf.join(ctx, Seq("prev"))
      .crossJoin(broadcast(vRow)) // 1-row scalar, not a data-sized cross
      .select(col("prev"), col("cur"), col("bcf"),
        (log(col("ctx") + col("v")) - log(col("bcf") + lit(1))).as("cost"))
    val scored = (if (bcf.count() <= headVocab) {
        bg.join(broadcast(pairCostPlan.select("prev", "cur", "cost")), Seq("prev", "cur"))
      } else {
        // Zipf head (by pair frequency) broadcasts, tail shuffles
        val pairCost = CacheScope.pin(pairCostPlan, StorageLevel.MEMORY_AND_DISK)
        val headP = pairCost.orderBy(col("bcf").desc, col("prev"), col("cur"))
          .limit(headVocab).select("prev", "cur", "cost")
        val tailP = pairCost.select("prev", "cur", "cost")
          .join(broadcast(headP.select("prev", "cur")), Seq("prev", "cur"), "left_anti")
        val joined = bg.join(broadcast(headP), Seq("prev", "cur"), "left")
        joined.filter(col("cost").isNotNull).unionByName(
          joined.filter(col("cost").isNull).drop("cost")
            .join(tailP, Seq("prev", "cur")))
      })
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_tokens"), avg(col("cost")).as("mean_nll"))
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
    val bg = CacheScope.pin(
      ngramsFromArray(docs, idCol, textCol, 2, Seq("prev", "cur")),
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
    val pairLnpPlan =
      bcf.join(ctxN1p, Seq("prev"))
        .join(n1c, Seq("cur"))
        .crossJoin(broadcast(btRow)) // 1-row scalar
        .select(col("prev"), col("cur"), col("bcf"),
          log(greatest(col("bcf") - lit(discount), lit(0.0)) / col("ctx")
            + ((lit(discount) * col("n1p")) / col("ctx"))
              * (col("n1c") / col("bt"))).as("lnp"))
    // the occurrence stream's ONLY model join; same count-gated collapse
    // as the trigram order (head == table, tail == ∅ when the pair table
    // fits the head budget)
    val scored = (if (bcf.count() <= headVocab) {
        bg.join(broadcast(pairLnpPlan.select("prev", "cur", "lnp")), Seq("prev", "cur"))
      } else {
        // Zipf head (by pair frequency) broadcasts, tail shuffles
        val pairLnp = CacheScope.pin(pairLnpPlan, StorageLevel.MEMORY_AND_DISK)
        val headP = pairLnp.orderBy(col("bcf").desc, col("prev"), col("cur"))
          .limit(headVocab).select("prev", "cur", "lnp")
        val tailP = pairLnp.select("prev", "cur", "lnp")
          .join(broadcast(headP.select("prev", "cur")), Seq("prev", "cur"), "left_anti")
        val joined = bg.join(broadcast(headP), Seq("prev", "cur"), "left")
        joined.filter(col("lnp").isNotNull).unionByName(
          joined.filter(col("lnp").isNull).drop("lnp")
            .join(tailP, Seq("prev", "cur")))
      })
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
    *
    * Two execution refinements over the lag-window original (results
    * identical — same per-doc n-gram multiset, same model arithmetic):
    * contexts are read straight out of the token ARRAY
    * ([[ngramsFromArray]] — no per-document window shuffle/sort before
    * the first aggregate), and when the type-table count — known for
    * free once the pinned count table materializes — fits inside
    * `headVocab`, the "head" IS the whole model and the tail is empty
    * by construction, so the scoring join collapses to ONE broadcast
    * join (no TakeOrdered, no anti-join, no two-branch union; the same
    * broadcast bytes the head would have shipped).
    */
  def scoreDocsKneserNeyTrigram(
      docs: DataFrame, idCol: String = "doc_id", textCol: String = "text",
      headVocab: Int = 1 << 16, discount: Double = 0.75): DataFrame = {
    require(discount > 0 && discount < 1, "absolute discount in (0, 1)")
    val tg = CacheScope.pin(
      ngramsFromArray(docs, idCol, textCol, 3, Seq("p2", "p1", "cur")),
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
    val pairLnpPlan =
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
                  * (col("c1") / col("bt")))).as("lnp"))
    // the occurrence stream's ONLY model join. The type count is free
    // here (tcf is pinned and the model aggregates materialize it); when
    // the whole model fits in the head budget the split degenerates —
    // head == table, tail == ∅ — so take the single broadcast join the
    // split would have produced, without its TakeOrdered/anti-join/union
    // scaffolding. Same broadcast bytes either way.
    val scored = (if (tcf.count() <= headVocab) {
        tg.join(broadcast(pairLnpPlan.select("p2", "p1", "cur", "lnp")),
          Seq("p2", "p1", "cur"))
      } else {
        // Zipf head (by type frequency) broadcasts, tail shuffles
        val pairLnp = CacheScope.pin(pairLnpPlan, StorageLevel.MEMORY_AND_DISK)
        val headP = pairLnp.orderBy(col("tcf").desc, col("p2"), col("p1"), col("cur"))
          .limit(headVocab).select("p2", "p1", "cur", "lnp")
        val tailP = pairLnp.select("p2", "p1", "cur", "lnp")
          .join(broadcast(headP.select("p2", "p1", "cur")), Seq("p2", "p1", "cur"), "left_anti")
        val joined3 = tg.join(broadcast(headP), Seq("p2", "p1", "cur"), "left")
        joined3.filter(col("lnp").isNotNull).unionByName(
          joined3.filter(col("lnp").isNull).drop("lnp")
            .join(tailP, Seq("p2", "p1", "cur")))
      })
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
    val qg = CacheScope.pin(
      ngramsFromArray(docs, idCol, textCol, 4, Seq("p3", "p2", "p1", "cur")),
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
    val quadLnpPlan =
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
                      * (col("c1") / col("bt"))))).as("lnp"))
    // the occurrence stream's ONLY model join; same count-gated collapse
    // as the trigram order (head == table, tail == ∅ when the type table
    // fits the head budget)
    val keys = Seq("p3", "p2", "p1", "cur")
    val scored = (if (qcf.count() <= headVocab) {
        qg.join(broadcast(quadLnpPlan.select((keys :+ "lnp").map(col): _*)), keys)
      } else {
        // Zipf head (by type frequency) broadcasts, tail shuffles
        val quadLnp = CacheScope.pin(quadLnpPlan, StorageLevel.MEMORY_AND_DISK)
        val headP = quadLnp.orderBy(col("qcf").desc, col("p3"), col("p2"), col("p1"), col("cur"))
          .limit(headVocab).select("p3", "p2", "p1", "cur", "lnp")
        val tailP = quadLnp.select("p3", "p2", "p1", "cur", "lnp")
          .join(broadcast(headP.select(keys.map(col): _*)), keys, "left_anti")
        val joined4 = qg.join(broadcast(headP), keys, "left")
        joined4.filter(col("lnp").isNotNull).unionByName(
          joined4.filter(col("lnp").isNull).drop("lnp")
            .join(tailP, keys))
      })
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_tokens"), avg(-col("lnp")).as("mean_nll"))
      .select(col(idCol), col("n_tokens"), round(col("mean_nll"), 6).as("nll"))
    docs.select(col(idCol)).join(scored, Seq(idCol), "left")
      .select(col(idCol), coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        col("nll"))
  }
}
