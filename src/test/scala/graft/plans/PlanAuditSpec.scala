package graft

/** Plan-shape regression gate over EVERY declared batch query (r19
  * verdict #5): the wall-clock bench is ±35 % noisy on this host, so an
  * accidental join-strategy regression — a stats change degenerating a
  * hash join to CartesianProduct / BroadcastNestedLoopJoin, the round-2
  * ScaleOut bug class — must fail a deterministic test, not wait to be
  * spotted in a noisy number. The committed `plans/<round>/PLAN_AUDIT.txt`
  * artifact (graft.PlanAudit) is the diffable per-query record
  * (exchange/broadcast/codegen/pushed-filter counts); this spec is the
  * hard floor underneath it.
  *
  * Streaming-drain queries are skipped for the same reason PlanAudit
  * skips them: building their frame RUNS the drain, and their plan story
  * is the checkpoint's state-partitioning metadata.
  */
class PlanAuditSpec extends SparkTestBase {

  private val sfDir = "/root/testdata/sf0.001"
  private def haveTestdata = new java.io.File(s"$sfDir/lineitem.parquet").exists()

  private def isDrain(name: String): Boolean =
    (Bench.streamingIds ++ Set("q241", "q242")).contains(name.takeWhile(_ != '_'))

  /** Queries whose plan legitimately carries BroadcastNestedLoopJoin:
    * every occurrence is a SCALAR ATTACH — `crossJoin(broadcast(agg))`
    * of a 1-row (or group-cardinality-bounded) aggregate (a total-count
    * denominator, a global quantile row, an nmax) onto a stream — which
    * Spark plans as BNLJ with the bounded side as build. That shape is
    * O(n·1), not an accidental O(n·m) nested loop. Adjudicated from
    * plans/r20/PLAN_AUDIT.txt; a NEW query (or a stats regression on an
    * old one) introducing BNLJ fails here and must be read, not waved
    * through.
    */
  private val scalarAttachBnlj: Set[String] = Set(
    // crossJoin(broadcast(<1-row aggregate>)) scalar attaches
    // (plans/r20/PLAN_AUDIT.txt members at sf0.1)
    "q114_ccnet_buckets", "q127_kmv_jaccard_langs", "q134_kneser_ney_logprob",
    "q177_order_price_deciles", "q185_order_drift_psi",
    "q189_collocations_pmi", "q194_source_lang_chi2", "q195_neyman_sample",
    "q196_rolling_wau", "q206_events_acf",
    // threshold-scalar attach (SeqPatterns crossJoin(broadcast(th)))
    "q208_events_seq_patterns",
    // LM family: crossJoin(broadcast(btRow)) — the 1-row bigram-type
    // total every KN interpolation chain carries (visible at sf0.001
    // where the head/tail collapse keeps the scalar in the initial plan)
    "q89_unigram_logprob", "q97_bigram_logprob", "q212_kneser_ney_trigram",
    "q232_kneser_ney_4gram",
    // 1-row scalar attaches visible only at sf0.001 stats: the
    // Holt-Winters seed row and the DSIR selection threshold
    "q207_events_forecast", "q214_dsir_selection",
    // bounded-side NON-EQUI broadcast joins by contract: the exact
    // brute-force baselines broadcast the (user-bounded) query batch /
    // increment and join on =!= — O(corpus × bounded), not O(n·m)
    "q24_dedup_embedding", "q26_ann_topk", "q93_ann_topk_pq")

  test("no CartesianProduct anywhere; BroadcastNestedLoopJoin only in adjudicated scalar attaches") {
    assume(haveTestdata)
    val cartesian = scala.collection.mutable.ArrayBuffer.empty[String]
    val bnlj = scala.collection.mutable.ArrayBuffer.empty[String]
    val constructionErrors = scala.collection.mutable.ArrayBuffer.empty[String]
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      if (!isDrain(name)) {
        try graft.operators.CacheScope.scoped {
          // INITIAL physical plan — records the optimizer's stats-driven
          // strategy choices without executing the query
          val plan = fn(spark, sfDir).queryExecution.executedPlan.toString
          if (plan.contains("CartesianProduct")) cartesian += name
          if (plan.contains("BroadcastNestedLoopJoin") &&
              !scalarAttachBnlj(name)) bnlj += name
        } catch { case scala.util.control.NonFatal(e) =>
          // construction failures are Verify/bench territory, not this
          // spec's — but record them so a silent sweep gap is visible
          constructionErrors += s"$name: ${e.getClass.getSimpleName}"
        }
      }
    }
    assert(cartesian.isEmpty, s"CartesianProduct in: ${cartesian.mkString(", ")}")
    assert(bnlj.isEmpty,
      s"unadjudicated BroadcastNestedLoopJoin in: ${bnlj.mkString(", ")}")
    // every batch query must actually have been audited (a construction
    // error here would silently shrink the sweep)
    assert(constructionErrors.isEmpty,
      s"plans not auditable for: ${constructionErrors.mkString(", ")}")
  }
}
