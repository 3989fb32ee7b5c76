package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

/** Plan-shape contracts over the REAL testdata — the physical properties
  * the 100 TB design depends on, pinned as regression tests:
  *
  *   - column pruning reaches the parquet scan (projections never read
  *     the full schema);
  *   - filters are pushed into the scan (PushedFilters non-empty);
  *   - fixed-cardinality dims join via broadcast, and the fact side of
  *     q01 never shuffles before aggregation;
  *   - the LSH bucket joins are HASH joins — a stats regression that
  *     degenerates them to CartesianProduct (round-2's ScaleOut bug)
  *     fails here, not in a 6-minute bench.
  */
class PlanShapeSpec extends SparkTestBase {

  private val sfDir = "/root/testdata/sf0.001"
  private def haveTestdata = new java.io.File(s"$sfDir/lineitem.parquet").exists()

  /** Fully-planned post-AQE physical plan string. Executes the frame's OWN
    * QueryExecution (a noop write would plan and run a separate one,
    * leaving this AQE root un-finalized) before reading the adaptive
    * root's current — now final — physical plan.
    */
  private def plan(df: DataFrame): String = graft.operators.CacheScope.scoped {
    val qe = df.queryExecution
    qe.toRdd.count()
    val root = qe.executedPlan
    root.collectFirst { case a: AdaptiveSparkPlanExec => a.executedPlan.toString }
      .getOrElse(root.toString)
  }

  /** INITIAL physical plan, before any AQE re-planning — the object that
    * records the optimizer's stats-driven choices (join strategy,
    * broadcast decisions). At this SF several candidate queries return
    * zero rows and AQE folds their joins into EmptyRelation, so the
    * finalized plan can't pin planning decisions.
    */
  private def initialPlan(df: DataFrame): String = df.queryExecution.executedPlan.toString

  private def q(name: String): DataFrame = SparkEntry.queries(name)(spark, sfDir)

  test("q02 projection prunes the lineitem scan to the selected columns") {
    assume(haveTestdata)
    val scanLine = plan(q("q02_projection")).linesIterator
      .find(_.contains("FileScan parquet")).get
    // 4 projected columns and nothing more in the scan's output schema
    assert(scanLine.contains("l_orderkey"))
    assert(!scanLine.contains("l_comment") && !scanLine.contains("l_shipdate"),
      s"scan not pruned: $scanLine")
  }

  test("q03 filter is pushed down into the scan") {
    assume(haveTestdata)
    val p = plan(q("q03_filter"))
    assert(p.contains("PushedFilters: [IsNotNull"), "expected non-empty PushedFilters")
  }

  test("q133 ORC scan: predicates pushed to the reader, schema pruned to 4 columns") {
    assume(haveTestdata)
    val scanLine = plan(q("q133_orc_scan")).linesIterator
      .find(_.contains("FileScan orc"))
      .getOrElse(fail("no ORC FileScan in the q133 plan"))
    // the lang/n_chars predicates must reach the ORC reader (stripe +
    // row-group min/max skipping at scale), and the scan must read only
    // the selected columns — the parquet pushdown story on format #2
    assert(scanLine.contains("PushedFilters: [") &&
      scanLine.contains("EqualTo(lang,en)") &&
      scanLine.contains("GreaterThanOrEqual(n_chars,200)"),
      s"ORC predicates not pushed: $scanLine")
    assert(!scanLine.contains("source") || scanLine.contains("ReadSchema"),
      s"unexpected scan line: $scanLine")
    val readSchema = scanLine.substring(scanLine.indexOf("ReadSchema"))
    assert(!readSchema.contains("source"), s"scan not pruned: $readSchema")
  }

  test("q01 joins fixed-cardinality dims via broadcast, no fact-side pre-agg shuffle") {
    assume(haveTestdata)
    val p = plan(q("q01_revenue_by_nation"))
    assert(p.contains("BroadcastHashJoin"), "dims must broadcast")
    assert(!p.contains("SortMergeJoin"), s"unexpected sort-merge join in q01")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"))
  }

  test("LSH bucket joins are hash joins, never cartesian (stats regression guard)") {
    assume(haveTestdata)
    Seq("q25_dedup_embedding_lsh", "q27_ann_topk_lsh").foreach { name =>
      val p = initialPlan(q(name))
      assert(!p.contains("CartesianProduct"),
        s"$name degenerated to CartesianProduct — input stats lost")
      assert(p.contains("BroadcastHashJoin") || p.contains("SortMergeJoin") ||
        p.contains("ShuffledHashJoin"), s"$name: no hash join found")
    }
  }

  test("q45 percentiles come from the count histogram, not a value-buffering aggregate") {
    assume(haveTestdata)
    val p = plan(q("q45_token_percentiles"))
    // the exact `percentile` aggregate is a TypedImperativeAggregate that
    // buffers every group member in executor memory — the one operator
    // shape that cannot survive 100 TB groups; q45 must stay histogram-based
    assert(!p.toLowerCase.contains("percentile"),
      "value-buffering percentile aggregate found in q45's plan")
    assert(!p.contains("ObjectHashAggregate"),
      "ObjectHashAggregate (imperative agg buffer) found in q45's plan")
  }

  test("q48 as-of join plans as union+window — no join operator at all") {
    assume(haveTestdata)
    val p = plan(q("q48_asof_click_attribution"))
    // the whole point of the union+window form: no pair-generating join
    // node anywhere (a theta-join encoding would explode per-key history)
    assert(!p.contains("Join"), s"as-of must not plan a join:\n${p.take(800)}")
    val hashExchanges = p.linesIterator
      .filter(l => l.contains("Exchange hashpartitioning") && !l.contains("Reused")).toSeq
    assert(hashExchanges.size <= 2,
      s"expected <=2 hash exchanges (click-dedup agg + as-of window), got:\n" +
        hashExchanges.mkString("\n"))
  }

  test("q110 domain cap ranks through the bounded MIN-k aggregate and is " +
      "layout-invariant (== window form over a differently-partitioned read)") {
    assume(haveTestdata)
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    val df = q("q110_domain_cap")
    // map-side truncation: the partial aggregate is the bounded MIN-k,
    // so the exchange carries <= k entries per (partition, domain)
    assert(initialPlan(df).contains("partial_bounded_mink_str"),
      "expected the bounded MIN-k partial aggregate in q110's plan")
    // the kept set equals the rank-window form computed over the same
    // data read through a DIFFERENT partition layout — the cap rule is a
    // pure function of (doc_id, salt), never of placement
    val docs = spark.read.parquet(s"$sfDir/documents.parquet").repartition(7)
    val w = Window.partitionBy("source").orderBy(col("sk"), col("doc_id"))
    val expected = docs
      .select(col("doc_id"), col("source"),
        md5(concat(col("doc_id").cast("string"), lit(":domcap"))).as("sk"))
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= 15)
      .select(col("doc_id"),
        concat(col("source"), lit(".example.com")).as("domain"), col("rk"))
    assert(df.collect().map(_.toSeq).toSet ===
      expected.collect().map(_.toSeq).toSet)
  }

  test("q123 PCA projection is scan-shaped: no exchange, no aggregate before the sort") {
    assume(haveTestdata)
    // projection = k dot-product kernels per row with literal constants;
    // the ONLY exchange allowed is the final presentation-order sort
    val p = plan(q("q123_embedding_pca"))
    val exchanges = p.linesIterator
      .filter(l => l.contains("Exchange ") && !l.contains("rangepartitioning"))
      .toSeq
    assert(exchanges.isEmpty,
      s"PCA projection must not shuffle:\n${exchanges.mkString("\n")}")
    assert(!p.contains("Aggregate"), "PCA projection must not aggregate")
  }

  test("q124 Gopher rules are scan-shaped: one pass, no exchange before the sort") {
    assume(haveTestdata)
    val p = plan(q("q124_gopher_rules"))
    val exchanges = p.linesIterator
      .filter(l => l.contains("Exchange ") && !l.contains("rangepartitioning"))
      .toSeq
    assert(exchanges.isEmpty,
      s"Gopher metrics must not shuffle:\n${exchanges.mkString("\n")}")
  }

  test("q126 KMV sketch truncates map-side: the partial DISTINCT-min-k " +
      "aggregate is in the plan") {
    assume(haveTestdata)
    // the scale claim: exchanges carry <= k DISTINCT hex entries per
    // (partition, lang), because the partial phase is the dedup-in-buffer
    // bounded aggregate, not a plain collect
    assert(initialPlan(q("q126_kmv_distinct_tokens")).contains("partial_distinct_mink"),
      "expected the partial distinct-min-k aggregate in q126's plan")
  }

  test("q137 ER self-join is keyed on the signature, never a cartesian") {
    assume(haveTestdata)
    val p = initialPlan(q("q137_er_name_pairs"))
    // the FastSS blocking claim: candidates come from a signature
    // equi-join (broadcast at this SF, sort-merge at scale); an
    // optimizer/stats regression that degenerates it to an all-pairs
    // nested loop fails here, not at 100 TB
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "ER candidate join degenerated to all-pairs")
    assert(p.contains("sig"), "expected the signature column in the join plan")
  }

  test("q138 triangle joins stay keyed: no cartesian in wedge or closing join") {
    assume(haveTestdata)
    // (q139's returned frame is a post-peel aggregate over a rebased RDD
    // — its per-round join shapes live in KCore and are not visible in
    // the final plan, so the peel is covered by KCoreSpec instead)
    val p = initialPlan(q("q138_link_triangles"))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "triangle joins degenerated to all-pairs")
  }

  test("q37 batch sessionization shuffles once by user_id") {
    assume(haveTestdata)
    val p = plan(q("q37_events_sessionize"))
    // one hash exchange for the user_id window+agg chain; the only other
    // exchange is the final presentation-order range partitioning
    val exchanges = p.linesIterator.filter(_.contains("Exchange ")).toSeq
    val hashExchanges = exchanges
      .filter(l => l.contains("Exchange hashpartitioning") && !l.contains("Reused"))
    assert(hashExchanges.size == 1,
      s"expected exactly one hash exchange, got:\n${exchanges.mkString("\n")}")
    assert(hashExchanges.head.contains("user_id"))
  }

  test("q210 TxTable snapshot plans as ONE parquet scan — indistinguishable from a static table") {
    assume(haveTestdata)
    val p = plan(q("q210_txtable_snapshot"))
    val scans = p.linesIterator.filter(_.contains("FileScan parquet")).toSeq
    // one scan over the live directories, no join/union assembly layer
    assert(scans.size == 1, s"expected one FileScan, got:\n${scans.mkString("\n")}")
    assert(!p.contains("Union"), "snapshot read must not plan a union")
  }

  test("q214 DSIR scoring join broadcasts the dim-bounded score table") {
    assume(haveTestdata)
    // the (doc, bucket) occurrence stream must NEVER shuffle by bucket —
    // bucket frequencies are Zipf-skewed and dim is bounded, so the
    // score table broadcasts and the only hash exchanges are the
    // dim-bounded count tables and the final doc-keyed aggregate
    val p = initialPlan(q("q214_dsir_selection"))
    assert(p.contains("BroadcastHashJoin"), "score join must broadcast")
    val occShuffle = p.linesIterator.filter(l =>
      l.contains("Exchange hashpartitioning(b#") && l.contains("doc_id")).toSeq
    assert(occShuffle.isEmpty,
      s"occurrence stream shuffled by bucket:\n${occShuffle.mkString("\n")}")
    assert(!p.contains("CartesianProduct"))
  }
}
