package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Multi-source BFS hop distance ("seed depth"): for every vertex, the
  * number of hops to the NEAREST of a seed set over the undirected
  * closure of the link graph — the fifth distributed-graph primitive
  * beside components, PageRank, triangles, and k-core. In crawl
  * curation this is the classic "distance from the seed list" quality
  * prior (pages far from any trusted seed are likelier spam — the
  * harmonic-centrality/TrustRank family's cheap integer cousin), and
  * multi-source is the production shape: one pass serves the whole
  * seed list, not one traversal per seed.
  *
  * Reference scope: the reference has no graph surface; extension.
  *
  * Algorithm: frontier BFS with synchronous rounds. Round r settles
  * exactly the vertices at depth r (neighbors of the frontier not yet
  * settled), so rounds = graph eccentricity of the seed set — small on
  * link graphs (hub + shortcut edges give expander-like diameters; the
  * gate graph settles in ~5). Hop distances are integers: the result
  * is bit-exact, no float convergence question.
  *
  * Scale shape per round: one frontier-edge join keyed on the vertex
  * (frontier-sized × degree), one distinct, one anti-join against the
  * settled set — all exchanges bounded by the edge set; the one driver
  * scalar per round is the new-frontier count (count == 0 IS
  * convergence — the q139 probe discipline). Frontier and settled
  * frames are RDD-rebased each round ([[Dedup]] lesson) and pinned to
  * the active [[CacheScope]]. Unreachable vertices are absent from the
  * output (their depth is undefined, not infinite-as-a-sentinel).
  */
object Sssp {

  /** JOINT components + BFS: (id, label, depth) where `label` is the
    * component's minimum vertex id and `depth` the exact hop distance
    * from that minimum — one propagation loop instead of components
    * followed by a seeded BFS (the q203 composition's r12 shape, which
    * stacked TWO diameter-bounded round floors; the profile showed its
    * cost is entirely per-round job overhead at gate scale, so halving
    * rounds is the lever).
    *
    * Why depth rides free: the min label l of a component originates at
    * its holder m and spreads exactly one hop per synchronous round —
    * the same wavefront a BFS from m would trace — so the FIRST arrival
    * of l at v travels a shortest path and carries depth d(m, v); the
    * lexicographic min over (label, depth) structs keeps it (labels
    * only decrease, and for a fixed label depth only decreases). Rounds
    * = eccentricity of the component minimum + 1 confirming round —
    * never more than seedDepth alone would pay, and the components pass
    * disappears entirely.
    *
    * Per round: one edge⋈state join, one map-side-combinable struct-min
    * aggregate (the previous state unions in carrying its own (label,
    * depth) as `old*`, so the changed-count probe rides the aggregate —
    * the nearDupGroups probe discipline), ONE driver scalar. Exchanges
    * are edge-set-sized; frames RDD-rebased and CacheScope-pinned per
    * the iterative contract. No star-contraction fallback: depth
    * semantics inherently pay diameter rounds, so callers needing only
    * LABELS on a high-diameter graph should use [[Dedup.nearDupGroups]].
    */
  def minLabelDepth(edges: DataFrame, maxRounds: Int = 64): DataFrame = {
    val e = edges.select(col("src").cast("long").as("src"),
        col("dst").cast("long").as("dst"))
      .filter(col("src") =!= col("dst"))
    val und = CacheScope.pin(
      e.union(e.select(col("dst").as("src"), col("src").as("dst"))).distinct(),
      StorageLevel.MEMORY_AND_DISK)
    var state = CacheScope.pin(Dedup.rebasedFrame(
        und.select(col("src").as("id")).distinct()
          .select(col("id"), col("id").as("label"), lit(0L).as("depth"))),
      StorageLevel.MEMORY_AND_DISK)
    var round = 0
    var converged = false
    while (!converged && round < maxRounds) {
      val msgs = und.join(state, und("src") === state("id"))
        .select(und("dst").as("id"), col("label"),
          (col("depth") + 1L).as("depth"),
          lit(null).cast("long").as("oldl"), lit(null).cast("long").as("oldd"))
      val next = CacheScope.pin(Dedup.rebasedFrame(
          msgs.union(state.select(col("id"), col("label"), col("depth"),
              col("label").as("oldl"), col("depth").as("oldd")))
            .groupBy("id")
            .agg(min(struct(col("label"), col("depth"))).as("s"),
              max("oldl").as("oldl"), max("oldd").as("oldd"))
            .select(col("id"), col("s.label").as("label"),
              col("s.depth").as("depth"), col("oldl"), col("oldd"))),
        StorageLevel.MEMORY_AND_DISK)
      val changed = next
        .filter(col("label") =!= col("oldl") || col("depth") =!= col("oldd"))
        .count()
      converged = changed == 0L
      state.unpersist()
      state = next
      round += 1
    }
    require(converged, s"min-label/depth propagation did not converge in $maxRounds rounds")
    und.unpersist()
    state.select(col("id"), col("label"), col("depth"))
  }

  /** (id, depth) for every vertex reachable from `seeds` (column `id`)
    * over the undirected closure of `edges` (directed (src, dst) rows;
    * self-loops dropped). `maxRounds` is an honest abort bound.
    */
  def seedDepth(edges: DataFrame, seeds: DataFrame, maxRounds: Int = 64,
      roundProbe: (Int, Long) => Unit = (_, _) => ()): DataFrame = {
    val e = edges.select(col("src").cast("long").as("src"),
        col("dst").cast("long").as("dst"))
      .filter(col("src") =!= col("dst"))
    val und = CacheScope.pin(
      e.union(e.select(col("dst").as("src"), col("src").as("dst"))).distinct(),
      StorageLevel.MEMORY_AND_DISK)
    var settled = CacheScope.pin(Dedup.rebasedFrame(
        seeds.select(col("id").cast("long").as("id"), lit(0L).as("depth")).distinct()),
      StorageLevel.MEMORY_AND_DISK)
    var frontier = settled
    var round = 0
    var converged = false
    while (!converged && round < maxRounds) {
      val next = CacheScope.pin(Dedup.rebasedFrame(
          frontier.join(und, frontier("id") === und("src"))
            .select(und("dst").as("id")).distinct()
            .join(settled, Seq("id"), "left_anti")
            .select(col("id"), lit(round + 1L).as("depth"))),
        StorageLevel.MEMORY_AND_DISK)
      val n = next.count()
      roundProbe(round, n)
      if (n == 0L) {
        next.unpersist()
        converged = true
      } else {
        // the new settled stays LAZY until the next round's count; the
        // old settled's blocks back its lineage, so nothing unpersists
        // mid-loop — rounds are eccentricity-bounded (~6 here) and every
        // pin is vertex-set-sized, released at CacheScope exit
        settled = CacheScope.pin(Dedup.rebasedFrame(
          settled.unionByName(next)), StorageLevel.MEMORY_AND_DISK)
        frontier = next
      }
      round += 1
    }
    require(converged, s"BFS did not converge in $maxRounds rounds")
    settled
  }

  /** WEIGHTED multi-source shortest distance — distributed Bellman–Ford
    * with synchronous relaxation rounds over integer edge weights (the
    * seventh graph primitive; [[seedDepth]] is the unit-weight special
    * case). A high-weight shortcut now loses to a longer cheap path —
    * the distinction hop depth cannot make.
    *
    * Per round: one dist⋈edge join, one map-side-combined min keyed by
    * destination, one full-outer merge with `least`, and ONE driver
    * scalar (the improved-vertex count; 0 IS convergence — relaxation
    * is monotone, so a round that improves nothing never will again).
    * Rounds ≤ the hop diameter of the shortest-path forest; frames
    * RDD-rebased and CacheScope-pinned per the iterative contract.
    * Integer weights (required > 0, fail-fast) make every distance
    * bit-exact. Unreachable vertices are absent.
    */
  def weightedSeedDist(edges: DataFrame, seeds: DataFrame,
      maxRounds: Int = 64): DataFrame = {
    val e = edges.select(col("src").cast("long").as("src"),
        col("dst").cast("long").as("dst"),
        when(col("w") > 0, col("w").cast("long"))
          .otherwise(raise_error(lit("weightedSeedDist: weights must be positive")))
          .as("w"))
      .filter(col("src") =!= col("dst"))
    val und = CacheScope.pin(
      e.union(e.select(col("dst").as("src"), col("src").as("dst"), col("w")))
        .groupBy("src", "dst").agg(min("w").as("w")),
      StorageLevel.MEMORY_AND_DISK)
    var dist = CacheScope.pin(Dedup.rebasedFrame(
        seeds.select(col("id").cast("long").as("id"), lit(0L).as("d")).distinct()),
      StorageLevel.MEMORY_AND_DISK)
    var round = 0
    var converged = false
    while (!converged && round < maxRounds) {
      val cand = dist.join(und, dist("id") === und("src"))
        .select(und("dst").as("id"), (dist("d") + und("w")).as("nd"))
        .groupBy("id").agg(min("nd").as("nd"))
      // ONE materialization per round: the improved-count action forces
      // the pinned merge, which then serves as next round's dist (the
      // flag column rides along and is projected away at the join)
      val merged = CacheScope.pin(Dedup.rebasedFrame(
          dist.select(col("id"), col("d")).join(cand, Seq("id"), "full_outer")
            .select(col("id"), least(col("d"), col("nd")).as("d"),
              (col("d").isNull || (col("nd").isNotNull && col("nd") < col("d")))
                .as("improved"))),
        StorageLevel.MEMORY_AND_DISK)
      val changed = merged.filter(col("improved")).count()
      dist.unpersist()
      dist = merged
      if (changed == 0L) converged = true
      round += 1
    }
    require(converged, s"Bellman-Ford did not converge in $maxRounds rounds")
    dist.select(col("id"), col("d"))
  }
}
