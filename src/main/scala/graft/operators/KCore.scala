package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** k-core decomposition (peel): the maximal subgraph in which every
  * vertex keeps degree >= k — the fourth distributed-graph primitive
  * beside the keep-list components ([[Dedup.nearDupGroups]]),
  * [[PageRank]], and [[Triangles]]. In a link-graph curation pass the
  * k-core is the standard "dense nucleus" extractor: link farms and
  * mutually-citing clusters survive high k while honest tail pages peel
  * away, so core membership complements q138's triangle density as a
  * structural quality signal.
  *
  * Reference scope: the reference has no graph surface; extension.
  *
  * Algorithm: synchronous peeling. Each round recomputes degrees within
  * the surviving subgraph and removes EVERY vertex below k at once;
  * repeat until no vertex is removed. The fixpoint is exactly the
  * k-core (removal order never matters for the core itself — only for
  * full coreness numbers, which a caller gets by running consecutive
  * k). Rounds are bounded by the longest "peel chain" (a path whose
  * vertices fall below k one hop at a time); synchronous batching makes
  * typical graphs converge in a handful of rounds.
  *
  * Scale shape per round: one degree aggregate keyed by vertex + one
  * semi-join of the edge set against the survivors — both exchanges are
  * edge-set-sized and shrink monotonically (the edge set only ever
  * loses rows). The round frontier is RDD-rebased ([[Dedup]] lesson:
  * iterative frames referenced twice per round double the logical plan)
  * and pinned to the active [[CacheScope]]; the one driver scalar per
  * round is the removed-vertex count.
  */
object KCore {

  /** Vertices of the k-core of the undirected closure of `edges`
    * (directed (src, dst) rows; symmetrized, deduped, self-loops
    * dropped), with their within-core degree. Output: (id, core_deg);
    * empty when the graph has no k-core. `maxRounds` is an honest abort
    * bound (an unconverged peel must not return a superset of the
    * core), far above any realistic peel-chain length. `roundProbe`
    * observes (round index, surviving symmetric edge count) per
    * materialized round — ops logging and the KCoreSpec cascade pin.
    */
  def kCore(edges: DataFrame, k: Int, maxRounds: Int = 64,
      roundProbe: (Int, Long) => Unit = (_, _) => ()): DataFrame = {
    require(k >= 1, "k must be >= 1")
    val e = edges.select(col("src").cast("long").as("src"),
        col("dst").cast("long").as("dst"))
      .filter(col("src") =!= col("dst"))
    var cur = CacheScope.pin(
      e.union(e.select(col("dst").as("src"), col("src").as("dst"))).distinct(),
      StorageLevel.MEMORY_AND_DISK)
    // ONE driver scalar per round: the symmetric edge count. Every
    // peeled vertex had degree >= 1 (zero-degree vertices have no rows),
    // so the edge count shrinks STRICTLY until the fixpoint — count
    // equality IS convergence, and the count is the same job that
    // materializes the round's pinned frame. (A separate removed-vertex
    // count measured 3 jobs/round and ~20 s at sf0.1; this shape is 1.)
    var nEdges = cur.count()
    var converged = false
    var round = 0
    while (!converged && round < maxRounds) {
      // drop edges touching a PEELED vertex — anti-join against the
      // removed set, not semi-join against the survivors: past the first
      // round a cascade peels a handful of vertices per round, so the
      // anti side is a tiny broadcast while the keep side is nearly the
      // whole vertex set
      val removed = cur.groupBy("src").agg(count(lit(1)).as("core_deg"))
        .filter(col("core_deg") < k).select("src")
      val next = CacheScope.pin(Dedup.rebasedFrame(
        cur.join(removed, Seq("src"), "left_anti")
          .join(removed.select(col("src").as("dst")), Seq("dst"), "left_anti")
          .select("src", "dst")),
        StorageLevel.MEMORY_AND_DISK)
      val n2 = next.count()
      converged = n2 == nEdges
      roundProbe(round, n2)
      cur.unpersist()
      cur = next
      nEdges = n2
      round += 1
    }
    require(converged, s"k-core peel did not converge in $maxRounds rounds")
    // at the fixpoint every surviving vertex's degree is >= k by
    // construction; the final aggregate reads the still-pinned frame,
    // whose blocks follow the caller's CacheScope (the nearDupGroups
    // convention for returned iterative results)
    cur.groupBy("src").agg(count(lit(1)).as("core_deg"))
      .select(col("src").as("id"), col("core_deg"))
  }
}
