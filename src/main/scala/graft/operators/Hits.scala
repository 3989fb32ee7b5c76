package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** HITS hubs & authorities (Kleinberg 1999) in INTEGER arithmetic —
  * the sixth graph primitive beside components, PageRank (global +
  * personalized), triangles, k-core and BFS seed depth: PageRank ranks
  * by endorsement mass, HITS separates the two roles a link graph
  * mixes — directory/portal pages that POINT WELL (hubs) vs content
  * pages POINTED AT by good hubs (authorities). The curation use is
  * crawl-frontier triage: a high-hub page is a harvest list, a
  * high-authority page is content worth keeping.
  *
  * Mutual recursion per round: auth(v) = Σ_{(u,v)} hub(u), then
  * hub(u) = Σ_{(u,v)} auth(v), each rescaled to max = `scale` (L∞
  * normalization — the float formulation's L2 norm cannot be exact;
  * max-rescale preserves the SAME ranking fixed point and stays in
  * integers). The rescale `(raw · scale) div max` runs in
  * DECIMAL(38,0) (raw ≤ n·scale overflows a long when multiplied by
  * scale; ANSI mode would kill the task) and truncates — every
  * quantity non-negative, so truncation == floor == the oracle's `//`.
  *
  * Reference scope: no graph surface in the reference; extension,
  * q120's determinism contract on a second iterative centrality.
  *
  * Scale shape: identical to [[PageRank]] — the distinct edge set is
  * pinned once; per half-step one edge⋈score join + one map-side-
  * combined sum keyed by the other endpoint + one left join onto the
  * vertex set; the normalization max rides as a 1-row broadcast
  * (no driver action per round); rounds rebase on their own RDD so
  * plan size is constant. Nothing exceeds the edge set.
  */
object Hits {

  /** (id, hub, auth) per vertex, both in [0, scale] micro-units after
    * `iters` full rounds (hub of round t uses auth of round t). A graph
    * whose raw scores are all zero (no edges reach any vertex) yields
    * zeros rather than dividing by the zero max.
    */
  def integerHits(
      edges: DataFrame, iters: Int,
      scale: Long = 1000000000L): DataFrame = {
    require(iters >= 1, "iters must be >= 1")
    require(scale > 0, "scale must be positive")
    val e = CacheScope.pin(
      edges.select(col("src").cast("long").as("src"),
          col("dst").cast("long").as("dst"))
        .filter(col("src") =!= col("dst"))
        .distinct(),
      StorageLevel.MEMORY_AND_DISK)
    val verts = CacheScope.pin(
      e.select(col("src").as("id")).union(e.select(col("dst").as("id"))).distinct(),
      StorageLevel.MEMORY_AND_DISK)

    // rescale raw scores to max = scale, as a 1-row broadcast (never a
    // driver action); DECIMAL(38,0) because raw·scale overflows long
    def normalized(raw: DataFrame, out: String): DataFrame = {
      val mx = raw.agg(max(col("raw")).as("mx"))
      verts.join(raw, Seq("id"), "left")
        .crossJoin(broadcast(mx)) // 1-row scalar
        .select(col("id"),
          when(col("mx").isNull || col("mx") <= 0, lit(0L))
            .otherwise(expr(
              s"CAST((CAST(coalesce(raw, 0) AS DECIMAL(38,0)) * $scale) div mx AS BIGINT)"))
            .as(out))
    }

    var hub = CacheScope.pin(verts.select(col("id"), lit(scale).as("hub")),
      StorageLevel.MEMORY_AND_DISK)
    var auth: DataFrame = null
    var it = 0
    while (it < iters) {
      val aRaw = e.join(hub, e("src") === hub("id"))
        .groupBy(e("dst").as("id")).agg(sum(col("hub")).as("raw"))
      val nextAuth = CacheScope.pin(
        Dedup.rebasedFrame(normalized(aRaw, "auth")), StorageLevel.MEMORY_AND_DISK)
      nextAuth.count()
      val hRaw = e.join(nextAuth, e("dst") === nextAuth("id"))
        .groupBy(e("src").as("id")).agg(sum(col("auth")).as("raw"))
      val nextHub = CacheScope.pin(
        Dedup.rebasedFrame(normalized(hRaw, "hub")), StorageLevel.MEMORY_AND_DISK)
      nextHub.count()
      hub.unpersist()
      if (auth != null) auth.unpersist()
      hub = nextHub
      auth = nextAuth
      it += 1
    }
    hub.join(auth, Seq("id")).select(col("id"), col("hub"), col("auth"))
  }
}
