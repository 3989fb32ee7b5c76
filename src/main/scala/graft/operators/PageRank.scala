package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Link-graph centrality by fixed-iteration PageRank in INTEGER
  * arithmetic — the URL-level quality signal a crawl-scale curation
  * pipeline ranks with (Common Crawl publishes per-host centrality for
  * exactly this; CCNet-class pipelines weight domains by it) expressed
  * so the whole computation carries a bit-exact oracle.
  *
  * Why integers: float PageRank sums contributions in shuffle order, so
  * two runs (or two engines) disagree in the last ulps and an exact
  * hash-compare is impossible. Here every quantity is a non-negative
  * micro-unit long — init `scale/n` truncated, contribution
  * `pr div outdeg` truncated, damping `(alphaNum * in) div alphaDen`
  * truncated — so addition is exact and order-free, every engine
  * computes the identical vector, and the q43-family determinism
  * contract extends to an ITERATIVE numeric operator. Truncation loses
  * at most `outdeg` micro-units per vertex per round — at scale=1e12
  * that is a relative error < 1e-6 for any realistic degree, far below
  * ranking resolution.
  *
  * Semantics (fixed `iters`, no convergence test — the production shape
  * for a ranking signal recomputed per crawl):
  *   - vertices = distinct ids over both edge endpoints;
  *   - pr_0(v) = scale div n;
  *   - pr_{t+1}(v) = teleport + (alphaNum * sum_{(u,v) in E} (pr_t(u)
  *     div outdeg(u))) div alphaDen, teleport = ((scale div n) *
  *     (alphaDen - alphaNum)) div alphaDen;
  *   - a dangling vertex (no out-edges) contributes nothing — its mass
  *     beyond teleport evaporates, the documented simplification (the
  *     alternative, redistributing dangling mass uniformly, costs a
  *     global aggregate per round and changes no RANKING decision for
  *     the curation use).
  *
  * Scale shape: the edge set with its out-degrees is computed once,
  * persisted, and re-joined each round; per round the work is one join
  * of the vertex-keyed rank frame against the edge frame, one
  * groupBy-sum keyed by destination (map-side combined), and one left
  * join back onto the vertex set — the canonical distributed-PageRank
  * exchange pattern, nothing sized beyond the edge set, no driver-side
  * data. Rounds rebase on their own RDD ([[Dedup]]'s iterative-plan
  * contract) so `iters` is bounded by wall-clock, not by Catalyst plan
  * growth.
  *
  * Input `edges` columns: (`src`, `dst`), directed, duplicates collapse.
  * Output: one (`id`, `pr`) row per vertex, pr in integer micro-units.
  */
object PageRank {

  def integerPageRank(
      edges: DataFrame, iters: Int,
      scale: Long = 1000000000000L,
      alphaNum: Long = 85, alphaDen: Long = 100): DataFrame = {
    require(iters >= 0, "iters must be non-negative")
    require(alphaNum >= 0 && alphaNum <= alphaDen && alphaDen > 0,
      "damping must be a fraction in [0, 1]")
    val spark = edges.sparkSession
    val e = CacheScope.pin(
      edges.select(col("src").cast("long").as("src"),
          col("dst").cast("long").as("dst"))
        .distinct(),
      StorageLevel.MEMORY_AND_DISK)
    val verts = CacheScope.pin(
      e.select(col("src").as("id"))
        .union(e.select(col("dst").as("id")))
        .distinct(),
      StorageLevel.MEMORY_AND_DISK)
    // vertex count: the one driver scalar (the init constant needs it);
    // bounded by contract — it is a count, never data
    val n = verts.count()
    if (n == 0L) {
      e.unpersist(); verts.unpersist()
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("id",
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("pr",
            org.apache.spark.sql.types.LongType))))
    }
    val init = scale / n
    val teleport = (init * (alphaDen - alphaNum)) / alphaDen
    // out-degrees ride the edge frame once — per round the join against
    // ranks needs (src, dst, outdeg) and nothing recomputes degrees
    val eOut = CacheScope.pin(
      e.join(e.groupBy("src").agg(count(lit(1)).as("outdeg")), "src"),
      StorageLevel.MEMORY_AND_DISK)
    var pr = CacheScope.pin(
      verts.select(col("id"), lit(init).as("pr")),
      StorageLevel.MEMORY_AND_DISK)
    var it = 0
    while (it < iters) {
      // contribution = pr div outdeg, truncated: exact long arithmetic
      val in = eOut.join(pr, eOut("src") === pr("id"))
        .select(eOut("dst").as("id"),
          expr("pr div outdeg").as("contrib"))
        .groupBy("id").agg(sum(col("contrib")).as("acc"))
      val next = CacheScope.pin(Dedup.rebasedFrame(
        verts.join(in, Seq("id"), "left")
          .select(col("id"),
            (lit(teleport) +
              expr(s"($alphaNum * coalesce(acc, 0L)) div $alphaDen")).as("pr"))),
        StorageLevel.MEMORY_AND_DISK)
      // force before releasing the previous round's blocks
      next.count()
      pr.unpersist()
      pr = next
      it += 1
    }
    eOut.unpersist()
    // e/verts stay pinned behind the result's lineage only via the final
    // frame; the caller's CacheScope releases everything at scope exit
    pr
  }

  /** PERSONALIZED PageRank (the TrustRank/seed-biased family): teleport
    * mass lands ONLY on the seed set — pr_0 = (scale div |S|) on seeds
    * and 0 elsewhere, and each round adds the seed teleport instead of
    * the uniform one, so rank flows OUT from the seeds and a vertex's
    * score measures its link-proximity to trusted pages (the crawl-
    * prioritization and spam-demotion signal beside [[integerPageRank]]'s
    * global centrality and [[Sssp.seedDepth]]'s hop metric). Identical
    * integer micro-unit discipline and per-round exchange pattern; the
    * only structural delta is the seed-conditional teleport (one extra
    * left join per round against the seed frame — seed-set-sized, and
    * broadcastable when the seed list is policy-sized, the usual case).
    * Seeds outside the graph are ignored (semi-join); at least one must
    * remain.
    */
  def integerPersonalizedPageRank(
      edges: DataFrame, seeds: DataFrame, iters: Int,
      scale: Long = 1000000000000L,
      alphaNum: Long = 85, alphaDen: Long = 100): DataFrame = {
    require(iters >= 0, "iters must be non-negative")
    require(alphaNum >= 0 && alphaNum <= alphaDen && alphaDen > 0,
      "damping must be a fraction in [0, 1]")
    val e = CacheScope.pin(
      edges.select(col("src").cast("long").as("src"),
          col("dst").cast("long").as("dst"))
        .distinct(),
      StorageLevel.MEMORY_AND_DISK)
    val verts = CacheScope.pin(
      e.select(col("src").as("id"))
        .union(e.select(col("dst").as("id")))
        .distinct(),
      StorageLevel.MEMORY_AND_DISK)
    val s = CacheScope.pin(
      seeds.select(col("id").cast("long").as("id")).distinct()
        .join(verts, Seq("id"), "left_semi")
        .withColumn("__seed", lit(1)),
      StorageLevel.MEMORY_AND_DISK)
    val ns = s.count()
    require(ns > 0L, "personalized PageRank needs >= 1 seed present in the graph")
    val init = scale / ns
    val teleport = (init * (alphaDen - alphaNum)) / alphaDen
    val eOut = CacheScope.pin(
      e.join(e.groupBy("src").agg(count(lit(1)).as("outdeg")), "src"),
      StorageLevel.MEMORY_AND_DISK)
    var pr = CacheScope.pin(
      verts.join(s, Seq("id"), "left")
        .select(col("id"),
          when(col("__seed").isNotNull, lit(init)).otherwise(lit(0L)).as("pr")),
      StorageLevel.MEMORY_AND_DISK)
    var it = 0
    while (it < iters) {
      val in = eOut.join(pr, eOut("src") === pr("id"))
        .select(eOut("dst").as("id"),
          expr("pr div outdeg").as("contrib"))
        .groupBy("id").agg(sum(col("contrib")).as("acc"))
      val next = CacheScope.pin(Dedup.rebasedFrame(
        verts.join(in, Seq("id"), "left")
          .join(s, Seq("id"), "left")
          .select(col("id"),
            (when(col("__seed").isNotNull, lit(teleport)).otherwise(lit(0L)) +
              expr(s"($alphaNum * coalesce(acc, 0L)) div $alphaDen")).as("pr"))),
        StorageLevel.MEMORY_AND_DISK)
      next.count()
      pr.unpersist()
      pr = next
      it += 1
    }
    eOut.unpersist()
    pr
  }
}
