package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact per-vertex triangle counting — the third classic distributed
  * graph primitive beside the keep-list connected components
  * ([[Dedup.nearDupGroups]]) and [[PageRank]]: triangle density is the
  * standard local-clustering signal for link-graph quality scoring
  * (spam rings are triangle-dense, crawl frontiers are triangle-sparse).
  *
  * Reference scope: the reference has no graph surface at all;
  * extension, following q120's deterministic-link-graph gate pattern.
  *
  * Algorithm: degree-ordered orientation ("compact-forward" /
  * node-iterator++, Latapy 2008). Each undirected edge is oriented from
  * its lower (degree, id) endpoint to its higher one; a triangle
  * {u,v,w} then materializes EXACTLY ONCE as the wedge (u→v, u→w) with
  * key(v) < key(w) closed by the oriented edge (v→w). The wedge join
  * fans out from each vertex's OUT-neighborhood only, and orientation
  * bounds the out-degree by O(√m) regardless of in-degree skew — the
  * celebrity vertex that breaks naive neighborhood joins (its million
  * followers all orient TOWARD it, so it fans out almost nothing).
  * Total wedge volume is O(m^1.5) worst case, the optimal bound for
  * exact enumeration.
  *
  * Scale shape: two keyed equi-joins (on the wedge apex, then on the
  * closing edge pair) and bounded aggregates — no all-pairs surface, no
  * driver-side state. Orientation keys are `degree·2^32 + id`, so the
  * id space must fit 32 bits and degrees 2^31 (enforced; at larger id
  * spaces widen the key to a struct comparison).
  */
object Triangles {

  private val KeyBase = 1L << 32

  /** Per-vertex triangle participation over the undirected closure of
    * `edges` (directed (src, dst) rows; symmetrized, deduped, self-loops
    * dropped). Output: (id, degree, n_tri) for every vertex of the edge
    * set, n_tri = number of triangles containing the vertex.
    */
  def vertexTriangles(edges: DataFrame): DataFrame = {
    // ScaleOut: a link graph derived from one small parquet split would
    // otherwise run the symmetrize/orient kernels on one core (no-op at
    // real scale, where the edge list arrives as thousands of splits)
    val e = ScaleOut(edges.select(col("src").cast("long").as("src"),
        col("dst").cast("long").as("dst")))
      .filter(col("src") =!= col("dst"))
      // fail fast, never silently drop: an out-of-range id would corrupt
      // the orientation key, and filtering it out would change the graph
      .filter(when(
        col("src").between(0, KeyBase - 1) && col("dst").between(0, KeyBase - 1),
        lit(true))
        .otherwise(raise_error(concat(
          lit("Triangles: vertex id outside [0, 2^32): "),
          col("src"), lit(" -> "), col("dst"))).cast("boolean")))
    val und = e.union(e.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
    val deg = und.groupBy("src").agg(count(lit(1)).as("degree"))
    val key = deg.select(col("src").as("vid"),
      (col("degree") * KeyBase + col("src")).as("k"))
    val adj = und
      .join(key.select(col("vid").as("src"), col("k").as("ku")), "src")
      .join(key.select(col("vid").as("dst"), col("k").as("kv")), "dst")
      .filter(col("ku") < col("kv"))
      .select(col("src").as("u"), col("dst").as("v"), col("kv"))
    val wedges = adj.as("x").join(adj.as("y"),
        col("x.u") === col("y.u") && col("x.kv") < col("y.kv"))
      .select(col("x.u").as("u"), col("x.v").as("v"), col("y.v").as("w"))
    val tris = wedges.join(
      adj.select(col("u").as("v"), col("v").as("w")), Seq("v", "w"))
    val counts = tris.select(col("u").as("id"))
      .unionAll(tris.select(col("v").as("id")))
      .unionAll(tris.select(col("w").as("id")))
      .groupBy("id").agg(count(lit(1)).as("n_tri"))
    deg.select(col("src").as("id"), col("degree"))
      .join(counts, Seq("id"), "left")
      .select(col("id"), col("degree"),
        coalesce(col("n_tri"), lit(0L)).as("n_tri"))
  }
}
