package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions._
import graft.functions.expr.HashFunctions._
import graft.functions.expr.VectorFunctions.cosineSim

/** Deduplication operators for the documents pipeline, each designed for
  * the 100 TB shape:
  *
  *   - exact: hash-groupBy — one shuffle keyed by a 128-bit digest, never
  *     by the full text;
  *   - MinHash+LSH: shingle -> k-minhash signature -> band buckets ->
  *     bucket-local candidate join -> exact-Jaccard verification. Only
  *     bucket collisions are ever paired, so cost is ~linear in corpus
  *     size for bounded bucket sizes (vs O(n²) all-pairs);
  *   - SimHash: 64-bit sketch, banded by pigeonhole for a Hamming radius;
  *   - exact n-gram Jaccard: inverted shingle index join — the ground
  *     truth the sketch methods are verified against;
  *   - embedding cosine: exact all-pairs (small SF / ground truth) and a
  *     random-hyperplane-bucketed variant (scale path).
  */
object Dedup {

  /** Exact dedup: first (min-id) document per identical normalized text.
    * Grouping key is the md5 digest, not the text — the shuffle moves 16
    * bytes + id per row.
    */
  def exactGroups(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    docs
      .select(col(idCol), contentFingerprint(col(textCol)).as("fingerprint"))
      .groupBy("fingerprint")
      .agg(min(idCol).as("keep_id"), count(lit(1)).as("n_copies"))

  /** Per-doc distinct word-shingle sets, the shared input of the Jaccard
    * family.
    *
    * Deliberately NOT filtered on `size(shingles) > 0`: predicate pushdown
    * would substitute the whole shingle expression into the scan's data
    * filter — running the expensive kernel inside the (possibly
    * single-split) scan stage, below the [[ScaleOut]] exchange. Zero-
    * shingle docs are harmless downstream: they explode to no inverted-
    * index rows, and empty-vs-empty sketch collisions score NaN in
    * verification, which fails every threshold.
    */
  def shingled(docs: DataFrame, idCol: String, textCol: String, n: Int): DataFrame =
    ScaleOut(docs.select(col(idCol).as("id"), col(textCol).as("text")))
      .select(col("id"), shingleSet(col("text"), n).as("shingles"))

  /** Exact-Jaccard verification of candidate pairs: join the shingle sets
    * back and compute |intersect|/|union| — only candidate pairs are ever
    * scored, and the score is exact regardless of how candidates were
    * generated. Shared by the inverted-index and MinHash-LSH paths.
    */
  private def verifyJaccard(
      candidates: DataFrame, sets: DataFrame, threshold: Double): DataFrame =
    candidates
      .join(sets.select(col("id").as("id_a"), col("shingles").as("sh_a")), "id_a")
      .join(sets.select(col("id").as("id_b"), col("shingles").as("sh_b")), "id_b")
      .withColumn("jaccard",
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b"))))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("jaccard"))

  /** Ground-truth near-dup pairs: exact Jaccard with candidates from an
    * inverted shingle index (explode -> self-join on shingle hash), never
    * a cross join.
    *
    * Scale guards: (1) the join key is the 64-bit shingle hash, so the
    * shuffle moves 8-byte keys instead of n-gram strings; (2) shingles
    * occurring in more than `maxShingleDf` documents are dropped from
    * CANDIDATE GENERATION only — a shingle shared by that many documents
    * is boilerplate and pairs everything with everything (m² rows for
    * df=m). SCORING stays exact under the cap: shared rare shingles are
    * counted by the co-occurrence groupBy, shared hot shingles are added
    * back from tiny per-doc above-cap key arrays (bounded by the number
    * of distinct boilerplate shingles). The cap IS however a recall bound,
    * not a free lunch: a pair whose EVERY common shingle has df > cap
    * generates no candidate row and is lost — and a near-dup cluster
    * larger than the cap is exactly that case, since all of its shared
    * shingles exceed the cap. Operators that must enumerate all pairs of
    * such clusters should either raise the cap to the corpus max df
    * (restoring full exactness at m²-per-hot-shingle candidate cost) or
    * dedup the cluster by representative first ([[exactGroups]] /
    * MinHash banding, which has no df cap — see [[minhashLshPairs]]). On
    * the driver testdata max df is 25, so the default cap is a provable
    * no-op there.
    *
    * Plan shape: the document-frequency is computed with a window over the
    * SAME shkey-partitioned exchange the self-join and the hot-set
    * aggregation consume, so Spark's ReuseExchange evaluates the shingle
    * kernel (the most expensive expression here) exactly once, with no
    * persist/unpersist lifecycle to leak.
    */
  def ngramJaccardPairs(
      docs: DataFrame, idCol: String = "doc_id", textCol: String = "text",
      n: Int = 3, threshold: Double = 0.8, maxShingleDf: Int = 1000): DataFrame = {
    // inv carries n_sh per row so the pair scorer needs NO join back to
    // the (expensive, recomputed-per-use) shingle sets — one small int per
    // inverted-index row buys the removal of two broadcast subqueries.
    val inv = shingled(docs, idCol, textCol, n)
      .select(col("id"), size(col("shingles")).as("n_sh"),
        explode(col("shingles")).as("sh"))
      .select(col("id"), col("n_sh"), xxhash64(col("sh")).as("shkey"))
    // df via a window, not groupBy+join: every consumer below then shares
    // one identical Exchange(shkey) subtree, which ReuseExchange computes
    // once — with the groupBy+join form the partial aggregate sat under
    // its own exchange and the kernel ran ~5x.
    val keyed = inv.withColumn("df",
      count(lit(1)).over(Window.partitionBy("shkey")))
    val rare = keyed.filter(col("df") <= maxShingleDf).select("id", "n_sh", "shkey")
    // count-based scoring: one groupBy over the co-occurrence rows — no
    // per-pair array materialization (cheaper than set-intersecting the
    // full shingle arrays for every candidate at ~1M candidates)
    val commonRare = rare.as("a").join(rare.as("b"),
        col("a.shkey") === col("b.shkey") && col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("id_a"), col("b.id").as("id_b"),
        col("a.n_sh").as("n_a"), col("b.n_sh").as("n_b"))
      .agg(count(lit(1)).as("n_rare"))
    // hot-shingle correction keeps the score EXACT under the cap: per-doc
    // arrays of above-cap shingle keys are tiny by construction (few
    // distinct boilerplate shingles), so the intersect is O(cap-outliers)
    val hotSets = keyed.filter(col("df") > maxShingleDf)
      .groupBy("id").agg(sort_array(collect_set(col("shkey"))).as("hot"))
    val emptyHot = array().cast("array<bigint>")
    commonRare
      .join(hotSets.select(col("id").as("id_a"), col("hot").as("hot_a")), Seq("id_a"), "left")
      .join(hotSets.select(col("id").as("id_b"), col("hot").as("hot_b")), Seq("id_b"), "left")
      .withColumn("n_common", col("n_rare") +
        size(array_intersect(coalesce(col("hot_a"), emptyHot), coalesce(col("hot_b"), emptyHot))))
      .withColumn("jaccard",
        col("n_common").cast("double") / (col("n_a") + col("n_b") - col("n_common")))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("jaccard"))
  }

  /** MinHash+LSH near-dup pairs: k-hash signatures, b bands of r rows
    * (k = b*r); docs colliding in any band become candidates; candidates
    * are verified with exact Jaccard so output quality equals the exact
    * operator, at index cost instead of all-pairs cost.
    *
    * Default k=128, b=32, r=4: P[candidate | j] = 1-(1-j^4)^32, i.e.
    * ~1e-7 miss rate at j=0.8.
    */
  def minhashLshPairs(
      docs: DataFrame, idCol: String = "doc_id", textCol: String = "text",
      n: Int = 3, threshold: Double = 0.8,
      numHashes: Int = 128, bands: Int = 32, seed: Long = 42L): DataFrame = {
    require(numHashes % bands == 0, "numHashes must be divisible by bands")
    val r = numHashes / bands
    val sets = shingled(docs, idCol, textCol, n)
    val sig = sets.select(col("id"),
      minhashSignature(col("shingles"), numHashes, seed).as("sig"))
    // one row per (band, bucket): bucket key = xxhash64 of the band slice.
    // No document-frequency cap is needed here: a band collision requires
    // r consecutive minhashes equal (P ≈ j^r), so boilerplate shingles do
    // NOT create hot buckets — only genuine near-dup clusters do, and a
    // cluster of m near-identical docs legitimately yields ~m²/2 output
    // pairs (the requested pair semantics; cluster-representative dedup
    // via exactGroups/connected components is the path when m² output
    // itself is the problem).
    val buckets = sig
      .select(col("id"), col("sig"), explode(sequence(lit(0), lit(bands - 1))).as("band"))
      .select(col("id"), col("band"),
        xxhash64(col("band"), expr(s"slice(sig, band * $r + 1, $r)")).as("bucket"))
    val candidates = buckets.as("a").join(buckets.as("b"),
        col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct()
    // exact-Jaccard verification of candidates only
    verifyJaccard(candidates, sets, threshold)
  }

  /** SimHash near-dup pairs within a Hamming radius. Candidates come from
    * equality on one of `bands` equal-width bit-bands of the 64-bit
    * sketch (pigeonhole: hamming <= bands-1 guarantees a shared band),
    * verified with an exact popcount.
    */
  def simhashPairs(
      docs: DataFrame, idCol: String = "doc_id", textCol: String = "text",
      maxHamming: Int = 3, bands: Int = 4): DataFrame = {
    require(64 % bands == 0, "bands must divide 64")
    val w = 64 / bands
    val sketches = ScaleOut(docs.select(col(idCol).as("id"), col(textCol).as("text")))
      .select(col("id"), simhash64(tokens(col("text"))).as("sk"))
    val banded = sketches.select(col("id"), col("sk"),
        explode(sequence(lit(0), lit(bands - 1))).as("band"))
      .withColumn("piece",
        expr(s"shiftrightunsigned(sk, band * $w)").bitwiseAND(lit((1L << w) - 1)))
    banded.as("a").join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.piece") === col("b.piece") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        bit_count(col("a.sk").bitwiseXOR(col("b.sk"))).as("hamming"))
      // filter BEFORE distinct: the hamming test is per-row cheap and
      // prunes the exchange that dedups band collisions
      .filter(col("hamming") <= maxHamming)
      .distinct()
  }

  /** Exact embedding-cosine near-dup pairs (ground truth; all-pairs via a
    * broadcast nested-loop — use ONLY at verification scale or as the
    * within-bucket kernel of [[embeddingNearDupLsh]]).
    */
  def embeddingNearDupExact(
      emb: DataFrame, idCol: String = "vec_id", vecCol: String = "embedding",
      threshold: Double = 0.95): DataFrame = {
    val v = ScaleOut(emb.select(col(idCol).as("id"), col(vecCol).as("vec")))
    v.as("a").join(v.as("b"), col("a.id") < col("b.id"))
      .withColumn("cosine", cosineSim(col("a.vec"), col("b.vec")))
      .filter(col("cosine") >= threshold)
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        round(col("cosine"), 6).as("cosine"))
  }

  /** Scale path for embedding near-dup: random-hyperplane LSH buckets
    * (see [[Ann.withBuckets]]), exact cosine within buckets only.
    *
    * Recall/selectivity math (details in [[Ann]]'s object doc): a pair at
    * angle θ agrees on one hyperplane bit with probability p = 1 − θ/π.
    * The shipped defaults (planes=16, tables=16, radius-1 multi-probe on
    * one join side) target the realistic near-dup regime of the default
    * `threshold` 0.95 (p ≥ 0.90): miss ≈ 1e-5 at the threshold boundary,
    * exponentially safer above it, while orthogonal background pairs
    * collide with only 16·17/2^16 ≈ 0.4% probability — ~240× fewer
    * scorings than the all-pairs twin. At low thresholds near cos 0.5
    * (θ = 60°, the hyperplane worst case) NO parameterization is
    * selective at near-certain recall — candidate volume degenerates to
    * ≈ all-pairs; pass few-planes/many-tables explicitly there (as the
    * demo query does) and expect brute-force-like cost, or use
    * [[embeddingNearDupExact]] outright.
    */
  def embeddingNearDupLsh(
      emb: DataFrame, idCol: String = "vec_id", vecCol: String = "embedding",
      threshold: Double = 0.95, planes: Int = 16, tables: Int = 16,
      dim: Int = 64, seed: Long = 42L, probeRadius: Int = 1): DataFrame = {
    val v = ScaleOut(emb.select(col(idCol).as("id"), col(vecCol).as("vec")))
    val base = Ann.withBuckets(v, "vec", planes, tables, dim, seed)
    val probed = Ann.withBuckets(v, "vec", planes, tables, dim, seed, probeRadius)
    probed.as("a").join(base.as("b"),
        col("a.table") === col("b.table") && col("a.bucket") === col("b.bucket") &&
          col("a.id") < col("b.id"))
      // score IN the join stage and dedupe the scalar triple afterwards:
      // a multi-table/multi-probe pair re-scores redundantly (cheap flops)
      // instead of shuffling its vectors through a distinct (dominant cost
      // at tables x probes candidate multiplicity)
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        cosineSim(col("a.vec"), col("b.vec")).as("cosine"))
      .filter(col("cosine") >= threshold)
      .distinct()
      .select(col("id_a"), col("id_b"), round(col("cosine"), 6).as("cosine"))
  }
}
