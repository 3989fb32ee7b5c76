package graft.operators

import org.apache.spark.sql.DataFrame
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
    * family. Filtered to docs with at least one shingle.
    */
  def shingled(docs: DataFrame, idCol: String, textCol: String, n: Int): DataFrame =
    docs.select(col(idCol).as("id"), shingleSet(col(textCol), n).as("shingles"))
      .filter(size(col("shingles")) > 0)

  /** Ground-truth near-dup pairs: exact Jaccard over word n-gram shingle
    * sets via an inverted index (explode -> join on shingle -> count
    * common), never a cross join. Partitioned by shingle then by pair —
    * both keys scale out.
    */
  def ngramJaccardPairs(
      docs: DataFrame, idCol: String = "doc_id", textCol: String = "text",
      n: Int = 3, threshold: Double = 0.8): DataFrame = {
    val sets = shingled(docs, idCol, textCol, n).cache()
    val sizes = sets.select(col("id"), size(col("shingles")).as("n_sh"))
    val inv = sets.select(col("id"), explode(col("shingles")).as("sh"))
    val common = inv.as("a").join(inv.as("b"),
        col("a.sh") === col("b.sh") && col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .agg(count(lit(1)).as("n_common"))
    common
      .join(sizes.withColumnsRenamed(Map("id" -> "id_a", "n_sh" -> "n_a")), "id_a")
      .join(sizes.withColumnsRenamed(Map("id" -> "id_b", "n_sh" -> "n_b")), "id_b")
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
    val sets = shingled(docs, idCol, textCol, n).cache()
    val sig = sets.select(col("id"),
      minhashSignature(col("shingles"), numHashes, seed).as("sig"))
    // one row per (band, bucket): bucket key = xxhash64 of the band slice
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
    val withSets = candidates
      .join(sets.select(col("id").as("id_a"), col("shingles").as("sh_a")), "id_a")
      .join(sets.select(col("id").as("id_b"), col("shingles").as("sh_b")), "id_b")
      .withColumn("jaccard",
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b"))))
    withSets.filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("jaccard"))
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
    val sketches = docs
      .select(col(idCol).as("id"), simhash64(tokens(col(textCol))).as("sk"))
    val banded = sketches.select(col("id"), col("sk"),
        explode(sequence(lit(0), lit(bands - 1))).as("band"))
      .withColumn("piece",
        expr(s"shiftrightunsigned(sk, band * $w)").bitwiseAND(lit((1L << w) - 1)))
    banded.as("a").join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.piece") === col("b.piece") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        bit_count(col("a.sk").bitwiseXOR(col("b.sk"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  /** Exact embedding-cosine near-dup pairs (ground truth; all-pairs via a
    * broadcast nested-loop — use ONLY at verification scale or as the
    * within-bucket kernel of [[embeddingNearDupLsh]]).
    */
  def embeddingNearDupExact(
      emb: DataFrame, idCol: String = "vec_id", vecCol: String = "embedding",
      threshold: Double = 0.95): DataFrame = {
    val v = emb.select(col(idCol).as("id"), col(vecCol).as("vec"))
    v.as("a").join(v.as("b"), col("a.id") < col("b.id"))
      .withColumn("cosine", cosineSim(col("a.vec"), col("b.vec")))
      .filter(col("cosine") >= threshold)
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        round(col("cosine"), 6).as("cosine"))
  }

  /** Scale path for embedding near-dup: random-hyperplane LSH buckets
    * (see [[Ann.hyperplaneSignature]]), exact cosine within buckets only.
    */
  def embeddingNearDupLsh(
      emb: DataFrame, idCol: String = "vec_id", vecCol: String = "embedding",
      threshold: Double = 0.95, planes: Int = 12, tables: Int = 4,
      dim: Int = 64, seed: Long = 42L): DataFrame = {
    val v = emb.select(col(idCol).as("id"), col(vecCol).as("vec"))
    val bucketed = Ann.withBuckets(v, "vec", planes, tables, dim, seed)
    bucketed.as("a").join(bucketed.as("b"),
        col("a.table") === col("b.table") && col("a.bucket") === col("b.bucket") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        col("a.vec").as("vec_a"), col("b.vec").as("vec_b"))
      .distinct()
      .withColumn("cosine", cosineSim(col("vec_a"), col("vec_b")))
      .filter(col("cosine") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("cosine"), 6).as("cosine"))
  }
}
