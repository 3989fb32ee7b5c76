package graft.operators

import scala.collection.mutable

/** Byte-pair-encoding tokenization (Sennrich et al. 2016 shape): LEARN a
  * ranked merge table from corpus word frequencies, then ENCODE words by
  * applying merges greedily in rank order. This replaces q55's "top-k
  * vocabulary lookup" proxy with the real subword algorithm a training
  * pipeline runs before packing sequences.
  *
  * Scale shape: training consumes the (word, freq) aggregate — the
  * corpus collapses to its distinct-word table first (one groupBy), and
  * only the TOP-N words by frequency reach the driver (a bounded,
  * codebook-sized collect by contract, the Ivf/Pq pattern: N·|word|
  * bytes, independent of corpus size — sentencepiece's sentence-sample
  * cap is the same design). Encoding is the distributed hot path: a
  * compiled per-word kernel with the merge table riding the plan as a
  * reference object ([[graft.functions.expr.BpeEncode]]) — no join, no
  * shuffle, no per-row state.
  *
  * The apply rule is deliberately ONE-merge-at-a-time: repeatedly merge
  * the LEFTMOST occurrence of the lowest-ranked adjacent pair present.
  * This yields the same segmentation as the merge-all-occurrences-per-
  * pass formulation (disjoint occurrences of a pair don't affect each
  * other's ranks; overlapping runs resolve left-to-right under both), and
  * it is the exact rule the generated DuckDB oracle replays one
  * recursion step per merge ([[graft.queries.TextQueries]] q111).
  */
object Bpe {

  /** A learned model: `merges` in rank order (rank = index), `alphabet` =
    * the sorted distinct single-codepoint symbols of the training words.
    * Ids: alphabet gets 1..A in sorted order, merge OUTPUTS get A+1.. in
    * rank order (first occurrence wins when two merges produce the same
    * string); 0 is the out-of-vocabulary fallback — an unseen codepoint
    * stays a single-char piece and maps to 0 rather than failing.
    */
  final case class Model(merges: Seq[(String, String)], alphabet: Seq[String]) {
    /** l + \u0001 + r -> rank, the kernel's lookup shape. */
    lazy val ranks: java.util.HashMap[String, Integer] = {
      val m = new java.util.HashMap[String, Integer]()
      merges.zipWithIndex.foreach { case ((l, r), i) => m.put(l + "\u0001" + r, i) }
      m
    }
    /** piece -> id (insertion-ordered: alphabet then merge outputs). */
    lazy val vocab: Seq[(String, Long)] = {
      val seen = mutable.LinkedHashMap[String, Long]()
      alphabet.foreach(a => seen.getOrElseUpdate(a, seen.size + 1L))
      merges.foreach { case (l, r) => seen.getOrElseUpdate(l + r, seen.size + 1L) }
      seen.toSeq
    }
    lazy val ids: java.util.HashMap[String, java.lang.Long] = {
      val m = new java.util.HashMap[String, java.lang.Long]()
      vocab.foreach { case (p, i) => m.put(p, i) }
      m
    }
  }

  /** Split to single-codepoint strings — the unit the oracle's
    * codepoint-based SUBSTRING replays (NOT UTF-16 chars: a non-BMP
    * codepoint must be one symbol on both engines).
    */
  def codepoints(word: String): Array[String] = {
    val out = new mutable.ArrayBuffer[String](word.length)
    var i = 0
    while (i < word.length) {
      val cp = word.codePointAt(i)
      val n = Character.charCount(cp)
      out += word.substring(i, i + n)
      i += n
    }
    out.toArray
  }

  /** Learn `numMerges` ranked merges from (word, frequency) pairs.
    * Deterministic: the best pair each round is (count DESC, pair ASC) —
    * input order never matters. Training applies each chosen merge to
    * all its non-overlapping occurrences left-to-right (the classic
    * per-pass rule; equivalence with the encoder's one-at-a-time rule is
    * argued there).
    */
  def train(wordFreqs: Seq[(String, Long)], numMerges: Int): Model = {
    val words = wordFreqs.map { case (w, f) =>
      (mutable.ArrayBuffer.from(codepoints(w)), f)
    }
    val alphabet = words.iterator.flatMap(_._1).toSet.toSeq.sorted
    val merges = mutable.ArrayBuffer[(String, String)]()
    var m = 0
    var exhausted = false
    while (m < numMerges && !exhausted) {
      val counts = mutable.HashMap[(String, String), Long]()
      words.foreach { case (syms, f) =>
        var i = 0
        while (i < syms.length - 1) {
          val p = (syms(i), syms(i + 1))
          counts.update(p, counts.getOrElse(p, 0L) + f)
          i += 1
        }
      }
      if (counts.isEmpty) exhausted = true
      else {
        val best = counts.toSeq.minBy { case ((l, r), c) => (-c, l, r) }._1
        merges += best
        words.foreach { case (syms, _) =>
          var i = 0
          while (i < syms.length - 1) {
            if (syms(i) == best._1 && syms(i + 1) == best._2) {
              syms(i) = best._1 + best._2
              syms.remove(i + 1)
            }
            // a merged symbol is never the left half of ANOTHER occurrence
            // of the same pair at the same spot; advancing past it is the
            // left-to-right non-overlap rule
            i += 1
          }
        }
      }
      m += 1
    }
    Model(merges.toSeq, alphabet)
  }

  /** DISTRIBUTED merge training — [[train]]'s twin for vocabularies too
    * large for the driver-side top-N contract: the (word, freq) table
    * stays distributed for the whole run; per merge round exactly ONE
    * pair-count aggregate executes (flatMap adjacent pairs ->
    * reduceByKey, map-side combined so the exchange carries distinct
    * pairs per partition, never the occurrence stream) and only the
    * ARGMAX pair — one row, ranked (count DESC, pair ASC) through
    * `takeOrdered(1)` so each partition forwards a single candidate —
    * reaches the driver. The chosen merge then rewrites the symbol
    * arrays in place (a map, no shuffle).
    *
    * Cost model: `numMerges` rounds × (one pair-count aggregate + one
    * partition-local materialization pass); driver traffic is one pair
    * per round plus the alphabet once. The symbol-array RDD is
    * persisted and swapped each round (the [[Dedup]] iterative-frontier
    * pattern) so round k never recomputes rounds 1..k-1; RDD iteration
    * is deliberate here — 50 rounds of per-row array rewriting through
    * Catalyst would stack 50 plan layers for no optimizer benefit.
    *
    * Determinism and EXACT equivalence with [[train]] on the same input
    * (BpeSpec): counts are exact longs, the argmax ordering is
    * identical, and the per-round rewrite applies the same
    * left-to-right non-overlap rule, so the learned `Model` — merges,
    * ranks, alphabet, ids — is equal element-for-element regardless of
    * partitioning.
    */
  def trainDistributed(
      wordFreqs: org.apache.spark.sql.DataFrame, numMerges: Int,
      wordCol: String = "w", freqCol: String = "f"): Model = {
    import org.apache.spark.sql.functions.col
    import org.apache.spark.storage.StorageLevel
    val sc = wordFreqs.sparkSession.sparkContext
    var words = wordFreqs
      .select(col(wordCol).cast("string"), col(freqCol).cast("long"))
      .rdd.map(r => (codepoints(r.getString(0)), r.getLong(1)))
      .persist(StorageLevel.MEMORY_AND_DISK)
    // alphabet-sized collect (the codebook contract)
    val alphabet = words.flatMap(_._1).distinct().collect().sorted.toSeq
    val merges = mutable.ArrayBuffer[(String, String)]()
    val ord: Ordering[((String, String), Long)] =
      Ordering.by { case ((l, r), c) => (-c, l, r) }
    var exhausted = false
    var m = 0
    while (m < numMerges && !exhausted) {
      val top = words.flatMap { case (syms, f) =>
        (0 until syms.length - 1).iterator.map(i => ((syms(i), syms(i + 1)), f))
      }.reduceByKey(_ + _).takeOrdered(1)(ord)
      if (top.isEmpty) exhausted = true
      else {
        val best = top.head._1
        merges += best
        val next = words.map { case (syms, f) => (mergePair(syms, best), f) }
          .persist(StorageLevel.MEMORY_AND_DISK)
        next.count() // materialize before releasing the parent round
        words.unpersist()
        words = next
      }
      m += 1
    }
    words.unpersist()
    Model(merges.toSeq, alphabet)
  }

  /** Persist a learned model (merges in rank order + alphabet) so a
    * full-vocabulary distributed training runs once per corpus state
    * and scoring queries reuse it (the train-once/score-many shape,
    * [[graft.operators.QualityClassifier.save]]'s contract). `meta` is
    * written LAST so `meta/_SUCCESS` is a valid completion marker.
    */
  def save(spark: org.apache.spark.sql.SparkSession, model: Model, dir: String): Unit = {
    import spark.implicits._
    model.merges.zipWithIndex.map { case ((l, r), i) => (i, l, r) }
      .toDF("rank", "l", "r")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/merges")
    model.alphabet.zipWithIndex.map { case (a, i) => (i, a) }
      .toDF("idx", "sym")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/alphabet")
    Seq((model.merges.size, model.alphabet.size)).toDF("n_merges", "n_alphabet")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/meta")
  }

  def load(spark: org.apache.spark.sql.SparkSession, dir: String): Model = {
    val merges = spark.read.parquet(s"$dir/merges").collect()
      .map(r => (r.getAs[Int]("rank"), r.getAs[String]("l"), r.getAs[String]("r")))
      .sortBy(_._1).map(t => (t._2, t._3)).toSeq
    val alphabet = spark.read.parquet(s"$dir/alphabet").collect()
      .map(r => (r.getAs[Int]("idx"), r.getAs[String]("sym")))
      .sortBy(_._1).map(_._2).toSeq
    Model(merges, alphabet)
  }

  /** One training round's rewrite: merge every LEFT-TO-RIGHT
    * non-overlapping occurrence of `best` — the exact rule [[train]]'s
    * in-place loop applies (merging at i and resuming at the next index
    * is skip-two over the original array; the merged output symbol can
    * never recreate the same pair, so the two formulations coincide).
    */
  private def mergePair(syms: Array[String], best: (String, String)): Array[String] = {
    val out = new mutable.ArrayBuffer[String](syms.length)
    var i = 0
    while (i < syms.length) {
      if (i < syms.length - 1 && syms(i) == best._1 && syms(i + 1) == best._2) {
        out += best._1 + best._2
        i += 2
      } else {
        out += syms(i)
        i += 1
      }
    }
    out.toArray
  }

  /** Reference encoder (the kernel's spec twin): repeatedly merge the
    * leftmost occurrence of the lowest-ranked adjacent pair until no
    * adjacent pair is in the merge table.
    */
  def encode(word: String, ranks: java.util.HashMap[String, Integer]): Array[String] = {
    val syms = mutable.ArrayBuffer.from(codepoints(word))
    var done = false
    while (!done && syms.length > 1) {
      var bestRank = Int.MaxValue
      var bestI = -1
      var i = 0
      while (i < syms.length - 1) {
        val r = ranks.get(syms(i) + "\u0001" + syms(i + 1))
        if (r != null && r < bestRank) { bestRank = r; bestI = i }
        i += 1
      }
      if (bestI < 0) done = true
      else {
        syms(bestI) = syms(bestI) + syms(bestI + 1)
        syms.remove(bestI + 1)
      }
    }
    syms.toArray
  }
}
