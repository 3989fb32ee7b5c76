package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** A-priori frequent-itemset mining, level 3 (Agrawal & Srikant 1994)
  * — the iteration the single-pass co-purchase count (q163) is the
  * first level of: frequent triples, enumerated THROUGH the frequent
  * pairs. The monotonicity property ("every subset of a frequent set
  * is frequent") makes the pruned enumeration EXACT, not approximate —
  * which is why the oracle can brute-force all triples and still match.
  *
  * Scale shape — pruning during enumeration, not after: pair
  * occurrences are filtered by the frequent-pair table (broadcast
  * left-semi, support-floor-sized) BEFORE the third item joins, and
  * each extension filters again on its two new sub-pairs. Per-basket
  * cost falls from |basket|³ to |frequent pairs in basket| ×
  * |basket| — on a Zipfian catalogue the frequent-pair table is tiny
  * relative to the pair surface, which is the entire point of
  * A-priori. All joins are basket-keyed equi-joins; nothing is ever
  * cross-basket.
  */
object Apriori {

  /** Frequent triples over `baskets` (basketCol, itemCol — rows assumed
    * distinct per basket): all item triples a < b < c co-occurring in
    * at least `minSupport` baskets, with their exact support.
    * Output: (item_a, item_b, item_c, support).
    */
  def frequentTriples(
      baskets: DataFrame, basketCol: String, itemCol: String,
      minSupport: Long): DataFrame = {
    require(minSupport >= 1, "minSupport must be >= 1")
    val op = CacheScope.pin(
      ScaleOut(baskets.select(col(basketCol).as("ok"), col(itemCol).as("pk")))
        .distinct(),
      StorageLevel.MEMORY_AND_DISK)
    val pairOcc = op.as("a").join(op.as("b"),
        col("a.ok") === col("b.ok") && col("a.pk") < col("b.pk"))
      .select(col("a.ok").as("ok"), col("a.pk").as("pa"), col("b.pk").as("pb"))
    val freq2 = CacheScope.pin(
      pairOcc.groupBy("pa", "pb").agg(count(lit(1)).as("s"))
        .filter(col("s") >= minSupport)
        .select(col("pa").as("x"), col("pb").as("y")),
      StorageLevel.MEMORY_AND_DISK)
    // enumerate only occurrences of FREQUENT pairs, then extend by a
    // third item and prune on both new sub-pairs before counting
    val ab = pairOcc.join(broadcast(freq2),
      col("pa") === col("x") && col("pb") === col("y"), "left_semi")
      .as("ab")
    val abc = ab.join(op.as("c"),
        col("ab.ok") === col("c.ok") && col("ab.pb") < col("c.pk"))
      .select(col("ab.ok"), col("ab.pa").as("pa"), col("ab.pb").as("pb"),
        col("c.pk").as("pc"))
      .join(broadcast(freq2),
        col("pb") === col("x") && col("pc") === col("y"), "left_semi")
      .join(broadcast(freq2),
        col("pa") === col("x") && col("pc") === col("y"), "left_semi")
    abc.groupBy("pa", "pb", "pc").agg(count(lit(1)).as("support"))
      .filter(col("support") >= minSupport)
      .select(col("pa").as("item_a"), col("pb").as("item_b"),
        col("pc").as("item_c"), col("support"))
  }
}
