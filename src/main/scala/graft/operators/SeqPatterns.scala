package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequential pattern mining over per-user event streams: which ordered
  * type sequences (length 2 and 3, NON-contiguous — "signup ... view
  * ... purchase" with anything in between) occur in at least
  * `minSupportPct`% of users. The gapped counterpart of the contiguous
  * q186 trigram paths: support counts USERS containing the
  * subsequence, the GSP/PrefixSpan semantics (Srikant & Agrawal 1996),
  * not occurrence counts. Reference scope: no sequence mining in the
  * reference; extension surface.
  *
  * Containment is decided by the greedy-occurrence bounds, never a
  * positional self-join over events:
  *
  *   (a,b)   contained  iff  last(b) > first(a)
  *   (a,b,c) contained  iff  last(c) > e2(a,b),
  *     e2(a,b) = earliest b-position strictly after first(a)
  *
  * (greedy is exact for subsequence containment: any witness i<j<k has
  * first(a) <= i, so e2 <= j < k <= last(c)). Position = row_number per
  * user over (ts, event_id) — a total order both engines replay.
  *
  * Scale shape: one per-user window for positions, then everything is
  * keyed by user with alphabet-bounded fan-out — first/last bounds are
  * |users| x A rows, e2 is built from ONE occurrences-to-firsts join
  * (corpus x A intermediate, the only corpus-sized exchange past the
  * window) and pruned by the a-priori property (a frequent (a,b,c)
  * needs a frequent (a,b) prefix) through a broadcast semi-join before
  * the length-3 support join. No stage is ever corpus x corpus.
  */
object SeqPatterns {

  /** Frequent length-2/3 type sequences with user support. Output:
    * (a, b, c, support) — c = '' for length-2 patterns.
    */
  def frequentSequences(ev: DataFrame, userCol: String, typeCol: String,
      tsCol: String, tieCol: String, minSupportPct: Int): DataFrame = {
    val w = Window.partitionBy("u").orderBy(col("ts"), col("tie"))
    val occ = ev.select(col(userCol).as("u"), col(typeCol).as("t"),
        col(tsCol).as("ts"), col(tieCol).as("tie"))
      .withColumn("p", row_number().over(w))
      .select("u", "t", "p")
    val fl = occ.groupBy("u", "t").agg(min("p").as("f"), max("p").as("l"))
    val th = occ.agg(countDistinct("u").as("n"))
      .select(expr(s"(n * $minSupportPct + 99) div 100").as("th"))
    val s2 = fl.as("a").join(fl.as("b"),
        col("a.u") === col("b.u") && col("b.l") > col("a.f"))
      .groupBy(col("a.t").as("a"), col("b.t").as("b"))
      .agg(count(lit(1)).as("support"))
    val f2 = s2.crossJoin(broadcast(th)).filter(col("support") >= col("th"))
    val e2 = occ.as("o").join(fl.as("a"),
        col("o.u") === col("a.u") && col("o.p") > col("a.f"))
      .groupBy(col("o.u").as("u"), col("a.t").as("a"), col("o.t").as("b"))
      .agg(min(col("o.p")).as("e"))
    val s3 = e2.join(broadcast(f2.select("a", "b")), Seq("a", "b"), "left_semi")
      .as("e")
      .join(fl.as("c"), col("e.u") === col("c.u") && col("c.l") > col("e.e"))
      .groupBy(col("e.a"), col("e.b"), col("c.t").as("c"))
      .agg(count(lit(1)).as("support"))
    f2.select(col("a"), col("b"), lit("").as("c"), col("support"))
      .unionByName(s3.crossJoin(broadcast(th))
        .filter(col("support") >= col("th"))
        .select("a", "b", "c", "support"))
  }
}
