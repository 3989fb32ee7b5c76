package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.functions.expr.{FreqFunctions, MGBuffer}

class FreqSpec extends SparkTestBase {
  import spark.implicits._

  // Zipf-ish planted stream: vocabulary FAR wider than the MG capacity
  // (2000 rare singletons vs capacity ~50), with a handful of planted
  // heavies — the sketch must actually prune, and must not lose a heavy.
  private lazy val stream = {
    val heavies = Seq("alpha" -> 900, "beta" -> 600, "gamma" -> 400, "delta" -> 260)
    val rows =
      heavies.flatMap { case (t, n) => Seq.fill(n)(t) } ++
        (0 until 2000).map(i => s"rare$i") ++
        (0 until 10).flatMap(i => Seq.fill(30)(s"mid$i")) // 300 mid-weight
    // deterministic interleave so heavies spread across partitions
    rows.zipWithIndex.sortBy { case (_, i) => (i * 2654435761L) % 4460 }
      .map(_._1).toDF("token").repartition(8)
  }
  private lazy val total = 900 + 600 + 400 + 260 + 2000 + 300 // 4460

  test("MG buffer: add/merge keep every item above the n/(c+1) guarantee") {
    val b = new MGBuffer(10)
    val items = Seq.fill(50)("hot") ++ (0 until 200).map(i => s"cold$i")
    // interleave
    items.zipWithIndex.sortBy { case (_, i) => (i * 7919) % items.length }
      .foreach { case (t, _) => b.add(t) }
    // n=250, c=10 -> anything with freq > 22 must survive
    assert(b.counts.contains("hot"), "heavy item evicted from MG summary")
    assert(b.counts.size <= 10)

    // mergeable-summaries rule: split the stream in two buffers, merge
    val b1 = new MGBuffer(10); val b2 = new MGBuffer(10)
    items.zipWithIndex.foreach { case (t, i) => (if (i % 2 == 0) b1 else b2).add(t) }
    b1.mergeWith(b2)
    assert(b1.counts.contains("hot"), "heavy item lost in merge")
    assert(b1.counts.size <= 10)
  }

  test("distributed MG summary is capacity-capped and complete for heavies") {
    val cap = 50
    val summary = stream
      .agg(FreqFunctions.mgSummary(col("token"), cap).as("s"))
      .head().getSeq[org.apache.spark.sql.Row](0)
    assert(summary.size <= cap)
    val kept = summary.map(_.getString(0)).toSet
    // guarantee: freq > n/(cap+1) = 4460/51 ~ 87.5 must survive the
    // partial/final split — all four planted heavies qualify
    for (h <- Seq("alpha", "beta", "gamma", "delta"))
      assert(kept.contains(h), s"heavy '$h' missing from merged summary")
    // lower-count property: stored count never exceeds the true count
    val stored = summary.map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(stored("alpha") <= 900L)
  }

  test("exactHeavyHitters equals the brute-force exact answer") {
    val phi = 0.05 // threshold 223: alpha/beta/gamma/delta qualify
    val got = Freq.exactHeavyHitters(stream, col("token"), phi)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val want = stream.groupBy("token").count()
      .filter(col("count") > phi * total)
      .orderBy(col("count").desc, col("token"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == want)
    assert(got.map(_._1) == Seq("alpha", "beta", "gamma", "delta"))
  }

  test("counts are exact (verify pass), not MG lower bounds") {
    val got = Freq.exactHeavyHitters(stream, col("token"), 0.05)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(got("alpha") == 900L && got("delta") == 260L)
  }

  test("empty input and no-qualifier input return empty with the contract schema") {
    val empty = Freq.exactHeavyHitters(
      Seq.empty[String].toDF("token"), col("token"), 0.1)
    assert(empty.columns.toSeq == Seq("item", "cnt"))
    assert(empty.count() == 0)
    // uniform stream, threshold above every count
    val uniform = (0 until 100).map(i => s"u${i % 50}").toDF("token")
    assert(Freq.exactHeavyHitters(uniform, col("token"), 0.5).count() == 0)
  }
}
