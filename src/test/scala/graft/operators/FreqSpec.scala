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

  test("CMS kernel matches an independent reference replay") {
    import graft.functions.expr.{CmsParams, TextHashOps}
    import org.apache.spark.unsafe.types.UTF8String
    val d = 4; val logW = 10
    val got = Seq("alpha", "rare17", "ünïcode✓").toDF("token")
      .select(col("token"),
        graft.functions.expr.HashFunctions.cmsBuckets(col("token"), d, logW).as("bs"))
      .collect().map(r => r.getString(0) -> r.getSeq[Int](1)).toMap
    for ((t, bs) <- got) {
      val x = TextHashOps.hash64(UTF8String.fromString(t))
      val want = (0 until d).map(i =>
        ((x * CmsParams.A(i) + CmsParams.B(i)) & ((1L << logW) - 1)).toInt)
      assert(bs == want, s"bucket mismatch for '$t'")
      assert(bs.forall(b => b >= 0 && b < (1 << logW)))
    }
  }

  test("CMS estimates dominate true counts and the HH set is a superset of exact") {
    val phi = 0.05
    val exact = Freq.exactHeavyHitters(stream, col("token"), phi)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val cms = CacheScope.scoped {
      Freq.cmsHeavyHitters(stream, col("token"), phi)
        .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    }
    // one-sided error: every exact heavy hitter present, estimate >= truth
    for ((t, cnt) <- exact) {
      assert(cms.contains(t), s"exact heavy hitter '$t' missing from CMS result")
      assert(cms(t) >= cnt, s"CMS estimate ${cms(t)} below true count $cnt for '$t'")
    }
    // the n*e/w overshoot bound is PROBABILISTIC (pr >= 1 - e^-d per
    // item): a rare token colliding with a heavy in all d rows can blow
    // through it (and one does in this planted stream). Assert the
    // aggregate shape instead: false positives are a sliver of the
    // vocabulary, and every false positive's estimate still dominates
    // its true count
    val trueCounts = stream.groupBy("token").count()
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val falsePos = cms.keySet -- exact.keySet
    assert(falsePos.size <= 10,
      s"${falsePos.size} CMS false positives out of ${trueCounts.size} vocab items")
    for (t <- falsePos)
      assert(cms(t) >= trueCounts(t), s"estimate below truth for '$t'")
    // and the probabilistic bound DOES hold for the bulk of the vocab:
    // re-estimate everything and check the 99th percentile of overshoot
    val allEst = CacheScope.scoped {
      Freq.cmsHeavyHitters(stream, col("token"), 1e-9)
        .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    }
    // the guarantee is P[overshoot > n*e/w] <= e^-d (~1.8% at d=4);
    // allow 2x slack for small-sample noise over this 2314-item vocab
    val bound = math.ceil(total * math.E / 1024).toLong
    val overshoots = allEst.map { case (t, est) => est - trueCounts(t) }.toSeq
    val violFrac = overshoots.count(_ > bound).toDouble / overshoots.size
    assert(violFrac <= 2 * math.exp(-4.0),
      s"fraction over the n*e/w bound $violFrac exceeds 2*e^-d")
  }

  test("streaming CMS grid (complete-mode state) drains to the batch answer") {
    val tmp = java.nio.file.Files.createTempDirectory("cmsstream").toString
    val feed = s"$tmp/feed"
    stream.repartition(3).write.parquet(feed) // 3 files -> 3 micro-batches
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("token",
        org.apache.spark.sql.types.StringType)))
    val streamed = graft.streaming.SketchStream.cmsHeavyHittersStreaming(
        spark, feed, schema, s"$tmp/out",
        items = df => df.select(col("token").as("item")),
        phi = 0.05, maxFilesPerTrigger = Some(1))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val batch = Freq.cmsHeavyHitters(stream, col("token"), phi = 0.05)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(streamed == batch)
    assert(streamed.nonEmpty)
  }

  test("streaming CMS readout never re-reads the feed (candidates ride the state)") {
    // the candidate vocabulary is maintained ALONGSIDE the grid inside
    // the one streaming aggregation, so the readout's input files must
    // all sit under the drained state dir — a feed file landing after
    // the drain can neither appear as a candidate nor be missing from
    // the grid (the decoupled-readout race is structural, not assumed
    // away by a static-feed contract)
    val tmp = java.nio.file.Files.createTempDirectory("cmsstate").toString
    val feed = s"$tmp/feed"
    stream.repartition(2).write.parquet(feed)
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("token",
        org.apache.spark.sql.types.StringType)))
    // capture the readout FRAME by re-deriving it the way the streaming
    // readout does: drain first, then rebuild the same join
    graft.streaming.SketchStream.cmsHeavyHittersStreaming(
      spark, feed, schema, s"$tmp/out",
      items = df => df.select(col("token").as("item")),
      phi = 0.05, maxFilesPerTrigger = Some(1))
    val drained = spark.read.parquet(s"$tmp/out/state")
    val readout = Freq.cmsHeavyHittersFromGrid(
      drained.filter(col("item").isNull).select("i", "bucket", "cnt"),
      drained.filter(col("item").isNotNull).select("item"),
      col("item"), 0.05)
    val files = readout.inputFiles
    assert(files.nonEmpty)
    assert(files.forall(_.contains("/out/state")),
      s"readout reads outside the drained state: ${files.filterNot(_.contains("/out/state")).take(3).toSeq}")
    assert(!files.exists(_.contains("/feed")), "readout re-reads the feed")
    // and the drained vocabulary IS the feed's distinct token set
    val vocab = drained.filter(col("item").isNotNull).select("item")
      .collect().map(_.getString(0)).toSet
    val expected = stream.select(col("token")).distinct()
      .collect().map(_.getString(0)).toSet
    assert(vocab == expected)
  }
}
