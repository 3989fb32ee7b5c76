package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class QuantileSketchSpec extends SparkTestBase {
  import spark.implicits._

  private val k = 64
  private val ps = Seq("p50" -> 50, "p90" -> 90, "p99" -> 99)

  // one group, 5000 distinct values 1..5000 (true quantiles known exactly)
  private lazy val big = (1 to 5000).map(v => ("g", v.toLong, v.toLong))
    .toDF("g", "id", "v")

  test("sketch of a union == merged per-part sketches (bottom-k merge law)") {
    val a = big.filter(col("id") % 2 === 0)
    val b = big.filter(col("id") % 2 =!= 0)
    def smp(df: org.apache.spark.sql.DataFrame) =
      QuantileSketch.sample(df, Seq("g"), "id", "v", k, "s")
        .select(col("n"), explode(col("smp")).as("e"))
        .select(col("n"), col("e.score").as("score"), col("e.id").as("v"))
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val whole = smp(big)
    val partA = smp(a)
    val partB = smp(b)
    // merge = union the samples, keep the k smallest (score, value)
    val merged = (partA ++ partB).map { case (_, s, v) => (s, v) }
      .sorted.take(k)
    assert(whole.map { case (_, s, v) => (s, v) }.sorted.toSeq == merged.toSeq)
    // exact counts add
    assert(whole.head._1 == partA.head._1 + partB.head._1)
  }

  test("estimates' true CDF positions stay within the sampling error bound") {
    val out = QuantileSketch.byGroup(big, Seq("g"), "id", "v", k, "s", ps)
      .collect().head
    assert(out.getAs[Long]("n") == 5000L && out.getAs[Long]("sample_n") == k.toLong)
    for ((name, p) <- ps) {
      val est = out.getAs[Long](name)
      val cdf = est.toDouble / 5000.0 // values are 1..5000, so cdf(v) = v/n
      assert(math.abs(cdf - p / 100.0) <= 0.15,
        s"$name estimate $est has cdf $cdf, expected ~${p / 100.0}")
    }
  }

  test("n <= k degenerates to the exact order statistic") {
    val small = (1 to 40).map(v => ("g", v.toLong, v.toLong)).toDF("g", "id", "v")
    val out = QuantileSketch.byGroup(small, Seq("g"), "id", "v", k, "s", ps)
      .collect().head
    assert(out.getAs[Long]("sample_n") == 40L)
    // ceil-rank order statistics over the COMPLETE value set
    assert(out.getAs[Long]("p50") == 20L) // ceil(0.5*40)
    assert(out.getAs[Long]("p90") == 36L)
    assert(out.getAs[Long]("p99") == 40L)
  }

  test("streaming drain (complete-mode state) == single-shot batch sketch") {
    val tmp = java.nio.file.Files.createTempDirectory("qsketch").toString
    val feed = s"$tmp/feed"
    // 3 files -> 3 micro-batches under maxFilesPerTrigger=1
    big.repartition(3).write.parquet(feed)
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("g", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("v", org.apache.spark.sql.types.LongType)))
    val streamed = graft.streaming.SketchStream.quantileSketchStreaming(
        spark, feed, schema, s"$tmp/out", Seq("g"), "id", "v", k, "s", ps,
        maxFilesPerTrigger = Some(1))
      .collect().head.toSeq
    val batch = QuantileSketch.byGroup(big, Seq("g"), "id", "v", k, "s", ps)
      .collect().head.toSeq
    assert(streamed == batch)
  }

  test("all-null group yields null quantiles, not an ANSI element_at(0) error") {
    // a group whose every value is null produces an EMPTY bottom-k sample
    // (sample_n = 0); the rank pick must guard to null instead of
    // evaluating element_at(vals, 0) — a runtime error under ANSI mode
    val nulls = Seq(("g", 1L, Option.empty[Long]), ("g", 2L, Option.empty[Long]))
      .toDF("g", "id", "v")
    val out = QuantileSketch.byGroup(nulls, Seq("g"), "id", "v", k, "s", ps)
      .collect().head
    assert(out.getAs[Long]("n") == 2L && out.getAs[Long]("sample_n") == 0L)
    for ((name, _) <- ps) assert(out.isNullAt(out.fieldIndex(name)))
  }

  test("sample is partitioning-invariant and ranks through the bounded MIN-k partial") {
    val plan = QuantileSketch.sample(big, Seq("g"), "id", "v", k, "s")
      .queryExecution.executedPlan.toString
    assert(plan.contains("partial_bounded_mink_str"),
      "expected map-side bounded MIN-k truncation in the sketch plan")
    val p1 = QuantileSketch.byGroup(big.repartition(1), Seq("g"), "id", "v", k, "s", ps)
      .collect().head.toSeq
    val p16 = QuantileSketch.byGroup(big.repartition(16), Seq("g"), "id", "v", k, "s", ps)
      .collect().head.toSeq
    assert(p1 == p16)
  }
}
