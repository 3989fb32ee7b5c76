package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.functions.expr.DistinctMinKFunctions

class KmvSpec extends SparkTestBase {
  import spark.implicits._

  test("distinctMinK == sorted-distinct-take-k reference; duplicates collapse; partition-invariant") {
    val values = (0 until 500).map(i => f"v${(i * 37) % 200}%04d") // 200 distinct, heavy dups
    val expected = values.distinct.sorted.take(16)
    Seq(1, 16).foreach { parts =>
      val got = values.toDF("v").repartition(parts)
        .agg(DistinctMinKFunctions.distinctMinK(col("v"), 16).as("sk"))
        .head().getSeq[String](0).toSeq
      assert(got == expected, s"parts=$parts")
    }
  }

  test("distinctMinK partial truncation: per-group state never exceeds k entries") {
    // grouped: each group's sample is its own distinct bottom-k
    val df = (0 until 300).map(i => (i % 3, f"x$i%03d")).toDF("g", "v")
    val got = df.groupBy("g")
      .agg(DistinctMinKFunctions.distinctMinK(col("v"), 5).as("sk"))
      .collect().map(r => r.getInt(0) -> r.getSeq[String](1).toSeq).toMap
    (0 until 3).foreach { g =>
      val exp = (0 until 300).filter(_ % 3 == g).map(i => f"x$i%03d").distinct.sorted.take(5)
      assert(got(g) == exp)
    }
  }

  test("sketch is exact below k: estimate equals the true distinct count") {
    val df = (0 until 40).map(i => ("a", s"tok${i % 25}")).toDF("g", "v")
    val est = Kmv.distinctEstimate(
        Kmv.sketch(df, Seq("g"), "v", k = 64, salt = "t"), k = 64)
      .head()
    assert(est.getAs[Long]("sample_n") == 25L)
    assert(est.getAs[Long]("est_distinct") == 25L)
  }

  test("threshold estimator lands near the truth at n >> k") {
    val df = (0 until 20000).map(i => ("a", s"val$i")).toDF("g", "v")
    val est = Kmv.distinctEstimate(
        Kmv.sketch(df, Seq("g"), "v", k = 64, salt = "t"), k = 64)
      .head().getAs[Long]("est_distinct")
    // KMV relative error ~ 1/sqrt(k-2) ~ 13%; allow 3 sigma
    assert(est > 12000 && est < 28000, s"estimate $est far from 20000")
  }

  test("streaming drain == batch sketch over a 3-batch feed (pure set function)") {
    val dir = java.nio.file.Files.createTempDirectory("kmv-stream").toString
    val rows = (0 until 900).map(i => (s"g${i % 2}", s"tok${i % 300}"))
    val df = rows.toDF("g", "v")
    df.repartition(3).write.parquet(s"$dir/feed")
    val schema = df.schema
    val streamed = graft.streaming.SketchStream.kmvDistinctStreaming(
        spark, s"$dir/feed", schema, s"$dir/out",
        groupCols = Seq("g"), valueCol = "v", k = 16, salt = "t",
        maxFilesPerTrigger = Some(1))
      .select("g", "sample_n", "est_distinct")
      .orderBy("g").collect().toSeq
    val batch = Kmv.distinctEstimate(
        Kmv.sketch(df, Seq("g"), "v", k = 16, salt = "t"), k = 16)
      .select("g", "sample_n", "est_distinct")
      .orderBy("g").collect().toSeq
    assert(streamed == batch)
  }

  test("streaming drain over an EMPTY feed returns an empty sketch, not a throw") {
    // an empty feed dir fires zero AvailableNow batches, so foreachBatch
    // never writes the state path — the readback must degrade to the
    // empty sketch (zero groups), not an AnalysisException
    val dir = java.nio.file.Files.createTempDirectory("kmv-empty").toString
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$dir/feed"))
    val schema = Seq(("g", "v")).toDF("g", "v").schema
    val out = graft.streaming.SketchStream.kmvDistinctStreaming(
      spark, s"$dir/feed", schema, s"$dir/out",
      groupCols = Seq("g"), valueCol = "v", k = 16, salt = "t")
    assert(out.count() == 0L)
  }

  test("jaccard estimate tracks true overlap and is exact for identical groups") {
    val shared = (0 until 3000).map(i => s"s$i")
    val aOnly = (0 until 1000).map(i => s"a$i")
    val bOnly = (0 until 1000).map(i => s"b$i")
    val rows = shared.flatMap(v => Seq(("a", v), ("b", v))) ++
      aOnly.map(("a", _)) ++ bOnly.map(("b", _)) ++
      shared.map(("c", _)) ++ aOnly.map(("c", _)) // c == a exactly
    val sk = Kmv.sketch(rows.toDF("g", "v"), Seq("g"), "v", k = 64, salt = "t")
    val j = Kmv.jaccardBetweenGroups(sk, "g", k = 64)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getAs[Double]("jaccard_est")).toMap
    // true J(a,b) = 3000/5000 = 0.6; sigma ~ sqrt(0.6*0.4/64) ~ 0.06
    val jab = j(("a", "b"))
    assert(jab > 0.4 && jab < 0.8, s"J(a,b)=$jab far from 0.6")
    // identical value sets -> identical sketches -> J estimate exactly 1
    assert(j(("a", "c")) == 1.0)
  }
}
