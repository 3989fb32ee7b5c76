package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class ExactPercentilesSpec extends SparkTestBase {
  import spark.implicits._

  test("nulls are ignored, matching percentile/QUANTILE_CONT semantics") {
    val df = Seq(Option(10L), None, Option(20L), None).toDF("v")
      .withColumn("g", lit("a"))
    val r = ExactPercentiles.byGroup(df, Seq("g"), "v", Seq("p50" -> 0.5)).head()
    assert(r.getAs[Double]("p50") == 15.0, s"got $r")
    assert(r.getAs[Long]("n_v") == 2L)
    assert(r.getAs[Long]("max_v") == 20L)
  }

  test("a group whose values are all null is kept, with null percentiles and n = 0") {
    val df = Seq(("a", Option(10L)), ("a", Option(30L)), ("b", None), ("b", None))
      .toDF("g", "v")
    val rows = ExactPercentiles.byGroup(df, Seq("g"), "v", Seq("p50" -> 0.5))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(rows.keySet == Set("a", "b"))
    assert(rows("a").getAs[Double]("p50") == 20.0)
    assert(rows("b").isNullAt(rows("b").fieldIndex("p50")))
    assert(rows("b").isNullAt(rows("b").fieldIndex("max_v")))
    assert(rows("b").getAs[Long]("n_v") == 0L)
    // and the same frame matches Spark's own aggregate group-for-group
    val ref = df.groupBy("g").agg(expr("percentile(v, 0.5)").as("p"))
      .collect().map(r => r.getString(0) -> Option(r.get(1))).toMap
    assert(ref("b").isEmpty && ref("a").contains(20.0))
  }

  test("matches Spark's exact percentile aggregate on random grouped data") {
    val rnd = new scala.util.Random(3L)
    val df = (0 until 3000).map { _ =>
      (s"g${rnd.nextInt(5)}", rnd.nextInt(200).toLong)
    }.toDF("g", "v")
    val ps = Seq("p25" -> 0.25, "p50" -> 0.5, "p95" -> 0.95)
    val ours = ExactPercentiles.byGroup(df, Seq("g"), "v", ps)
      .collect().map(r => r.getString(0) ->
        ps.map { case (nm, _) => r.getAs[Double](nm) }).toMap
    val ref = df.groupBy("g").agg(
        round(expr("percentile(v, 0.25)"), 6).as("p25"),
        round(expr("percentile(v, 0.5)"), 6).as("p50"),
        round(expr("percentile(v, 0.95)"), 6).as("p95"))
      .collect().map(r => r.getString(0) ->
        ps.map { case (nm, _) => r.getAs[Double](nm) }).toMap
    assert(ours == ref)
  }
}
