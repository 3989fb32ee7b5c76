package graft.functions

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.functions.expr.TopKFunctions.boundedTopK

/** [[graft.functions.expr.BoundedTopK]] — the bounded top-k aggregate
  * must reproduce the `row_number` window formulation row-for-row
  * (including ties), survive the partial/merge/serialize path across
  * many partitions, and actually run as a partial-aggregated
  * ObjectHashAggregate (the scale property: the exchange carries capped
  * buffers, not scored rows).
  */
class TopKAggregateSpec extends SparkTestBase {
  import spark.implicits._

  // 4 groups x 500 entries with DUPLICATE scores (score = i % 7) so tie
  // ordering by id is exercised throughout, spread over many partitions
  private lazy val data = spark.range(0, 2000).repartition(16)
    .select((col("id") % 4).as("g"), col("id").as("entry"),
      (col("id") % 7).cast("double").as("score"))

  private def viaAggregate(k: Int) =
    data.groupBy("g")
      .agg(boundedTopK(col("score"), col("entry"), k).as("top"))
      .select(col("g"), posexplode(col("top")).as(Seq("pos", "e")))
      .select(col("g"), (col("pos") + 1).as("rank"),
        col("e.id").as("entry"), col("e.score").as("score"))
      .orderBy("g", "rank")
      .collect().map(_.toSeq).toSeq

  private def viaWindow(k: Int) = {
    val w = Window.partitionBy("g").orderBy(col("score").desc, col("entry"))
    data.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("g"), col("rank"), col("entry"), col("score"))
      .orderBy("g", "rank")
      .collect().map(_.toSeq).toSeq
  }

  test("aggregate == window formulation, ties included, across partial merges") {
    assert(viaAggregate(25) === viaWindow(25))
    assert(viaAggregate(1) === viaWindow(1))
  }

  test("k larger than the group emits the whole group, ranked") {
    val got = viaAggregate(10000)
    assert(got.size === 2000)
    assert(got === viaWindow(10000))
  }

  test("runs as partial-aggregated ObjectHashAggregate (capped buffers " +
      "cross the exchange, not scored rows)") {
    val plan = data.groupBy("g")
      .agg(boundedTopK(col("score"), col("entry"), 5).as("top"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"), plan)
    assert(plan.contains("partial_bounded_topk"), plan)
  }

  // string-ordered MIN-k sibling (the q75 sampling shape): md5-ranked,
  // so tie and lexicographic ordering must match the window byte-for-byte
  private lazy val strData = spark.range(0, 2000).repartition(16)
    .select((col("id") % 4).as("g"), col("id").as("entry"),
      md5(concat(col("id").cast("string"), lit(":s"))).as("sk"))

  private def strViaAggregate(k: Int) =
    strData.groupBy("g")
      .agg(graft.functions.expr.TopKFunctions.boundedMinKString(
        col("sk"), col("entry"), k).as("top"))
      .select(col("g"), posexplode(col("top")).as(Seq("pos", "e")))
      .select(col("g"), (col("pos") + 1).as("rk"),
        col("e.id").as("entry"), col("e.score").as("sk"))
      .orderBy("g", "rk")
      .collect().map(_.toSeq).toSeq

  private def strViaWindow(k: Int) = {
    val w = Window.partitionBy("g").orderBy(col("sk"), col("entry"))
    strData.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("g"), col("rk"), col("entry"), col("sk"))
      .orderBy("g", "rk")
      .collect().map(_.toSeq).toSeq
  }

  test("string MIN-k aggregate == string-ordered window, across partial merges") {
    assert(strViaAggregate(7) === strViaWindow(7))
    assert(strViaAggregate(1) === strViaWindow(1))
    assert(strViaAggregate(10000) === strViaWindow(10000))
  }
}
