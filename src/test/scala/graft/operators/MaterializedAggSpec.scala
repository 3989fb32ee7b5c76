package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class MaterializedAggSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val facts = Seq(
    ("a", 10.0, 1L), ("a", 20.0, 1L), ("b", 5.0, 1L),
    ("c", 7.5, 1L), ("a", 2.5, 1L), ("b", 0.0, 1L)
  ).toDF("k", "x", "one")

  private val measures = Map(
    "sx" -> col("x"),
    "n" -> lit(1L))

  private def state(df: org.apache.spark.sql.DataFrame) =
    MaterializedAgg.additiveState(df, Seq("k"), measures)

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.select("k", "sx", "n").collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSeq.sortBy(_._1)

  test("merge(state(corpus), state(delta)) == state(corpus ∪ delta)") {
    val corpus = facts.filter(col("x") > 4.0)
    val delta = facts.filter(col("x") <= 4.0)
    val merged = MaterializedAgg.mergeAdditive(state(corpus), state(delta), Seq("k"))
    assert(rows(merged) == rows(state(facts)))
  }

  test("groups only in the delta (and only in the corpus) both survive") {
    val corpus = facts.filter(col("k") =!= "c") // no 'c' in state
    val delta = facts.filter(col("k") === "c") // only 'c' in delta
    val merged = MaterializedAgg.mergeAdditive(state(corpus), state(delta), Seq("k"))
    assert(rows(merged) == rows(state(facts)))
  }

  test("retraction: a negated delta removes its contribution exactly") {
    val retract = MaterializedAgg.additiveState(
      facts.filter(col("k") === "a" && col("x") === 20.0)
        .withColumn("x", -col("x")),
      Seq("k"), Map("sx" -> col("x"), "n" -> lit(-1L)))
    val merged = MaterializedAgg.mergeAdditive(state(facts), retract, Seq("k"))
    val want = rows(state(facts.filter(!(col("k") === "a" && col("x") === 20.0))))
    assert(rows(merged) == want)
  }

  test("schema mismatch between state and delta fails loudly") {
    val bad = state(facts).withColumnRenamed("sx", "other")
    val e = intercept[IllegalArgumentException] {
      MaterializedAgg.mergeAdditive(state(facts), bad, Seq("k"))
    }
    assert(e.getMessage.contains("schema mismatch"))
  }

  test("merge shuffles aggregate rows, not facts (plan has no fact scan)") {
    val corpusState = state(facts.filter(col("x") > 4.0))
    // write + reread the state: the merge plan must read ONLY this tiny
    // parquet plus the delta's aggregation — no corpus fact source
    val dir = java.nio.file.Files.createTempDirectory("graft_mv").toString
    corpusState.write.mode("overwrite").parquet(dir)
    val merged = MaterializedAgg.mergeAdditive(
      spark.read.parquet(dir), state(facts.filter(col("x") <= 4.0)), Seq("k"))
    val leaves = merged.queryExecution.optimizedPlan.collectLeaves()
    val fileScans = leaves.collect {
      case r: org.apache.spark.sql.execution.datasources.LogicalRelation => r
    }
    assert(fileScans.length == 1,
      s"expected exactly ONE file source (the state parquet), got:\n$leaves")
    val loc = fileScans.head.relation
      .asInstanceOf[org.apache.spark.sql.execution.datasources.HadoopFsRelation]
      .location.rootPaths.mkString(",")
    assert(loc.contains("graft_mv"), s"the single file scan is not the MV state: $loc")
  }
}
