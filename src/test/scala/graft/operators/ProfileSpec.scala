package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class ProfileSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val df = Seq[(java.lang.Long, String)](
    (1L, "a"), (2L, "b"), (3L, null), (3L, "b"), (null, "z"))
    .toDF("id", "s")

  test("per-column stats: rows, nulls, exact distinct, min/max") {
    val got = Profile.profile(df, Seq("id", "s"))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(got.keySet == Set("id", "s"))
    val id = got("id")
    assert(id.getString(1) == "bigint")
    assert(id.getLong(2) == 5L && id.getLong(3) == 1L && id.getLong(4) == 3L)
    assert(id.getString(5) == "1" && id.getString(6) == "3")
    val s = got("s")
    assert(s.getString(1) == "string")
    assert(s.getLong(2) == 5L && s.getLong(3) == 1L && s.getLong(4) == 3L)
    assert(s.getString(5) == "a" && s.getString(6) == "z")
  }

  test("output is ordered by column name with the contract schema") {
    val out = Profile.profile(df, Seq("s", "id"))
    assert(out.columns.toSeq == Seq(
      "column", "dtype", "n_rows", "n_nulls", "n_distinct", "min_val", "max_val"))
    assert(out.select("column").as[String].collect().toSeq == Seq("id", "s"))
  }

  test("one aggregation pass: a single scan feeds the Expand") {
    val plan = Profile.profile(df, Seq("id", "s"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("Expand"), "distinct aggregates should fuse via Expand")
    assert("LocalTableScan".r.findAllIn(plan).size == 1,
      s"profile must scan the input exactly once:\n$plan")
  }

  test("unknown column is refused") {
    val e = intercept[IllegalArgumentException] {
      Profile.profile(df, Seq("nope"))
    }
    assert(e.getMessage.contains("no such column"))
  }
}
