package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.Join

import graft.SparkTestBase

/** [[SnapshotDiff]] — row classification, the null/column-boundary
  * ambiguities the JSON digest exists for, and the shuffle-payload
  * contract (the join moves digests, not documents).
  */
class SnapshotDiffSpec extends SparkTestBase {
  import spark.implicits._

  private def statuses(df: DataFrame): Map[Long, String] =
    df.collect().map(r => r.getLong(0) -> r.getString(r.length - 1)).toMap

  test("classifies added / removed / changed; excludes unchanged by default") {
    val old = Seq((1L, "a", 10), (2L, "b", 20), (3L, "c", 30))
      .toDF("id", "text", "n")
    val nw = Seq((1L, "a", 10), (2L, "B", 20), (4L, "d", 40))
      .toDF("id", "text", "n")
    val got = statuses(SnapshotDiff.diff(old, nw, Seq("id")))
    assert(got === Map(2L -> "changed", 3L -> "removed", 4L -> "added"))
    val all = statuses(SnapshotDiff.diff(old, nw, Seq("id"), includeUnchanged = true))
    assert(all === got + (1L -> "unchanged"))
  }

  test("null handling: null->value is changed; null==null is unchanged") {
    val old = Seq((1L, Option.empty[String]), (2L, Option.empty[String]))
      .toDF("id", "text")
    val nw = Seq((1L, Option.empty[String]), (2L, Option("x")))
      .toDF("id", "text")
    val got = statuses(SnapshotDiff.diff(old, nw, Seq("id"), includeUnchanged = true))
    assert(got === Map(1L -> "unchanged", 2L -> "changed"))
  }

  test("digest ambiguities: value sliding or splitting across columns is changed") {
    // ("a", null) vs (null, "a") — a skip-null multi-arg hash collides
    val old = Seq((1L, Option("a"), Option.empty[String]), (2L, Option("ab"), Option("")))
      .toDF("id", "c1", "c2")
    val nw = Seq((1L, Option.empty[String], Option("a")), (2L, Option("a"), Option("b")))
      .toDF("id", "c1", "c2")
    val got = statuses(SnapshotDiff.diff(old, nw, Seq("id")))
    assert(got === Map(1L -> "changed", 2L -> "changed"))
  }

  test("composite keys and explicit compareCols (ignored column does not flag)") {
    val old = Seq(("s1", 1L, "a", "noise-x"), ("s1", 2L, "b", "noise-y"))
      .toDF("src", "id", "text", "scratch")
    val nw = Seq(("s1", 1L, "a", "noise-z"), ("s1", 2L, "B", "noise-y"))
      .toDF("src", "id", "text", "scratch")
    val got = SnapshotDiff.diff(old, nw, Seq("src", "id"), compareCols = Seq("text"))
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getString(2)).toMap
    assert(got === Map(("s1", 2L) -> "changed"))
  }

  test("shuffle payload: the join's inputs carry digests only, not compared columns") {
    val old = Seq((1L, "payload-a"), (2L, "payload-b")).toDF("id", "text")
    val nw = Seq((1L, "payload-a"), (3L, "payload-c")).toDF("id", "text")
    val joins = SnapshotDiff.diff(old, nw, Seq("id"))
      .queryExecution.optimizedPlan.collect { case j: Join => j }
    assert(joins.nonEmpty)
    joins.foreach { j =>
      val joined = j.children.flatMap(_.output.map(_.name))
      assert(!joined.contains("text"),
        s"compared column crossed the exchange: ${joined.mkString(",")}")
    }
  }
}
