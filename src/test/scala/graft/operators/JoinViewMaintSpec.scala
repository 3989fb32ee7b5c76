package graft.operators

import graft.SparkTestBase

/** [[JoinViewMaint.joinDelta]] — insert-only join-view delta algebra. */
class JoinViewMaintSpec extends SparkTestBase {
  import spark.implicits._

  // keys chosen so every quadrant pairs: old⋈old (k=1), old⋈Δ (k=2),
  // Δ⋈old (k=3), Δ⋈Δ (k=4), plus a key with no match at all (k=9)
  private val aOld = Seq((1L, "a1"), (2L, "a2"), (9L, "a9")).toDF("k", "av")
  private val aNew = Seq((3L, "a3"), (4L, "a4")).toDF("k", "av")
  private val bOld = Seq((1L, "b1"), (3L, "b3")).toDF("k", "bv")
  private val bNew = Seq((2L, "b2"), (4L, "b4"), (1L, "b1x")).toDF("k", "bv")

  private def rows(df: org.apache.spark.sql.DataFrame): Set[(Long, String, String)] =
    df.collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet

  test("old view + delta equals the from-scratch join (all quadrants exercised)") {
    val vOld = aOld.join(bOld, Seq("k"))
    val delta = JoinViewMaint.joinDelta(aOld, aNew, bOld, bNew, Seq("k"))
    val scratch = aOld.unionByName(aNew).join(bOld.unionByName(bNew), Seq("k"))
    assert(rows(vOld.unionByName(delta)) === rows(scratch))
    // each quadrant except old⋈old is present in the DELTA specifically
    val d = rows(delta)
    assert(d.contains((2L, "a2", "b2")), "old⋈Δ row missing")
    assert(d.contains((3L, "a3", "b3")), "Δ⋈old row missing")
    assert(d.contains((4L, "a4", "b4")), "Δ⋈Δ row missing")
    assert(d.contains((1L, "a1", "b1x")), "old⋈Δ second-match row missing")
    assert(!d.contains((1L, "a1", "b1")), "old⋈old row must stay out of the delta")
  }

  test("no duplicate rows: the two delta pieces are disjoint") {
    val delta = JoinViewMaint.joinDelta(aOld, aNew, bOld, bNew, Seq("k")).collect()
    assert(delta.length === delta.distinct.length)
  }

  test("empty deltas produce an empty view delta") {
    val none = aOld.limit(0)
    val noneB = bOld.limit(0)
    assert(JoinViewMaint.joinDelta(aOld, none, bOld, noneB, Seq("k")).count() === 0L)
  }

  test("non-key column collision fails fast") {
    val bBad = Seq((1L, "x")).toDF("k", "av")
    val ex = intercept[IllegalArgumentException] {
      JoinViewMaint.joinDelta(aOld, aNew, bBad, bBad, Seq("k"))
    }
    assert(ex.getMessage.contains("collide"))
  }
}
