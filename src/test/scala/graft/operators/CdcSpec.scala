package graft.operators

import java.sql.Timestamp

import graft.SparkTestBase

/** [[Cdc.applyLog]] — last-writer-wins type-1 merge with deletes. */
class CdcSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(m: Int) = new Timestamp(m * 60000L)

  private val snapshot = Seq(
    (1L, "a"), (2L, "b"), (3L, "c"), (4L, "d")).toDF("k", "v")

  private def applied(log: Seq[(Long, String, String, Timestamp, Long)]) =
    Cdc.applyLog(snapshot, log.toDF("k", "op", "v", "ts", "seq"),
        keyCols = Seq("k"), orderCols = Seq("ts", "seq"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap

  test("latest op wins: upsert-then-delete deletes, delete-then-upsert resurrects") {
    val got = applied(Seq(
      (1L, "U", "a2", ts(1), 1L), (1L, "D", "a2", ts(2), 2L),
      (2L, "D", "b", ts(1), 3L), (2L, "U", "b2", ts(2), 4L)))
    assert(got === Map(2L -> "b2", 3L -> "c", 4L -> "d"))
  }

  test("exact-timestamp tie breaks on the sequence column") {
    val got = applied(Seq(
      (3L, "U", "first", ts(5), 10L), (3L, "U", "second", ts(5), 11L)))
    assert(got(3L) === "second")
  }

  test("inserts land, untouched keys pass through, snapshot schema preserved") {
    val out = Cdc.applyLog(snapshot,
      Seq((9L, "U", "new", ts(1), 1L)).toDF("k", "op", "v", "ts", "seq"),
      keyCols = Seq("k"), orderCols = Seq("ts", "seq"))
    assert(out.columns.toSeq === Seq("k", "v"))
    assert(out.collect().map(r => r.getLong(0) -> r.getString(1)).toMap ===
      Map(1L -> "a", 2L -> "b", 3L -> "c", 4L -> "d", 9L -> "new"))
  }

  test("delete of a key the snapshot lacks is a no-op") {
    val got = applied(Seq((42L, "D", "x", ts(1), 1L)))
    assert(got === Map(1L -> "a", 2L -> "b", 3L -> "c", 4L -> "d"))
  }

  test("unknown op fails fast") {
    val ex = intercept[Exception] {
      applied(Seq((1L, "Z", "x", ts(1), 1L)))
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(ex).exists(_.contains("Cdc")))
  }
}
