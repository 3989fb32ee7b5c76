package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.functions.TextFunctions.{fixMojibake, mojibakeCount, mojibakePairs}

/** Encoding-damage repair (q153): detection counts, repair fidelity,
  * idempotence on clean text, and the pair-table invariants the oracle
  * replay depends on.
  */
class MojibakeSpec extends SparkTestBase {
  import spark.implicits._

  test("pair table: patterns are mutually disjoint literals") {
    val bads = mojibakePairs.map(_._1)
    assert(bads.distinct.size == bads.size)
    for (a <- bads; b <- bads if a != b) {
      assert(!a.contains(b), s"'$b' occurs inside '$a' — counts would double")
    }
    // regex-literal safety: no Java/RE2 metacharacters
    assert(bads.forall(_.forall(c => !"\\^$.|?*+()[]{}".contains(c))))
  }

  test("every artifact repairs to its decoded character") {
    val df = mojibakePairs.zipWithIndex
      .map { case ((bad, good), i) => (i.toLong, s"x${bad}y", s"x${good}y") }
      .toDF("i", "dirty", "want")
    val out = df.select(col("i"), (fixMojibake(col("dirty")) === col("want")).as("ok"),
        mojibakeCount(col("dirty")).as("n")).collect()
    assert(out.forall(r => r.getBoolean(1) && r.getLong(2) == 1L))
  }

  test("clean text passes through unchanged with zero count") {
    val df = Seq("plain ascii", "déjà vu — already fixed ’quotes’").toDF("s")
    val out = df.select(
      (fixMojibake(col("s")) === col("s")).as("same"),
      mojibakeCount(col("s")).as("n")).collect()
    assert(out.forall(r => r.getBoolean(0) && r.getLong(1) == 0L))
  }

  test("documented limitation: adversarial nesting can recombine into a fresh artifact") {
    // 'â€' + the ''-terminated artifact: replacing the latter
    // with '”' synthesizes the em-dash artifact 'â€”' AFTER its rule
    // already ran — ONE pass leaves exactly one artifact behind (the
    // fixMojibake scaladoc's pinned contract; the oracle replays the
    // identical chain so parity holds even here), and a second pass
    // clears this instance.
    val nested = "â€" + mojibakePairs(3)._1
    val df = Seq(nested).toDF("s")
    val r = df.select(
      mojibakeCount(fixMojibake(col("s"))).as("after_one"),
      mojibakeCount(fixMojibake(fixMojibake(col("s")))).as("after_two")).collect()(0)
    assert(r.getLong(0) == 1L, "one pass must leave the recombined em-dash artifact")
    assert(r.getLong(1) == 0L)
  }

  test("repair is idempotent") {
    val dirty = s"caf${mojibakePairs(4)._1} don${mojibakePairs(0)._1}t"
    val df = Seq(dirty).toDF("s")
    val r = df.select(
      (fixMojibake(fixMojibake(col("s"))) === fixMojibake(col("s"))).as("idem"),
      mojibakeCount(fixMojibake(col("s"))).as("n_after")).collect()(0)
    assert(r.getBoolean(0) && r.getLong(1) == 0L)
  }
}
