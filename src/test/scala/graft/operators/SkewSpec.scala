package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class SkewSpec extends SparkTestBase {
  import spark.implicits._

  // 5k rows, ~80% on the hot key 0
  private lazy val left = (0 until 5000).map { i =>
    (if (i % 5 != 0) 0L else (i % 40).toLong, i.toLong)
  }.toDF("k", "payload")

  private lazy val right = (0 until 40).map(k => (k.toLong, s"label$k")).toDF("k", "label")

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.select("k", "payload", "label").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSeq.sorted

  test("salted join result is identical to the plain join") {
    val plain = rows(left.join(right, Seq("k")))
    assert(rows(Skew.saltedJoin(left, right, "k", salts = 8)) == plain)
    assert(rows(Skew.saltedJoin(left, right, "k", salts = 1)) == plain)
  }

  test("the join key actually includes the salt (work spreads across sub-keys)") {
    val salted = Skew.saltedJoin(left, right, "k", salts = 8)
    assert(salted.queryExecution.executedPlan.toString.contains("__salt"),
      "salt column missing from the physical join keys")
    // the hot key's rows really scatter: >1 distinct salt on key 0
    val l = left.withColumn("__salt",
      pmod(xxhash64(col("k"), monotonically_increasing_id()), lit(8L)).cast("int"))
    val nSalts = l.filter(col("k") === 0).select("__salt").distinct().count()
    assert(nSalts > 4, s"hot key only used $nSalts salts")
  }

  test("IDENTICAL hot rows still scatter (whole-row hashing alone would collapse them)") {
    // the q61 shape: a single-column left where every hot-key row is the
    // same row — a salt that is a pure function of the row's values puts
    // them all in one sub-key and the mitigation silently vanishes
    val dupLeft = (0 until 4000).map(_ => 0L).toDF("k")
    val dupRight = Seq((0L, "hot")).toDF("k", "label")
    val plain = dupLeft.join(dupRight, Seq("k")).collect().length
    assert(Skew.saltedJoin(dupLeft, dupRight, "k", salts = 8).collect().length == plain)
    val l = dupLeft.withColumn("__salt",
      pmod(xxhash64(col("k"), monotonically_increasing_id()), lit(8L)).cast("int"))
    val nSalts = l.select("__salt").distinct().count()
    assert(nSalts > 4, s"identical hot rows only used $nSalts salts")
  }

  test("left rows carrying unhashable columns (maps) still salt — only the key is hashed") {
    val mapLeft = left.withColumn("attrs", map(lit("a"), col("payload")))
    val plain = rows(left.join(right, Seq("k")))
    assert(rows(Skew.saltedJoin(mapLeft, right, "k", salts = 8)) == plain)
  }

  test("salting is deterministic across evaluations") {
    val a = Skew.saltedJoin(left, right, "k", salts = 8)
    assert(rows(a) == rows(a))
  }
}
