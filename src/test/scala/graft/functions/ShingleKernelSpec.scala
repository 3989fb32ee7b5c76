package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.functions.TextFunctions._

/** The compiled shingle kernel must be element- and order-identical to
  * the declarative reference (`array_distinct` over the HOF n-gram form)
  * — both emit space-joined n-grams in first-occurrence order — on edge
  * cases and on the real documents table.
  */
class ShingleKernelSpec extends SparkTestBase {
  import spark.implicits._

  private def reference(c: org.apache.spark.sql.Column, n: Int) =
    array_distinct(wordShingles(c, n))

  test("kernel equals declarative reference on edge cases") {
    val texts = Seq(
      "", "   ", "one", "one two", "a b c", "a b c d e",
      "rep rep rep rep",                  // duplicate shingles collapse
      "The  Quick   brown FOX  the quick brown fox", // normalization + dup
      "x " * 200 + "tail")
    val df = texts.toDF("t")
    val rows = df.select(
      shingleSet($"t", 3).as("kernel"),
      reference($"t", 3).as("ref")).collect()
    rows.zip(texts).foreach { case (r, t) =>
      assert(r.getSeq[String](0) == r.getSeq[String](1),
        s"mismatch for input '$t'")
    }
  }

  test("kernel equals declarative reference on the documents table") {
    val sfDir = "/root/testdata/sf0.001"
    assume(new java.io.File(s"$sfDir/documents.parquet").exists())
    val mism = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(shingleSet(col("text"), 3).as("kernel"),
        reference(col("text"), 3).as("ref"))
      .filter(not(col("kernel") === col("ref")))
      .count()
    assert(mism == 0L)
  }

  test("kernel skips windows containing null tokens (containsNull=false output)") {
    // split() never produces null tokens, but the kernel's declared output
    // type is array<string> containsNull=false — a null token reaching
    // UTF8String.concat would plant a null element in it
    val out = Seq(1).toDF("i")
      .select(graft.functions.expr.ShingleFunctions.shingleSet(
        array(lit("a"), lit(null).cast("string"), lit("b"), lit("c"), lit("d")), 2))
      .collect()(0).getSeq[String](0)
    assert(out == Seq("b c", "c d"))
  }

  test("kernel for n=1 yields distinct tokens") {
    val out = Seq("b a b c a").toDF("t")
      .select(shingleSet($"t", 1)).collect()(0).getSeq[String](0)
    assert(out == Seq("b", "a", "c"))
  }
}
