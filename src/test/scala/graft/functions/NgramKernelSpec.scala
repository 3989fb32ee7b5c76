package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.functions.TextFunctions._
import graft.functions.expr.NgramFunctions.ngramStructs

/** The compiled n-gram tuple kernel ([[graft.functions.expr
  * .NgramStructs]]) must be row-identical to the declarative
  * higher-order-function reference it replaced on the LM hot path
  * (blank filter + BOS-padded windowing fused into one pass) — on edge
  * cases, on every order the engine builds (2/3/4), and on the real
  * documents table.
  */
class NgramKernelSpec extends SparkTestBase {
  import spark.implicits._

  /** The interpreted declarative form: filter blanks, then the indexed
    * transform packing each position's BOS-padded predecessors.
    */
  private def reference(c: org.apache.spark.sql.Column, order: Int,
      names: Seq[String]): org.apache.spark.sql.Column = {
    val ts = filter(tokens(c), t => t =!= "")
    transform(ts, (t, i) => struct(
      (names.init.zipWithIndex.map { case (name, j) =>
        val back = order - 1 - j
        when(i >= back, ts.getItem(i - back)).otherwise(lit("")).as(name)
      } :+ t.as(names.last)): _*))
  }

  private val namesOf = Map(
    2 -> Seq("prev", "cur"),
    3 -> Seq("p2", "p1", "cur"),
    4 -> Seq("p3", "p2", "p1", "cur"))

  test("kernel equals declarative reference on edge cases, orders 2/3/4") {
    val texts = Seq(
      "", "   ", "one", "one two", "a b c", "a b c d e",
      "The  Quick   brown FOX jumps", // normalization folds case/space
      "x " * 300 + "tail")
    val df = texts.toDF("t")
    namesOf.foreach { case (order, names) =>
      val rows = df.select(
        ngramStructs(tokens($"t"), order, names).as("kernel"),
        reference($"t", order, names).as("ref")).collect()
      rows.zip(texts).foreach { case (r, t) =>
        assert(r.get(0) == r.get(1), s"order $order mismatch for '$t'")
      }
    }
  }

  test("null and empty tokens drop BEFORE windowing (parity with the " +
      "filter the declarative form applies)") {
    val arr = array(lit("a"), lit(null).cast("string"), lit(""),
      lit("b"), lit("c"))
    val out = Seq(1).toDF("i")
      .select(explode(ngramStructs(arr, 3, namesOf(3))).as("g"))
      .select("g.p2", "g.p1", "g.cur").as[(String, String, String)]
      .collect().toSeq
    assert(out == Seq(("", "", "a"), ("", "a", "b"), ("a", "b", "c")))
  }

  test("null input array yields null (explode drops the document), " +
      "exactly like the declarative chain") {
    val df = Seq(Tuple1(null: String)).toDF("t")
    assert(df.select(explode(ngramStructs(tokens($"t"), 2, namesOf(2))))
      .count() == 0L)
    assert(df.select(explode(reference($"t", 2, namesOf(2)))).count() == 0L)
  }

  test("kernel equals declarative reference on the documents table") {
    val sfDir = "/root/testdata/sf0.001"
    assume(new java.io.File(s"$sfDir/documents.parquet").exists())
    namesOf.foreach { case (order, names) =>
      val mism = spark.read.parquet(s"$sfDir/documents.parquet")
        .select(ngramStructs(tokens(col("text")), order, names).as("kernel"),
          reference(col("text"), order, names).as("ref"))
        .filter(not(col("kernel") === col("ref")))
        .count()
      assert(mism == 0L, s"order $order diverges on real documents")
    }
  }

  test("the kernel stays inside whole-stage codegen (no CodegenFallback " +
      "on the LM hot path — the reason it exists)") {
    // spark.range survives ConvertToLocalRelation (the HashExpressionsSpec
    // pattern); assert on the WholeStageCodegenExec node itself, not on
    // toString formatting.
    val df = spark.range(4)
      .select(concat_ws(" ", lit("a"), $"id".cast("string"), lit("b c")).as("t"))
      .select(explode(ngramStructs(tokens($"t"), 3, namesOf(3))).as("g"))
    val stages = df.queryExecution.executedPlan.collect {
      case w: org.apache.spark.sql.execution.WholeStageCodegenExec => w
    }
    assert(stages.nonEmpty,
      s"no codegen stage in:\n${df.queryExecution.executedPlan}")
    assert(stages.exists(_.toString.contains("ngram_structs")),
      "ngram_structs not inside the codegen stage")
    assert(df.count() == 16L)
  }
}
