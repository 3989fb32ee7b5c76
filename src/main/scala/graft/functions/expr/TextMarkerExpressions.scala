package graft.functions.expr

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass marker-set counting kernel for the text analyzers.
  *
  * The declarative form — one `filter(tokens, x -> array_contains(set, x))`
  * per marker set — runs as a CodegenFallback higher-order function:
  * interpreted per row, per language, re-walking the token array k times
  * with an O(|set|) linear probe per token. This kernel walks the tokens
  * ONCE, probing k hash sets per token, inside whole-stage codegen — the
  * difference between interpreted k·n·|set| and compiled n·k hash lookups
  * on the 100 TB text path. Counts are identical by construction (token
  * membership with multiplicity, UTF8String byte equality == Spark string
  * equality), so the DuckDB oracles keep matching.
  */
object MarkerOps {
  def counts(tokens: ArrayData, sets: Array[java.util.HashSet[UTF8String]]): ArrayData = {
    val out = new Array[Int](sets.length)
    val n = tokens.numElements()
    var i = 0
    while (i < n) {
      val t = tokens.getUTF8String(i)
      if (t != null) {
        var j = 0
        while (j < sets.length) {
          if (sets(j).contains(t)) out(j) += 1
          j += 1
        }
      }
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** marker_counts(tokens: array<string>) -> array<int>, one count per
  * marker set, aligned with `markerSets` order. The hash sets are built
  * once per (driver/executor) instance and ride the plan as a reference
  * object.
  */
case class MarkerCounts(child: Expression, markerSets: Seq[Seq[String]])
    extends UnaryExpression {

  @transient private lazy val sets: Array[java.util.HashSet[UTF8String]] =
    markerSets.map { ws =>
      val s = new java.util.HashSet[UTF8String](ws.size * 2)
      ws.foreach(w => s.add(UTF8String.fromString(w)))
      s
    }.toArray

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def nullSafeEval(v: Any): Any =
    MarkerOps.counts(v.asInstanceOf[ArrayData], sets)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("markerSets", sets, "java.util.HashSet[]")
    defineCodeGen(ctx, ev, c => s"graft.functions.expr.MarkerOps.counts($c, $ref)")
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  override def prettyName: String = "marker_counts"
}

object MarkerFunctions {
  def markerCounts(tokens: Column, markerSets: Seq[Seq[String]]): Column =
    GraftBridge.column(MarkerCounts(GraftBridge.expression(tokens), markerSets))
}
