package graft.functions.expr

import java.text.Normalizer

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization — multilingual corpora mix composed and
  * decomposed forms of the same grapheme ("é" as U+00E9 vs
  * "e"+U+0301), which breaks exact dedup, fingerprints, and token
  * equality unless canonicalized first. Spark has no normalization
  * built-in; this is a compiled kernel over `java.text.Normalizer`
  * (the JDK's Unicode implementation — the same canonical composition
  * DuckDB's NFC_NORMALIZE performs, which is what makes it
  * oracle-checkable). The `isNormalized` quick-check makes the common
  * already-NFC (e.g. pure-ASCII) case an allocation-free pass-through.
  */
object NormalizeOps {
  def nfc(s: UTF8String): UTF8String = {
    val str = s.toString
    if (Normalizer.isNormalized(str, Normalizer.Form.NFC)) s
    else UTF8String.fromString(Normalizer.normalize(str, Normalizer.Form.NFC))
  }
}

/** nfc_normalize(str) -> str in Unicode Normalization Form C. */
case class NfcNormalize(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def nullSafeEval(v: Any): Any =
    NormalizeOps.nfc(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.expr.NormalizeOps.nfc($c)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  override def prettyName: String = "nfc_normalize"
}

object NormalizeFunctions {
  def nfcNormalize(c: Column): Column =
    GraftBridge.column(NfcNormalize(GraftBridge.expression(c)))
}
