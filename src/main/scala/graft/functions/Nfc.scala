package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization (UAX #15 canonical composition) — the first
  * step of any web-text cleaning pass: scraped corpora mix composed and
  * decomposed accent forms ("é" vs "e"+U+0301), which breaks exact dedup,
  * shingling, and tokenizer merges unless every document is canonicalized
  * first. Spark has no built-in for this; the JDK's `java.text.Normalizer`
  * implements the same Unicode algorithm DuckDB's `nfc_normalize`
  * (utf8proc) does, so results are oracle-comparable cross-engine.
  *
  * Scan-local and codegen'd: the fast path asks `isNormalized` first —
  * for the overwhelmingly-ASCII bulk of a corpus that is a single table
  * lookup per char and allocates nothing.
  */
case class Nfc(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_nfc expects string, got ${child.dataType.sql}")

  override def dataType: DataType = StringType
  override def prettyName: String = "graft_nfc"

  override def nullSafeEval(input: Any): Any =
    Nfc.normalize(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Nfc.normalize($c)")

  override protected def withNewChildInternal(
      newChild: Expression): Expression = copy(child = newChild)
}

object Nfc {
  /** Called from generated code. */
  def normalize(s: UTF8String): UTF8String = {
    val str = s.toString
    if (Normalizer.isNormalized(str, Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      Normalizer.normalize(str, Normalizer.Form.NFC))
  }
}
