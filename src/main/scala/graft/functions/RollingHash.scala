package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native polynomial rolling hash of a string (document fingerprint):
  * `h_i = (h_{i-1} * 31 + byte_i) mod 1_000_000_007`, h_0 = 0, over the
  * UTF-8 bytes.
  *
  * The classic Rabin-Karp / Karp-Rabin fingerprint — cheap, incremental,
  * and (unlike md5) oracle-reproducible with plain integer arithmetic:
  * DuckDB computes the identical value with
  * `list_reduce(list_prepend(0, codes), (a, c) -> (a*31 + c) %
  * 1000000007)`. For ASCII text the byte sequence equals the codepoint
  * sequence, which is what the oracle folds over.
  *
  * Codegen: a tight loop over the string's bytes — no per-character
  * expression overhead, stays inside whole-stage codegen.
  */
case class RollingHash(child: Expression) extends UnaryExpression {

  private val Mod = 1000000007L

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_rolling_hash expects string, got ${child.dataType.sql}")

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_rolling_hash"

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    var h = 0L
    var i = 0
    while (i < bytes.length) {
      h = (h * 31L + (bytes(i) & 0xff)) % Mod
      i += 1
    }
    h
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.RollingHash.hash($c)")

  override protected def withNewChildInternal(
      newChild: Expression): Expression = copy(child = newChild)
}

object RollingHash {
  /** Called from generated code. */
  def hash(s: UTF8String): Long = {
    val bytes = s.getBytes
    var h = 0L
    var i = 0
    while (i < bytes.length) {
      h = (h * 31L + (bytes(i) & 0xff)) % 1000000007L
      i += 1
    }
    h
  }
}
