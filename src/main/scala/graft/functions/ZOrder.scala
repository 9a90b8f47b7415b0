package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, LongType}

/** Z-order (Morton) curve key: `graft_zorder(x, y, bits)` interleaves the
  * low `bits` bits of two non-negative longs — x on even positions, y on
  * odd — into one long sort key. Sorting a table by this key co-locates
  * rows that are close in BOTH dimensions, so per-file/row-group min-max
  * stats become selective for predicates on either dimension alone: the
  * multi-dimensional data-layout trick (cf. Morton '66; used by Delta
  * OPTIMIZE ZORDER, Iceberg sort orders) that turns a 100 TB full scan
  * into a sqrt-fraction one for 2-D range queries.
  *
  * Values are clamped into the `bits` range by masking (callers bucket
  * real columns into [0, 2^bits) first). `bits` must be a foldable
  * literal in 1..31 so the interleaved key fits a positive long.
  */
case class ZOrderKey(first: Expression, second: Expression,
                     third: Expression) extends TernaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType) match {
      case (LongType, LongType) if third.dataType == IntegerType &&
          third.foldable => third.eval() match {
        case b: Int if b >= 1 && b <= 31 => TypeCheckResult.TypeCheckSuccess
        case b => TypeCheckResult.TypeCheckFailure(
          s"graft_zorder: bits must be in 1..31, got $b")
      }
      case _ => TypeCheckResult.TypeCheckFailure(
        "graft_zorder expects (bigint, bigint, int literal), got " +
          s"(${first.dataType.sql}, ${second.dataType.sql}, " +
          s"${third.dataType.sql})")
    }

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_zorder"

  override def nullSafeEval(x: Any, y: Any, b: Any): Any =
    ZOrderKey.interleave(x.asInstanceOf[Long], y.asInstanceOf[Long],
      b.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (x, y, b) =>
      s"graft.functions.ZOrderKey.interleave($x, $y, $b)")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object ZOrderKey {
  /** Called from generated code. Branch-free bit interleave. */
  def interleave(x: Long, y: Long, bits: Int): Long = {
    val mask = (1L << bits) - 1L
    val xm = x & mask
    val ym = y & mask
    var z = 0L
    var i = 0
    while (i < bits) {
      z |= ((xm >>> i) & 1L) << (2 * i)
      z |= ((ym >>> i) & 1L) << (2 * i + 1)
      i += 1
    }
    z
  }
}
