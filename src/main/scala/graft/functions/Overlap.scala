package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType}

/** Native sorted-set overlap: `graft_overlap(a, b)` = number of common
  * elements of two SORTED arrays (each with distinct elements), as one
  * allocation-free merge scan — the verify kernel of the set-similarity
  * join. `size(array_intersect(a, b))` computes the same number but builds
  * a hash set PER ROW; on a candidate-pair table (hundreds of thousands of
  * rows, each carrying two ~10²-element gram arrays) the per-row set
  * build dominates the whole dedup query. From the overlap c the full
  * Jaccard follows arithmetically: J = c / (|A| + |B| − c).
  *
  * Two element types: array<string> (raw sorted grams) and array<long>
  * (dictionary-encoded gram ids — 8 bytes/element instead of a ~20-char
  * UTF8String, so the candidate verify moves ~8× less data and compares
  * words, not byte strings).
  *
  * Precondition (callers': `ngramJaccardPairs` sorts with `array_sort`):
  * both arrays ascending in the element type's natural order — the order
  * `array_sort` produces. Unsorted input silently undercounts, which is
  * why the expression is paired with an equivalence spec against the
  * `array_intersect` formulation on the real pipeline.
  */
case class SortedOverlap(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), ArrayType(StringType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"graft_overlap expects matching (array<string>, array<string>) " +
          s"or (array<long>, array<long>), got " +
          s"(${left.dataType.sql}, ${right.dataType.sql})")
    }

  private lazy val isLongElems: Boolean = left.dataType match {
    case ArrayType(LongType, _) => true
    case _ => false
  }

  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_overlap"

  override def nullSafeEval(a: Any, b: Any): Any =
    if (isLongElems)
      OverlapOps.countLongs(a.asInstanceOf[ArrayData],
        b.asInstanceOf[ArrayData])
    else
      OverlapOps.count(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val m = if (isLongElems) "countLongs" else "count"
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.OverlapOps.$m($a, $b)")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object OverlapOps {
  /** Called from generated code: two-pointer merge count over sorted
    * arrays. Null elements (none are produced by the shingle pipeline)
    * sort LAST in Spark's `array_sort` — the merge stops at the first
    * null on either side (everything after it is null too), so a null
    * element can never reach the comparator. */
  def count(a: ArrayData, b: ArrayData): Int = {
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0
    var j = 0
    var c = 0
    while (i < na && j < nb && !a.isNullAt(i) && !b.isNullAt(j)) {
      val cmp = a.getUTF8String(i).compareTo(b.getUTF8String(j))
      if (cmp == 0) { c += 1; i += 1; j += 1 }
      else if (cmp < 0) i += 1
      else j += 1
    }
    c
  }

  /** Long-element variant (dictionary-encoded gram ids). */
  def countLongs(a: ArrayData, b: ArrayData): Int = {
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0
    var j = 0
    var c = 0
    while (i < na && j < nb && !a.isNullAt(i) && !b.isNullAt(j)) {
      val va = a.getLong(i)
      val vb = b.getLong(j)
      if (va == vb) { c += 1; i += 1; j += 1 }
      else if (va < vb) i += 1
      else j += 1
    }
    c
  }
}
