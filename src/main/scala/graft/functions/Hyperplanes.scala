package graft.functions

import java.security.MessageDigest

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native multi-table hyperplane LSH:
  * `graft_lsh_buckets(embedding, numTables, planesPerTable)` returns the
  * array of `numTables` bucket bit strings — table t's bucket is the sign
  * pattern of the projections onto planes [t·P, (t+1)·P).
  *
  * Plane component u(p, j) is md5-derived, uniform in [-0.5, 0.5) —
  * identical bytes to the driver-literal formulation in
  * [[graft.similarity.Similarity.hyperplaneBucket]] (kept as the
  * reference twin, equivalence-tested in SimilaritySpec) and to the SQL
  * oracle's `('0x'||substr(md5(p||':'||j),1,6))::BIGINT/16777216-0.5`.
  * Projections accumulate in double, ascending j — the same fold order
  * as the reference formulation, so sign decisions match bit for bit.
  *
  * Why native: the literal formulation inlines numTables·P·dim literal
  * multiply terms into the plan (24 planes × 64 dims ≈ 1.5k-node
  * expression tree) — analysis + codegen of that tree dominates the
  * whole query. Here the plan carries ONE call; the component matrix is
  * computed once per executor and cached by (planes, dim).
  */
case class LshBuckets(first: Expression, second: Expression,
                      third: Expression) extends TernaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (ArrayType(FloatType, _), IntegerType, IntegerType)
        if second.foldable && third.foldable =>
        (second.eval(), third.eval()) match {
          case (t: Int, p: Int) if t >= 1 && t <= 64 && p >= 1 && p <= 64 =>
            TypeCheckResult.TypeCheckSuccess
          case (t, p) => TypeCheckResult.TypeCheckFailure(
            s"graft_lsh_buckets: numTables and planesPerTable must be " +
              s"in 1..64, got ($t, $p)")
        }
      case _ => TypeCheckResult.TypeCheckFailure(
        s"graft_lsh_buckets expects (array<float>, int literal, int " +
          s"literal), got (${first.dataType.sql}, ${second.dataType.sql}, " +
          s"${third.dataType.sql})")
    }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_lsh_buckets"

  override def nullSafeEval(emb: Any, t: Any, p: Any): Any =
    HyperplaneOps.buckets(emb.asInstanceOf[ArrayData],
      t.asInstanceOf[Int], p.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (e, t, p) =>
      s"graft.functions.HyperplaneOps.buckets($e, $t, $p)")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object HyperplaneOps {
  // component matrix cache: (totalPlanes, dim) → [plane][dim] — one
  // md5-derivation per executor JVM, shared across rows and queries
  private val cache = TrieMap.empty[(Int, Int), Array[Array[Double]]]

  private def components(planes: Int, dim: Int): Array[Array[Double]] =
    cache.getOrElseUpdate((planes, dim), {
      val md = MessageDigest.getInstance("MD5")
      Array.tabulate(planes, dim) { (p, j) =>
        md.reset()
        val d = md.digest(s"$p:$j".getBytes("UTF-8"))
        // first 6 hex chars = top 3 bytes, as an unsigned 24-bit int
        val v = ((d(0) & 0xff) << 16) | ((d(1) & 0xff) << 8) | (d(2) & 0xff)
        v.toDouble / 16777216.0 - 0.5
      }
    })

  /** Called from generated code. */
  def buckets(emb: ArrayData, numTables: Int,
              planesPerTable: Int): ArrayData = {
    val dim = emb.numElements()
    val u = components(numTables * planesPerTable, dim)
    val out = new Array[AnyRef](numTables)
    var t = 0
    while (t < numTables) {
      val bits = new Array[Byte](planesPerTable)
      var i = 0
      while (i < planesPerTable) {
        val row = u(t * planesPerTable + i)
        var proj = 0.0
        var j = 0
        while (j < dim) {
          proj += emb.getFloat(j).toDouble * row(j)
          j += 1
        }
        bits(i) = if (proj >= 0) '1' else '0'
        i += 1
      }
      out(t) = UTF8String.fromBytes(bits)
      t += 1
    }
    new GenericArrayData(out)
  }
}
