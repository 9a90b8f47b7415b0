package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** zlib-deflated byte length of a string — the "gzip ratio" quality
  * signal: templated/spammy/boilerplate text compresses far below
  * natural prose, and near-random noise barely compresses at all, so
  * `deflate_len / n_bytes` separates both tails cheaply (cf. the
  * compression-ratio filters in web-corpus pipelines such as
  * RefinedWeb/Dolma; MassiveText's repetition rules target the same
  * phenomenon).
  *
  * Only the LENGTH is exposed, not the compressed bytes: the length is
  * the signal, and the payload would pin the engine to one zlib build.
  * Fixed level 6, default strategy, so values are deterministic within
  * a JVM. DuckDB has no deflate, so the query-level oracle checks
  * portable bounds (zlib's worst-case expansion; natural text
  * compresses) and the spec pins the discriminative behavior on planted
  * repetitive vs noise inputs.
  *
  * Scan-local and codegen'd; one [[java.util.zip.Deflater]] per thread,
  * `reset()` between rows (constructing one per row would thrash native
  * allocations).
  */
case class DeflateLen(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_deflate_len expects string, got ${child.dataType.sql}")

  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_deflate_len"

  override def nullSafeEval(input: Any): Any =
    DeflateLen.deflatedLen(input.asInstanceOf[UTF8String])

  // static helper named deflatedLen, NOT eval — see TriProducts.compute
  // for the forwarder-suppression trap
  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.DeflateLen.deflatedLen($c)")

  override protected def withNewChildInternal(
      newChild: Expression): Expression = copy(child = newChild)
}

object DeflateLen {
  private val local = new ThreadLocal[java.util.zip.Deflater] {
    override def initialValue(): java.util.zip.Deflater =
      new java.util.zip.Deflater(6)
  }
  private val sink = new ThreadLocal[Array[Byte]] {
    override def initialValue(): Array[Byte] = new Array[Byte](1 << 16)
  }

  /** Called from generated code. */
  def deflatedLen(s: UTF8String): Int = {
    val bytes = s.getBytes
    val d = local.get()
    d.reset()
    d.setInput(bytes)
    d.finish()
    var total = 0
    val buf = sink.get()
    while (!d.finished()) total += d.deflate(buf)
    total
  }
}
