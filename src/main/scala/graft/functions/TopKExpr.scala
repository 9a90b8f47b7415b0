package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Mutable best-first top-k buffer: parallel primitive arrays, capacity
  * k — no boxing, no per-candidate allocation on the update path. */
final class TopKState(val scores: Array[Double], val ids: Array[Long],
                      var n: Int)

/** Native per-group top-k aggregate — `graft_topk(score, id, k)` — the
  * (b)-rung Catalyst form of [[TopKAgg]]: same bounded mergeable
  * semantics (keep the k best (score, id) pairs, score desc / id asc,
  * exact double comparisons), as a `TypedImperativeAggregate` instead
  * of a `udaf`-wrapped `Aggregator`. The Aggregator pays a Kryo
  * round-trip per partial-merge boundary and a Scala case-class
  * allocation per input row; this updates primitive arrays in place
  * and serializes to a length-prefixed byte buffer, which is what
  * makes the per-candidate cost a handful of comparisons at the
  * 10⁸-candidate volumes the kNN-graph join produces. Equivalence to
  * the Aggregator AND the row_number window is spec-pinned
  * (TopKAggSpec) — swapping it in cannot change any oracle result bit.
  *
  * Deployment note: in the many-small-groups regime (corpus-as-query-
  * set, one k-row buffer per query) raise
  * `spark.sql.objectHashAggregate.sortBased.fallbackThreshold` well
  * past its 128-group default — the fallback re-SORTS the candidate
  * blow-up and erases the bounded aggregate's advantage (isolated
  * probe at 40M candidates / 100k groups: ~4 s hashing vs ~22 s
  * sort-fallback ≈ the row_number window). Buffers are k·16 bytes, so
  * even a million hashed groups is tens of MB per partition.
  *
  * Returns `array<struct<score:double, id:bigint>>` best-first; NULL
  * score or id inputs are skipped (the cosine NULL convention: a
  * zero-norm side must not rank).
  */
case class TopKExpr(scoreChild: Expression, idChild: Expression,
                    kChild: Expression,
                    mutableAggBufferOffset: Int = 0,
                    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKState] {

  private lazy val k: Int = kChild.eval().asInstanceOf[Number].intValue()

  override def children: Seq[Expression] =
    Seq(scoreChild, idChild, kChild)

  override def checkInputDataTypes(): TypeCheckResult = {
    if (scoreChild.dataType != DoubleType)
      TypeCheckResult.TypeCheckFailure(
        s"graft_topk score must be DOUBLE, got ${scoreChild.dataType.sql}")
    else if (idChild.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"graft_topk id must be BIGINT, got ${idChild.dataType.sql}")
    else if (!kChild.foldable || kChild.dataType != IntegerType)
      TypeCheckResult.TypeCheckFailure(
        "graft_topk k must be a foldable INT literal")
    else if (kChild.eval() == null ||
      kChild.eval().asInstanceOf[Number].intValue() < 1)
      TypeCheckResult.TypeCheckFailure("graft_topk k must be >= 1")
    else TypeCheckResult.TypeCheckSuccess
  }

  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("score", DoubleType, nullable = false),
    StructField("id", LongType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "graft_topk"

  override def createAggregationBuffer(): TopKState =
    new TopKState(new Array[Double](k), new Array[Long](k), 0)

  /** true iff (s1, i1) ranks strictly better than (s2, i2) — the shared
    * (score desc, id asc) ANN ordering under Spark's DOUBLE semantics:
    * NaN ranks above every value and equal to itself, -0.0 == 0.0. A
    * raw `>` would make a NaN score never rank, silently breaking the
    * spec-pinned `native ≡ row_number window` equivalence for NaN
    * inputs — unreachable via the engine's null-guarded cosine, but
    * graft_topk is a general registered SQL function.
    * (`java.lang.Double.compare` alone would also be wrong: it orders
    * -0.0 < 0.0, which Spark's comparisons treat as equal.) */
  private def beats(s1: Double, i1: Long, s2: Double, i2: Long): Boolean = {
    val n1 = java.lang.Double.isNaN(s1)
    val n2 = java.lang.Double.isNaN(s2)
    if (n1 || n2) (n1 && !n2) || (n1 == n2 && i1 < i2)
    else s1 > s2 || (s1 == s2 && i1 < i2)
  }

  private def insert(b: TopKState, score: Double, id: Long): Unit = {
    if (b.n < k || beats(score, id, b.scores(b.n - 1), b.ids(b.n - 1))) {
      var pos = math.min(b.n, k - 1)
      while (pos > 0 && beats(score, id, b.scores(pos - 1), b.ids(pos - 1)))
        pos -= 1
      var i = math.min(b.n, k - 1)
      while (i > pos) {
        b.scores(i) = b.scores(i - 1); b.ids(i) = b.ids(i - 1); i -= 1
      }
      b.scores(pos) = score; b.ids(pos) = id
      if (b.n < k) b.n += 1
    }
  }

  override def update(b: TopKState, input: InternalRow): TopKState = {
    val s = scoreChild.eval(input)
    val id = idChild.eval(input)
    if (s != null && id != null)
      insert(b, s.asInstanceOf[Double], id.asInstanceOf[Long])
    b
  }

  override def merge(a: TopKState, b: TopKState): TopKState = {
    var i = 0
    while (i < b.n) { insert(a, b.scores(i), b.ids(i)); i += 1 }
    a
  }

  override def eval(b: TopKState): Any = {
    val rows = new Array[Any](b.n)
    var i = 0
    while (i < b.n) {
      rows(i) = new GenericInternalRow(
        Array[Any](b.scores(i), b.ids(i)))
      i += 1
    }
    new GenericArrayData(rows)
  }

  override def serialize(b: TopKState): Array[Byte] = {
    val buf = ByteBuffer.allocate(4 + b.n * 16)
    buf.putInt(b.n)
    var i = 0
    while (i < b.n) {
      buf.putDouble(b.scores(i)); buf.putLong(b.ids(i)); i += 1
    }
    buf.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKState = {
    val buf = ByteBuffer.wrap(bytes)
    val n = buf.getInt
    val b = new TopKState(new Array[Double](k), new Array[Long](k), n)
    var i = 0
    while (i < n) { b.scores(i) = buf.getDouble; b.ids(i) = buf.getLong; i += 1 }
    b
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKExpr =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKExpr =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKExpr =
    copy(scoreChild = newChildren(0), idChild = newChildren(1),
      kChild = newChildren(2))
}
