package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native k-shingling: `graft_shingles(tokens, k)` returns the DISTINCT
  * space-joined k-grams of a token array, in first-occurrence order —
  * exactly the semantics of the higher-order-function formulation
  * (`array_distinct(array_compact(zip_with-chain))`, kept as
  * `Text.shinglesHof`), but as one fused loop instead of k-1 interpreted
  * lambda passes per document. Shingling feeds every dedup operator
  * (minhash, n-gram Jaccard, contamination), so this is the hottest
  * text-side loop in the engine.
  *
  * A window containing a null token yields no shingle (concat semantics —
  * unreachable for `split` output, which never produces null elements).
  */
case class Shingles(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = left.dataType match {
    case ArrayType(StringType, _) if right.dataType == IntegerType &&
      right.foldable => right.eval() match {
      // range-check the foldable literal at analysis time: k <= 0 would
      // otherwise surface mid-job as a NegativeArraySizeException
      case k: Int if k >= 1 => TypeCheckResult.TypeCheckSuccess
      case k => TypeCheckResult.TypeCheckFailure(
        s"graft_shingles: k must be >= 1, got $k")
    }
    case _ => TypeCheckResult.TypeCheckFailure(
      s"graft_shingles expects (array<string>, int literal), got " +
        s"(${left.dataType.sql}, ${right.dataType.sql})")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_shingles"

  override def nullSafeEval(toks: Any, k: Any): Any =
    ShingleOps.compute(toks.asInstanceOf[ArrayData], k.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, k) => s"graft.functions.ShingleOps.compute($a, $k)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Native positional k-gram windows: `graft_shingle_spans(tokens, k)`
  * returns EVERY k-token window in document order, duplicates included —
  * the span view used by substring-level dedup (which must count and
  * locate repeated spans, not just know the distinct set). Same
  * null-window semantics as [[Shingles]]; a null token inside a window
  * drops that window.
  */
case class ShingleSpans(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = left.dataType match {
    case ArrayType(StringType, _) if right.dataType == IntegerType &&
      right.foldable => right.eval() match {
      case k: Int if k >= 1 => TypeCheckResult.TypeCheckSuccess
      case k => TypeCheckResult.TypeCheckFailure(
        s"graft_shingle_spans: k must be >= 1, got $k")
    }
    case _ => TypeCheckResult.TypeCheckFailure(
      s"graft_shingle_spans expects (array<string>, int literal), got " +
        s"(${left.dataType.sql}, ${right.dataType.sql})")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_shingle_spans"

  override def nullSafeEval(toks: Any, k: Any): Any =
    ShingleOps.computeSpans(toks.asInstanceOf[ArrayData], k.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, k) => s"graft.functions.ShingleOps.computeSpans($a, $k)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object ShingleOps {
  private val Space = UTF8String.fromString(" ")

  /** Called from generated code: all k-windows in order, non-distinct. */
  def computeSpans(toks: ArrayData, k: Int): ArrayData = {
    val n = toks.numElements()
    if (n < k) return new GenericArrayData(Array.empty[Any])
    val out = new java.util.ArrayList[AnyRef](n - k + 1)
    val parts = new Array[UTF8String](2 * k - 1)
    var j = 1
    while (j < parts.length) { parts(j) = Space; j += 2 }
    var i = 0
    while (i <= n - k) {
      var ok = true
      var t = 0
      while (t < k && ok) {
        val tok = toks.getUTF8String(i + t)
        if (tok == null) ok = false else parts(2 * t) = tok
        t += 1
      }
      if (ok) out.add(UTF8String.concat(parts: _*))
      i += 1
    }
    new GenericArrayData(out.toArray(new Array[AnyRef](out.size())))
  }

  /** Called from generated code. */
  def compute(toks: ArrayData, k: Int): ArrayData = {
    val n = toks.numElements()
    if (n < k) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[UTF8String]()
    val parts = new Array[UTF8String](2 * k - 1)
    var j = 1
    while (j < parts.length) { parts(j) = Space; j += 2 }
    var i = 0
    while (i <= n - k) {
      var ok = true
      var t = 0
      while (t < k && ok) {
        val tok = toks.getUTF8String(i + t)
        if (tok == null) ok = false else parts(2 * t) = tok
        t += 1
      }
      if (ok) seen.add(UTF8String.concat(parts: _*))
      i += 1
    }
    new GenericArrayData(seen.toArray(new Array[AnyRef](seen.size())))
  }
}

/** Native MinHash signature: `graft_minhash(shingles, p)` returns, for each
  * permutation i in 0 until p, `min over u of md5("i:" || u)` as lowercase
  * hex — bit-identical to the explode → groupBy(min(md5(concat_ws(":",
  * i, u)))) formulation, computed scan-local in one pass.
  *
  * The point at 100 TB: the exploded formulation shuffles |occurrences|
  * rows into a hash aggregate just to take per-doc minimums; this
  * expression keeps signature generation inside the scan stage — ZERO
  * shuffle until LSH candidate pairing. Minimums are compared on the raw
  * 16-byte digests (hex encoding is order-preserving), hex-encoded once at
  * the end.
  *
  * Returns null for an empty shingle set (such docs have no signature —
  * the exploded form simply drops them).
  */
case class MinhashSig(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = left.dataType match {
    case ArrayType(StringType, _) if right.dataType == IntegerType &&
      right.foldable => right.eval() match {
      // p = 0 would otherwise hit mins(0) mid-job
      case p: Int if p >= 1 => TypeCheckResult.TypeCheckSuccess
      case p => TypeCheckResult.TypeCheckFailure(
        s"graft_minhash: numPerms must be >= 1, got $p")
    }
    case _ => TypeCheckResult.TypeCheckFailure(
      s"graft_minhash expects (array<string>, int literal), got " +
        s"(${left.dataType.sql}, ${right.dataType.sql})")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_minhash"

  override def nullSafeEval(arr: Any, p: Any): Any =
    MinhashOps.compute(arr.asInstanceOf[ArrayData], p.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, p) => {
      s"""
         |${ev.value} = graft.functions.MinhashOps.compute($a, $p);
         |if (${ev.value} == null) { ${ev.isNull} = true; }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Native min-md5 over a string array: `graft_min_md5(arr)` =
  * `array_min(transform(arr, s -> md5(s)))` without the interpreted
  * per-element lambda — the 1-permutation minhash used as a cheap
  * near-dup block key in `Text.minShingleFingerprint`. Minimum is
  * compared on raw digests (hex encoding is order-preserving); null for
  * an empty array (array_min of an empty transform is null too). */
case class MinMd5(child: Expression)
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_min_md5 expects array<string>, got ${other.sql}")
  }

  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_min_md5"

  override def nullSafeEval(arr: Any): Any =
    MinhashOps.minMd5(arr.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      s"""
         |${ev.value} = graft.functions.MinhashOps.minMd5($a);
         |if (${ev.value} == null) { ${ev.isNull} = true; }
       """.stripMargin
    })

  override protected def withNewChildInternal(
      newChild: Expression): Expression = copy(child = newChild)
}

/** Native SimHash (Charikar '02): `graft_simhash(tokens, bits)` returns
  * the `bits`-wide fingerprint — per token take the leading `bits` of
  * md5(token), sum each bit over tokens, set output bit j iff
  * 2·ones_j > n_tokens — bit-identical to the exploded formulation in
  * [[graft.dedup.Dedup.simhash]]'s original (token × bit explode →
  * groupBy sums), computed scan-local in one pass: at 100 TB the exploded
  * form shuffles |tokens|·bits rows through two aggregations before the
  * first useful operator; this expression makes fingerprinting free at
  * scan time.
  *
  * Null for an empty token array (such docs had no exploded rows and
  * dropped out of the original formulation).
  */
case class SimhashFp(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = left.dataType match {
    case ArrayType(StringType, _) if right.dataType == IntegerType &&
      right.foldable => right.eval() match {
      // bits > 64 silently corrupts the long fingerprint (negative
      // shift), bits > 128 runs out of md5 digest — reject at analysis
      case b: Int if b >= 1 && b <= 64 => TypeCheckResult.TypeCheckSuccess
      case b => TypeCheckResult.TypeCheckFailure(
        s"graft_simhash: bits must be in 1..64, got $b")
    }
    case _ => TypeCheckResult.TypeCheckFailure(
      s"graft_simhash expects (array<string>, int literal), got " +
        s"(${left.dataType.sql}, ${right.dataType.sql})")
  }

  override def dataType: DataType =
    org.apache.spark.sql.types.LongType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_simhash"

  override def nullSafeEval(arr: Any, bits: Any): Any =
    SimhashOps.compute(arr.asInstanceOf[ArrayData], bits.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      // freshName, NOT a fixed local: with non-nullable inputs the
      // snippet is emitted unbraced, so two graft_simhash calls in one
      // stage would declare the same variable twice — a Janino compile
      // error and a silent whole-stage interpreted fallback
      val res = ctx.freshName("simhashRes")
      s"""
         |Object $res = graft.functions.SimhashOps.compute($a, $b);
         |if ($res == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = ((Long) $res).longValue(); }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** One MD5 instance per executor thread — getInstance allocates internal
  * buffers, and these loops run once per row. */
private[functions] object Md5Local {
  private val local = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest =
      MessageDigest.getInstance("MD5")
  }
  def get(): MessageDigest = { val md = local.get(); md.reset(); md }
}

object SimhashOps {
  /** Called from generated code. Null for an empty token array. */
  def compute(toks: ArrayData, bits: Int): Any = {
    val n = toks.numElements()
    if (n == 0) return null
    val md = Md5Local.get()
    val ones = new Array[Int](bits)
    var counted = 0
    var i = 0
    while (i < n) {
      val t = toks.getUTF8String(i)
      if (t != null) {
        md.reset()
        val d = md.digest(t.getBytes)
        var j = 0
        while (j < bits) {
          if (((d(j / 8) >> (7 - j % 8)) & 1) == 1) ones(j) += 1
          j += 1
        }
        counted += 1
      }
      i += 1
    }
    if (counted == 0) return null
    var fp = 0L
    var j = 0
    while (j < bits) {
      if (ones(j) * 2 > counted) fp |= 1L << (bits - 1 - j)
      j += 1
    }
    java.lang.Long.valueOf(fp)
  }
}

object MinhashOps {
  private val hexChars = "0123456789abcdef".toCharArray

  /** Unsigned lexicographic compare of two 16-byte digests. */
  private def less(a: Array[Byte], b: Array[Byte]): Boolean = {
    var i = 0
    while (i < a.length) {
      val x = a(i) & 0xff
      val y = b(i) & 0xff
      if (x != y) return x < y
      i += 1
    }
    false
  }

  private def hex(d: Array[Byte]): UTF8String = {
    val out = new Array[Byte](d.length * 2)
    var i = 0
    while (i < d.length) {
      out(2 * i) = hexChars((d(i) >> 4) & 0xf).toByte
      out(2 * i + 1) = hexChars(d(i) & 0xf).toByte
      i += 1
    }
    UTF8String.fromBytes(out)
  }

  /** Called from generated code: min lowercase-hex md5 over the array's
    * non-null elements, null if there are none. */
  def minMd5(arr: ArrayData): UTF8String = {
    val n = arr.numElements()
    val md = Md5Local.get()
    var min: Array[Byte] = null
    var i = 0
    while (i < n) {
      val s = arr.getUTF8String(i)
      if (s != null) {
        md.reset()
        val d = md.digest(s.getBytes)
        if (min == null || less(d, min)) min = d
      }
      i += 1
    }
    if (min == null) null else hex(min)
  }

  // the per-permutation "i:" prefix bytes are identical across rows —
  // building them per row in the hottest text-side loop allocated
  // millions of short-lived arrays (the HyperplaneOps cache pattern)
  private val prefixCache =
    scala.collection.concurrent.TrieMap.empty[Int, Array[Array[Byte]]]
  private def prefixes(numPerms: Int): Array[Array[Byte]] =
    prefixCache.getOrElseUpdate(numPerms,
      Array.tabulate(numPerms)(i => (i + ":").getBytes))

  /** Called from generated code. Null for an empty shingle array. */
  def compute(shingles: ArrayData, numPerms: Int): ArrayData = {
    val n = shingles.numElements()
    if (n == 0) return null
    val md = Md5Local.get()
    val prefixes = this.prefixes(numPerms)
    val mins = new Array[Array[Byte]](numPerms)
    var u = 0
    while (u < n) {
      val s = shingles.getUTF8String(u)
      if (s != null) {
        val sb = s.getBytes
        var p = 0
        while (p < numPerms) {
          md.reset()
          md.update(prefixes(p))
          md.update(sb)
          val d = md.digest()
          if (mins(p) == null || less(d, mins(p))) mins(p) = d
          p += 1
        }
      }
      u += 1
    }
    if (mins(0) == null) return null
    new GenericArrayData(mins.map(hex(_): AnyRef))
  }
}
