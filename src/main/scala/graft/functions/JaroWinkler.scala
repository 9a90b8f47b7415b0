package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Jaro-Winkler similarity as integer micros — the record-linkage
  * scorer (typo-tolerant name matching) as a native codegen expression,
  * so a blocked linkage join scores candidates inside whole-stage
  * codegen with zero boxing.
  *
  * EXACT RATIONAL ARITHMETIC: Jaro is (m/|s| + m/|t| + (2m−t′)/2m)/3
  * with integer match count m and half-transpositions t′, i.e. the
  * rational N/D with N = 2m²|t| + 2m²|s| + (2m−t′)·|s||t| and
  * D = 6·|s||t|·m. The Winkler prefix boost (p = 1/10, ℓ ≤ 4, applied
  * iff jaro > 7/10 — the classic gate, cross-multiplied as 10N > 7D)
  * folds in as ((10−ℓ)N + ℓD)/(10D). The result floors once to micros —
  * no double ever appears, so scores are reproducible across engines,
  * JVMs, and hardware, and safe to hash, join, and threshold on.
  *
  * Window convention matches the textbook (and DuckDB's
  * `jaro_winkler_similarity`): match window ⌊max(|s|,|t|)/2⌋ − 1,
  * greedy left-to-right match flags, transpositions counted over the
  * matched subsequences. Char-based (UTF-16 units) — identical to
  * byte-based engines on ASCII data; normalize non-ASCII upstream
  * (graft_nfc) before scoring.
  *
  * Long strings: N grows as |s|²·|t|, so inputs beyond ~10k chars
  * switch to BigInt for the final scale step (the O(|s|·window) scan
  * dominates anyway). Intended domain is names/titles/labels.
  */
case class JaroWinklerMicro(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_jaro_winkler expects (string, string), got " +
        s"(${left.dataType.sql}, ${right.dataType.sql})")

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_jaro_winkler"

  override def nullSafeEval(a: Any, b: Any): Any =
    JaroWinklerMicro.jwMicro(
      a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.JaroWinklerMicro.jwMicro($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object JaroWinklerMicro {

  /** Called from generated code. Returns ⌊10⁶ · jaro_winkler(a, b)⌋. */
  def jwMicro(a: UTF8String, b: UTF8String): Long = {
    val s = a.toString
    val t = b.toString
    val l1 = s.length
    val l2 = t.length
    if (l1 == 0 && l2 == 0) return 1000000L
    if (l1 == 0 || l2 == 0) return 0L

    val window = math.max(0, math.max(l1, l2) / 2 - 1)
    val sM = new Array[Boolean](l1)
    val tM = new Array[Boolean](l2)
    var m = 0
    var i = 0
    while (i < l1) {
      val ci = s.charAt(i)
      var j = math.max(0, i - window)
      val hi = math.min(l2 - 1, i + window)
      var matched = false
      while (j <= hi && !matched) {
        if (!tM(j) && ci == t.charAt(j)) {
          sM(i) = true; tM(j) = true; m += 1; matched = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0L

    // half-transpositions: walk both matched subsequences in order
    var tHalf = 0
    var k = 0
    i = 0
    while (i < l1) {
      if (sM(i)) {
        while (!tM(k)) k += 1
        if (s.charAt(i) != t.charAt(k)) tHalf += 1
        k += 1
      }
      i += 1
    }

    val mm = m.toLong

    var l = 0
    while (l < 4 && l < l1 && l < l2 && s.charAt(l) == t.charAt(l)) l += 1

    // N ≤ 6L³ and the boost gate needs 10N: past L ≈ 4·10⁵ chars the
    // Long terms overflow SILENTLY (wrong score, not an error), so the
    // whole N/D construction — gate included — switches to BigInt there.
    // Below the cutoff 10N ≤ 60L³ < 2⁶³ holds, so Long is exact.
    if (math.max(l1, l2) > 400000) {
      val bn = BigInt(2) * mm * mm * l2 + BigInt(2) * mm * mm * l1 +
        BigInt(2 * mm - tHalf) * l1 * l2
      val bd = BigInt(6) * l1 * l2 * mm
      val boosted = bn * 10 > bd * 7 && l > 0
      if (boosted) ((bn * (10 - l) + bd * l) * 1000000 / (bd * 10)).toLong
      else (bn * 1000000 / bd).toLong
    } else {
      val n = 2L * mm * mm * l2 + 2L * mm * mm * l1 +
        (2L * mm - tHalf) * l1 * l2
      val d = 6L * l1.toLong * l2 * mm
      val boosted = 10L * n > 7L * d && l > 0
      // ⌊10⁶·N/D⌋ or ⌊10⁶·((10−ℓ)N + ℓD)/(10D)⌋; values are positive,
      // so Long division IS floor. BigInt only when 10⁶·num could
      // overflow.
      if (boosted) {
        val num = (10L - l) * n + l * d
        if (num <= 9000000000000L) num * 1000000L / (10L * d)
        else (BigInt(num) * 1000000 / (BigInt(d) * 10)).toLong
      } else {
        if (n <= 9000000000000L) n * 1000000L / d
        else (BigInt(n) * 1000000 / BigInt(d)).toLong
      }
    }
  }
}
