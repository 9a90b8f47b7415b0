package graft.functions

import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec

class JaroWinklerSpec extends SparkSpec {
  import spark.implicits._

  /** Deterministic mini-forAll (scalatestplus isn't on the offline
    * classpath): 60 seeded samples per property. */
  private def forAll[A, B](ga: Gen[A], gb: Gen[B])(
      body: (A, B) => Unit): Unit =
    (0 until 60).foreach { i =>
      val a = ga.apply(Gen.Parameters.default, Seed(i.toLong)).get
      val b = gb.apply(Gen.Parameters.default, Seed(1000L + i)).get
      body(a, b)
    }

  private def jw(a: String, b: String): Long =
    JaroWinklerMicro.jwMicro(
      UTF8String.fromString(a), UTF8String.fromString(b))

  /** Textbook double reference (same window / boost-gate conventions)
    * used only as a tolerance check on the exact-rational micros. */
  private def jwRef(s: String, t: String): Double = {
    val (l1, l2) = (s.length, t.length)
    if (l1 == 0 && l2 == 0) return 1.0
    if (l1 == 0 || l2 == 0) return 0.0
    val window = math.max(0, math.max(l1, l2) / 2 - 1)
    val sM = new Array[Boolean](l1)
    val tM = new Array[Boolean](l2)
    var m = 0
    for (i <- 0 until l1) {
      val hi = math.min(l2 - 1, i + window)
      var j = math.max(0, i - window)
      var done = false
      while (j <= hi && !done) {
        if (!tM(j) && s(i) == t(j)) {
          sM(i) = true; tM(j) = true; m += 1; done = true
        }
        j += 1
      }
    }
    if (m == 0) return 0.0
    var (tr, k) = (0, 0)
    for (i <- 0 until l1 if sM(i)) {
      while (!tM(k)) k += 1
      if (s(i) != t(k)) tr += 1
      k += 1
    }
    val jaro = (m.toDouble / l1 + m.toDouble / l2 +
      (m - tr / 2.0) / m) / 3.0
    var l = 0
    while (l < 4 && l < l1 && l < l2 && s(l) == t(l)) l += 1
    if (jaro > 0.7 && l > 0) jaro + l * 0.1 * (1 - jaro) else jaro
  }

  test("known values (cross-checked against DuckDB's implementation)") {
    assert(jw("martha", "marhta") === 961111L)   // 0.9611…
    assert(jw("DIXON", "DICKSONX") === 813333L)  // 0.8133…
    // below the 0.7 boost gate: prefix bonus must NOT apply
    assert(jw("abcdefgh", "abzzzzzz") === 500000L)
    assert(jw("JELLYFISH", "SMELLYFISH") === 896296L) // no common prefix
    assert(jw("a", "a") === 1000000L)
    assert(jw("abc", "") === 0L)
    assert(jw("", "") === 1000000L)
  }

  test("exact micros within 1 ulp-scale of the double reference") {
    val gen = Gen.chooseNum(0, 12).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf('a', 'b', 'c', 'd')).map(_.mkString))
    forAll(gen, gen) { (a: String, b: String) =>
      val exact = jw(a, b)
      val ref = math.floor(jwRef(a, b) * 1e6).toLong
      // the exact rational can differ from floor(double) only by the
      // double's representation error at a floor boundary: allow 1
      assert(math.abs(exact - ref) <= 1,
        s"jw('$a','$b'): exact=$exact ref=$ref")
    }
  }

  test("symmetry and bounds") {
    val gen = Gen.alphaLowerStr.map(_.take(10))
    forAll(gen, gen) { (a: String, b: String) =>
      val x = jw(a, b)
      assert(x === jw(b, a))
      assert(x >= 0L && x <= 1000000L)
      if (a == b && a.nonEmpty) assert(x === 1000000L)
    }
  }

  test("graft_jaro_winkler resolves in SQL and is codegen-compatible") {
    val r = spark.range(1)
      .selectExpr("graft_jaro_winkler('martha', 'marhta') AS j")
      .as[Long].head()
    assert(r === 961111L)
  }

  test("inputs past the Long-safe cutoff route through exact BigInt") {
    // l2 > 400000 forces the BigInt N/D branch; s's 5 chars all match
    // t's prefix inside the window, so the outer loop stays O(l1·window)
    val s = "abcde"
    val t = "abcde" + ("z" * 399997)
    val got = JaroWinklerMicro.jwMicro(
      org.apache.spark.unsafe.types.UTF8String.fromString(s),
      org.apache.spark.unsafe.types.UTF8String.fromString(t))
    // independent BigInt replica of the rational: m=5, tHalf=0, ℓ=4
    val (l1, l2, m) = (BigInt(5), BigInt(400002), BigInt(5))
    val n = 2 * m * m * l2 + 2 * m * m * l1 + 2 * m * l1 * l2
    val d = 6 * l1 * l2 * m
    val boosted = n * 10 > d * 7
    val want =
      if (boosted) ((n * 6 + d * 4) * 1000000 / (d * 10)).toLong
      else (n * 1000000 / d).toLong
    assert(got === want)
    // and the score is the sane one: jaro ≈ (1 + 5/400002 + 1)/3
    assert(got >= 666000L && got <= 778000L)
  }
}
