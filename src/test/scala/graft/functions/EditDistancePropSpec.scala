package graft.functions

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/**
 * Property guard for the banded Levenshtein kernel: for every pair,
 * [[EditDistance.bounded]] must equal the classic full DP when the true
 * distance is ≤ max, and return -1 when it exceeds max — the edit-distance
 * dedup join's correctness rests on the band/early-exit never changing a
 * reported distance or dropping a true match.
 */
class EditDistancePropSpec extends AnyFunSuite {

  /** Reference: textbook full DP on codepoints. */
  private def refLev(a: String, b: String): Int = {
    val s = a.codePoints().toArray
    val t = b.codePoints().toArray
    val dp = Array.tabulate(s.length + 1)(i => i)
    for (j <- 1 to t.length) {
      var prevDiag = dp(0)
      dp(0) = j
      for (i <- 1 to s.length) {
        val tmp = dp(i)
        dp(i) = math.min(math.min(dp(i) + 1, dp(i - 1) + 1),
          prevDiag + (if (s(i - 1) == t(j - 1)) 0 else 1))
        prevDiag = tmp
      }
    }
    dp(s.length)
  }

  private val alphabet = Gen.oneOf("ab".toSeq) // small alphabet → many near-dups
  private val word: Gen[String] = for {
    n <- Gen.chooseNum(0, 40)
    cs <- Gen.listOfN(n, alphabet)
  } yield cs.mkString

  // long enough to cross the bit-parallel kernel's 64-cell word boundary
  private val longWord: Gen[String] = for {
    n <- Gen.chooseNum(0, 200)
    cs <- Gen.listOfN(n, Gen.oneOf("abc ".toSeq))
  } yield cs.mkString

  // unicode strings too (codepoint semantics, incl. astral plane)
  private val uniWord: Gen[String] = for {
    n <- Gen.chooseNum(0, 20)
    cs <- Gen.listOfN(n, Gen.oneOf("a", "é", "中", "😀"))
  } yield cs.mkString

  // multi-word unicode: crosses the word boundary with non-ASCII Peq slots
  private val longUniWord: Gen[String] = for {
    n <- Gen.chooseNum(0, 150)
    cs <- Gen.listOfN(n, Gen.oneOf("a", "b", "é", "😀"))
  } yield cs.mkString

  private def check(name: String, p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(500), p)
    assert(res.passed, s"$name: $res")
  }

  test("bounded == full DP below the cap, -1 above, across random pairs and caps") {
    check("ascii", Prop.forAll(word, word, Gen.chooseNum(0, 45)) { (a, b, max) =>
      val full = refLev(a, b)
      val got = EditDistance.bounded(a, b, max)
      if (full <= max) got == full else got == -1
    })
    check("unicode", Prop.forAll(uniWord, uniWord, Gen.chooseNum(0, 25)) { (a, b, max) =>
      val full = refLev(a, b)
      val got = EditDistance.bounded(a, b, max)
      if (full <= max) got == full else got == -1
    })
    check("multi-word", Prop.forAll(longWord, longWord, Gen.chooseNum(0, 210)) { (a, b, max) =>
      val full = refLev(a, b)
      val got = EditDistance.bounded(a, b, max)
      if (full <= max) got == full else got == -1
    })
    check("multi-word-unicode", Prop.forAll(longUniWord, longUniWord, Gen.chooseNum(0, 160)) { (a, b, max) =>
      val full = refLev(a, b)
      val got = EditDistance.bounded(a, b, max)
      if (full <= max) got == full else got == -1
    })
  }

  test("q-gram count filter never prunes a pair within the distance cap") {
    // the join's safety invariant: for ANY pair, the hashed min-sum is
    // ≥ max(|a|,|b|) − q + 1 − q·ed(a,b) — so a pair with ed ≤ max always
    // clears the filter's floor computed with d = max ≥ ed
    val q = 8
    check("count-filter", Prop.forAll(word, word) { (a, b) =>
      val ed = refLev(a, b)
      val upper = QGramFilter.minSum(
        QGramFilter.hist(org.apache.spark.unsafe.types.UTF8String.fromString(a), q, 64),
        QGramFilter.hist(org.apache.spark.unsafe.types.UTF8String.fromString(b), q, 64))
      upper >= math.max(a.length, b.length) - (q - 1) - q.toLong * ed
    })
    check("count-filter-unicode", Prop.forAll(uniWord, uniWord) { (a, b) =>
      val ed = refLev(a, b)
      val la = a.codePointCount(0, a.length)
      val lb = b.codePointCount(0, b.length)
      val upper = QGramFilter.minSum(
        QGramFilter.hist(org.apache.spark.unsafe.types.UTF8String.fromString(a), q, 64),
        QGramFilter.hist(org.apache.spark.unsafe.types.UTF8String.fromString(b), q, 64))
      upper >= math.max(la, lb) - (q - 1) - q.toLong * ed
    })
  }

  test("sparse sketch bound matches the safety invariant and the exact count") {
    import org.apache.spark.unsafe.types.UTF8String
    val q = 3
    // exact common-q-gram multiset intersection, the quantity both
    // filters upper-bound
    def exactCommon(a: String, b: String): Long = {
      def grams(s: String) = s.codePoints().toArray.sliding(q)
        .filter(_.length == q).map(_.toSeq).toSeq
        .groupBy(identity).map { case (k, v) => (k, v.size) }
      val ga = grams(a); val gb = grams(b)
      ga.map { case (k, c) => math.min(c, gb.getOrElse(k, 0)) }.sum.toLong
    }
    check("sketch-safety", Prop.forAll(word, word) { (a, b) =>
      val ed = refLev(a, b)
      val upper = QGramFilter.minSumSorted(
        QGramFilter.sketch(UTF8String.fromString(a), q),
        QGramFilter.sketch(UTF8String.fromString(b), q))
      upper >= math.max(a.length, b.length) - (q - 1) - q.toLong * ed
    })
    check("sketch-vs-exact", Prop.forAll(longWord, longWord) { (a, b) =>
      val upper = QGramFilter.minSumSorted(
        QGramFilter.sketch(UTF8String.fromString(a), q),
        QGramFilter.sketch(UTF8String.fromString(b), q))
      // full 32-bit hashing: overestimates only on a hash collision, which
      // the 4-char test alphabet cannot produce within these lengths
      upper == exactCommon(a, b)
    })
    check("sketch-unicode-safety", Prop.forAll(uniWord, uniWord) { (a, b) =>
      val ed = refLev(a, b)
      val la = a.codePointCount(0, a.length)
      val lb = b.codePointCount(0, b.length)
      val upper = QGramFilter.minSumSorted(
        QGramFilter.sketch(UTF8String.fromString(a), q),
        QGramFilter.sketch(UTF8String.fromString(b), q))
      upper >= math.max(la, lb) - (q - 1) - q.toLong * ed
    })
  }

  test("kernel agrees with Spark's builtin levenshtein on sample docs") {
    val docs = Seq(
      "the quick brown fox", "the quick brown fx", "a completely different text",
      "", "x", "the quick brown fox jumps over the lazy dog")
    for (a <- docs; b <- docs) {
      val full = refLev(a, b)
      val got = EditDistance.bounded(a, b, 30)
      assert(if (full <= 30) got == full else got == -1, s"'$a' vs '$b'")
    }
  }
}
