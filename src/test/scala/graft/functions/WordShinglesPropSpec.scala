package graft.functions

import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/**
 * Property guard for the native [[Sketches.wordShingles]] kernel: its output
 * must stay BYTE-IDENTICAL to the declarative formula it replaced
 * (`sort_array(array_distinct(transform(...)))` over
 * `filter(split(lower(text), "\\s+"), len>0)`) — every n-gram oracle in the
 * gate depends on that equivalence. The mirror below is a direct Scala
 * transliteration of the old expression chain.
 */
class WordShinglesPropSpec extends AnyFunSuite {

  /** The declarative formula, transliterated: lower → regex split → drop
    * empties → k-grams (or whole-text singleton) → distinct → sort by
    * UTF8 binary order. */
  private def referenceShingles(text: String, k: Int): Seq[String] = {
    val lowered = UTF8String.fromString(text).toLowerCase.toString
    val words = lowered.split("\\s+", -1).filter(_.nonEmpty).toSeq
    val grams =
      if (words.size < k) Seq(words.mkString(" "))
      else (0 to words.size - k).map(i => words.slice(i, i + k).mkString(" "))
    grams.distinct
      .map(UTF8String.fromString)
      .sortWith((a, b) => a.compareTo(b) < 0)
      .map(_.toString)
  }

  private def nativeShingles(text: String, k: Int): Seq[String] = {
    val arr = Sketches.wordShingles(UTF8String.fromString(text), k)
    (0 until arr.numElements()).map(i => arr.getUTF8String(i).toString)
  }

  private val words = Gen.oneOf("the", "Quick", "brown", "FOX", "fox",
    "über", "naïve", "東京", "a", "b", "", " ", "\t", "x1")
  private val texts: Gen[String] = for {
    n <- Gen.chooseNum(0, 30)
    ws <- Gen.listOfN(n, words)
    sep <- Gen.oneOf(" ", "  ", "\n", " \t ")
  } yield ws.mkString(sep)
  private val ks = Gen.oneOf(1, 2, 3, 5)

  private def check(name: String, p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(500), p)
    assert(res.passed, s"$name: $res")
  }

  test("native kernel == declarative formula on random texts (incl. non-ASCII)") {
    check("shingle parity", Prop.forAll(texts, ks) { (t, k) =>
      nativeShingles(t, k) == referenceShingles(t, k)
    })
  }

  test("edge cases: empty, whitespace-only, fewer words than k") {
    assert(nativeShingles("", 3) === Seq(""))
    assert(nativeShingles("   \t\n ", 3) === Seq(""))
    assert(nativeShingles("one two", 3) === Seq("one two"))
    assert(nativeShingles("A a A", 2) === Seq("a a")) // lowercase + distinct
  }

  /** word_ngrams mirror: lower → split → drop empties → sliding k joined by
    * one space, IN ORDER with duplicates preserved; n < k ⇒ empty. */
  private def referenceNgrams(text: String, k: Int): Seq[String] = {
    val words = UTF8String.fromString(text).toLowerCase.toString
      .split("\\s+", -1).filter(_.nonEmpty).toSeq
    if (words.size < k) Seq.empty
    else (0 to words.size - k).map(i => words.slice(i, i + k).mkString(" "))
  }

  private def nativeNgrams(text: String, k: Int): Seq[String] = {
    val arr = Sketches.wordNgrams(UTF8String.fromString(text), k)
    (0 until arr.numElements()).map(i => arr.getUTF8String(i).toString)
  }

  test("word_ngrams == in-order sliding window, duplicates preserved") {
    check("ngram parity", Prop.forAll(texts, ks) { (t, k) =>
      nativeNgrams(t, k) == referenceNgrams(t, k)
    })
    assert(nativeNgrams("", 2) === Seq.empty)
    assert(nativeNgrams("one", 2) === Seq.empty)
    assert(nativeNgrams("A a A", 2) === Seq("a a", "a a")) // duplicates stay
  }
}
