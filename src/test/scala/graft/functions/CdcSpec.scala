package graft.functions

import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

class CdcSpec extends AnyFunSuite {

  private def fps(s: String): Seq[Long] = {
    val a = Cdc.chunkFps(UTF8String.fromString(s), 16, 63L)
    (0 until a.numElements()).map(a.getLong)
  }
  private def lens(s: String): Seq[Long] = {
    val a = Cdc.chunkLens(UTF8String.fromString(s), 16, 63L)
    (0 until a.numElements()).map(a.getLong)
  }

  private val base = {
    val rnd = new scala.util.Random(42)
    (1 to 2000).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
  }

  test("chunk lengths tile the byte length exactly") {
    assert(lens(base).sum === base.length)
    assert(lens("").isEmpty && fps("").isEmpty)
    val short = "tiny"
    assert(lens(short) === Seq(short.length.toLong)) // shorter than window
  }

  test("an insertion near the head re-chunks only locally (CDC property)") {
    val edited = "X" + base
    val a = fps(base)
    val b = fps(edited)
    // all chunks after the edit's neighborhood keep their identity: the
    // suffixes of the two chunk streams coincide
    val common = a.reverse.zip(b.reverse).takeWhile { case (x, y) => x == y }.length
    assert(common >= a.length - 3,
      s"expected all but the first chunks shared, got $common of ${a.length}")
    assert(a.length >= 10, "test corpus should produce many chunks")
  }

  test("chunk texts tile the input and concatenate back to it exactly") {
    def texts(s: String): Seq[String] = {
      val a = Cdc.chunkTexts(UTF8String.fromString(s), 16, 63L)
      (0 until a.numElements()).map(a.getUTF8String(_).toString)
    }
    assert(texts(base).mkString === base)
    assert(texts(base).map(_.length.toLong) === lens(base))
    // byte-positioned cuts on multi-byte UTF-8 still round-trip: compare
    // the raw byte concatenation, not per-chunk string validity
    val uni = "héllo wörld ünïcode " * 40
    val u = UTF8String.fromString(uni)
    val arr = Cdc.chunkTexts(u, 16, 63L)
    val joined = (0 until arr.numElements())
      .flatMap(i => arr.getUTF8String(i).getBytes.toSeq)
    assert(joined === u.getBytes.toSeq)
  }

  test("chunk fingerprint equals the whole-string fold for each chunk") {
    // reconstruct chunk boundaries from lens, fold each chunk with the
    // shared rollingFingerprint kernel, compare
    val ls = lens(base).map(_.toInt)
    val starts = ls.scanLeft(0)(_ + _)
    val expect = starts.zip(ls).map { case (s, l) =>
      Sketches.rollingFingerprint(UTF8String.fromString(base.substring(s, s + l)))
    }
    assert(fps(base) === expect)
  }
}
