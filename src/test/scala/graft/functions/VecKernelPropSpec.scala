package graft.functions

import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/**
 * Property guard for the native vector kernels: [[Sketches.dotProd]] /
 * [[Sketches.cosineSim]] must stay BIT-IDENTICAL to the declarative
 * `aggregate(zip_with(a, b, (x,y) -> x*y), 0.0, +)` fold they replaced —
 * every cosine-family oracle hash depends on that left-to-right IEEE
 * accumulation order.
 */
class VecKernelPropSpec extends AnyFunSuite {

  /** The old fold, transliterated: cast to double, multiply pairwise,
    * sequential left-to-right sum. */
  private def refDot(a: Seq[Float], b: Seq[Float]): Double =
    a.zip(b).foldLeft(0.0) { case (acc, (x, y)) => acc + x.toDouble * y.toDouble }

  private def refCosine(a: Seq[Float], b: Seq[Float]): Double =
    refDot(a, b) / (math.sqrt(refDot(a, a)) * math.sqrt(refDot(b, b)))

  private def arr(xs: Seq[Float]) = new GenericArrayData(xs.toArray[Any])

  private val floats = Gen.oneOf(
    Gen.chooseNum(-10.0f, 10.0f),
    Gen.oneOf(0.0f, -0.0f, 1e-30f, 3.4e38f, -3.4e38f))
  private val vecPair: Gen[(List[Float], List[Float])] = for {
    n <- Gen.chooseNum(1, 80)
    a <- Gen.listOfN(n, floats)
    b <- Gen.listOfN(n, floats)
  } yield (a, b)

  private def check(name: String, p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(300), p)
    assert(res.passed, s"$name: $res")
  }

  test("dotProd / cosineSim bit-match the declarative fold on random vectors") {
    check("dot parity", Prop.forAll(vecPair) { case (a, b) =>
      val got = Sketches.dotProd(arr(a), arr(b), true, true)
      java.lang.Double.doubleToRawLongBits(got) ==
        java.lang.Double.doubleToRawLongBits(refDot(a, b))
    })
    check("cosine parity", Prop.forAll(vecPair) { case (a, b) =>
      val got = Sketches.cosineSim(arr(a), arr(b), true, true)
      // NaN-safe bit compare (zero-norm vectors divide by zero identically)
      java.lang.Double.doubleToRawLongBits(got) ==
        java.lang.Double.doubleToRawLongBits(refCosine(a, b))
    })
  }

  test("length mismatch and null elements yield null (zip_with semantics)") {
    assert(Sketches.dotProd(arr(Seq(1f, 2f)), arr(Seq(1f)), true, true) == null)
    val withNull = new GenericArrayData(Array[Any](1.0f, null, 3.0f))
    assert(Sketches.dotProd(withNull, arr(Seq(1f, 2f, 3f)), true, true) == null)
    assert(Sketches.cosineSim(withNull, arr(Seq(1f, 2f, 3f)), true, true) == null)
  }
}
