package graft.functions

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Property-based invariants of the ring math (SURVEY §5: "ScalaCheck for
  * token/range/offset-projection invariants"). Run via scalacheck's own
  * runner inside scalatest (no bridge artifact needed offline). */
class TokenMathPropSpec extends AnyFunSuite {

  private val rings = Gen.oneOf(3, 6, 12, 24)
  private val ranges = Gen.oneOf(1, 2, 4, 8)
  private val tokens = Gen.chooseNum(Long.MinValue, Long.MaxValue)

  private def check(name: String, p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(500), p)
    assert(res.passed, s"$name: $res")
  }

  test("partition id is always within [0, clusterSize*rangesPerToken)") {
    check("partition bounds", Prop.forAll(tokens, rings, ranges) { (t, cs, r) =>
      val p = TokenMath.partitionForToken(t, cs, r)
      p >= 0 && p < cs * r
    })
  }

  test("broker index owns the token: T_b <= t < T_{b+1} (ring order)") {
    check("broker ownership", Prop.forAll(tokens, rings, ranges) { (t, cs, r) =>
      val (b, _) = TokenMath.primaryTokenIndex(t, cs, r)
      val start = TokenMath.tokenAtIndex(cs, b)
      val nextStart =
        if (b == cs - 1) BigInt(Long.MaxValue) + 1 else BigInt(TokenMath.tokenAtIndex(cs, b + 1))
      BigInt(t) >= BigInt(start) && BigInt(t) < nextStart
    })
  }

  test("consumer ranges tile each broker chunk contiguously") {
    check("range tiling", Prop.forAll(rings, ranges) { (cs, r) =>
      Prop.all((0 until cs).map { b =>
        val tok = TokenMath.tokenAtIndex(cs, b)
        val spans = (0 until r).map(i =>
          TokenMath.rangeByTokenAndClusterSize(tok, i, r, cs))
        val contiguous = spans.sliding(2).forall {
          case Seq((_, e), (s, _)) => e == s
          case _ => true
        }
        val startsAtToken = spans.head._1 == tok
        val lastEnd = spans.last._2
        val endOk =
          if (b == cs - 1) lastEnd == Long.MaxValue
          else lastEnd == TokenMath.tokenAtIndex(cs, b + 1)
        Prop(contiguous && startsAtToken && endOk)
      }: _*)
    })
  }

  test("assigned range contains its token (modulo the reference's top-sliver clamp)") {
    check("range containment", Prop.forAll(tokens, rings, ranges) { (t, cs, r) =>
      val (b, ri) = TokenMath.primaryTokenIndex(t, cs, r)
      val tok = TokenMath.tokenAtIndex(cs, b)
      val (s, e) = TokenMath.rangeByTokenAndClusterSize(tok, ri, r, cs)
      val contains = t >= s && (t < e || e == Long.MaxValue)
      if (ri != 0) contains
      else {
        // range 0 also receives the clamped top-of-chunk sliver — tokens
        // past rangeSize*r within the chunk wrap to range 0 (token.go:49-66)
        val rangeSize = TokenMath.ChunkSizeUnit * TokenMath.ringFactor(cs) / r
        contains || (BigInt(t) - BigInt(tok)) >= BigInt(rangeSize) * r
      }
    })
  }

  test("ring doubling preserves existing broker tokens") {
    Seq(3 -> 6, 6 -> 12, 12 -> 24).foreach { case (n, n2) =>
      (0 until n).foreach { i =>
        assert(TokenMath.tokenAtIndex(n, i) === TokenMath.tokenAtIndex(n2, 2 * i),
          s"ring $n -> $n2, broker $i")
      }
    }
  }

  test("placement order is a permutation; first half reuses the old ring") {
    Seq(3, 6, 12, 24, 48).foreach { size =>
      val order = TokenMath.ordinalsPlacementOrder(size)
      assert(order.sorted.toSeq === (0 until size), s"size $size")
    }
  }

  test("projected ranges intersect the source and cover its every token") {
    check("projection coverage", Prop.forAll(
      Gen.oneOf(3 -> 6, 6 -> 3, 6 -> 12, 12 -> 6), Gen.oneOf(1, 4), tokens) {
      case ((cs, cs2), r, t) =>
        val (b, ri) = TokenMath.primaryTokenIndex(t, cs, r)
        val tok = TokenMath.tokenAtIndex(cs, b)
        val (s, e) = TokenMath.rangeByTokenAndClusterSize(tok, ri, r, cs)
        val projected = TokenMath.projectRangeByClusterSize(tok, ri, r, cs, cs2)
        val allIntersect = projected.forall { case (nt, idxs) =>
          idxs.forall { ni =>
            val (ns, ne) = TokenMath.rangeByTokenAndClusterSize(nt, ni, r, cs2)
            TokenMath.intersects(s, e, ns, ne)
          }
        }
        // coverage: a token in the source range lands in one projected range
        val inSource = t >= s && (t < e || e == Long.MaxValue)
        val covered = !inSource || projected.exists { case (nt, idxs) =>
          idxs.exists { ni =>
            val (ns, ne) = TokenMath.rangeByTokenAndClusterSize(nt, ni, r, cs2)
            t >= ns && (t < ne || ne == Long.MaxValue)
          }
        }
        allIntersect && covered
    })
  }

  test("intersects is symmetric for non-empty ranges") {
    // ring ranges are never empty (rangeSize > 0); for degenerate
    // start==end inputs the reference's formula is asymmetric by design
    check("intersects symmetry", Prop.forAll(tokens, tokens, tokens, tokens) {
      (a, b, c, d) =>
        val (s1, e1) = if (a <= b) (a, b) else (b, a)
        val (s2, e2) = if (c <= d) (c, d) else (d, c)
        (s1 == e1 || s2 == e2) ||
          TokenMath.intersects(s1, e1, s2, e2) == TokenMath.intersects(s2, e2, s1, e1)
    })
  }
}
