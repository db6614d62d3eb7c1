package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** Golden vectors from `/root/reference/internal/types/token_test.go` and
  * `placement_order_test.go`, plus ring invariants as properties. */
class TokenMathSpec extends AnyFunSuite {
  import TokenMath._

  test("tokenAtIndex starts at MinValue and wraps") {
    assert(tokenAtIndex(6, 0) === Long.MinValue)
    assert(tokenAtIndex(6, 6) === Long.MinValue)
    assert(tokenAtIndex(6, 7) === tokenAtIndex(6, 1))
  }

  test("ring is evenly divided; last slice within 1%") {
    for (factor <- 0 until 12) {
      val n = 3 * (1 << factor)
      val diff = tokenAtIndex(n, 1) - StartToken
      var previous = StartToken
      for (i <- 1 until n) {
        val t = tokenAtIndex(n, i)
        assert(t - previous === diff, s"ring $n index $i")
        previous = t
      }
      val lastDiff = (Long.MaxValue - previous + 1).toDouble
      val pct = math.abs(100.0 - lastDiff / diff.toDouble * 100.0)
      assert(pct < 1.0, s"ring $n last slice off by $pct%")
    }
  }

  test("growing the ring does not move existing tokens") {
    for (i <- 0 until 3; j <- 0 until 10) {
      val base = tokenAtIndex(3, i)
      val ringBase = 1 << j
      assert(tokenAtIndex(3 * ringBase, i * ringBase) === base)
    }
  }

  test("primaryTokenIndex golden cases (clusterSize=6, ranges=8)") {
    assert(primaryTokenIndex(StartToken, 6, 8) === ((0, 0)))
    assert(primaryTokenIndex(Long.MaxValue, 6, 8) === ((5, 0)))
    assert(primaryTokenIndex(Long.MaxValue - 10000L, 6, 8) === ((5, 7)))
    assert(primaryTokenIndex(Long.MaxValue - 999999999999999999L, 6, 8) === ((5, 5)))
    assert(primaryTokenIndex(StartToken + ChunkSizeUnit * ringFactor(6) / 2, 6, 8) === ((0, 4)))
  }

  test("rangeByTokenAndClusterSize fixed values") {
    val (start0, end0_3) = rangeByTokenAndClusterSize(StartToken, 0, 4, 3)
    assert(start0 === StartToken)
    assert(end0_3 === -7686143364045646848L)
    val (start1_6, end1_6) = rangeByTokenAndClusterSize(StartToken, 1, 4, 6)
    assert(end1_6 === end0_3)
    assert(start1_6 === -8454757700450211328L)
  }

  test("rangeByTokenAndClusterSize dev mode (single broker)") {
    val (s0, e0) = rangeByTokenAndClusterSize(StartToken, 0, 4, 1)
    val (s1, e1) = rangeByTokenAndClusterSize(StartToken, 1, 4, 1)
    val (s2, e2) = rangeByTokenAndClusterSize(StartToken, 2, 4, 1)
    val (s3, e3) = rangeByTokenAndClusterSize(StartToken, 3, 4, 1)
    assert(s0 === StartToken)
    assert(e0 === s1)
    assert(e1 === s2)
    assert(s2 === 0L)
    assert(e2 === s3)
    assert(s3 === 4611686018427387904L)
    assert(e3 === Long.MaxValue)
  }

  test("intersects") {
    assert(intersects(0, 10, 5, 15))
    assert(intersects(0, 10, 0, 10))
    assert(intersects(50, 100, 10, 60))
    assert(intersects(50, 100, 10, 100))
    assert(intersects(300, 400, 10, 350))
    assert(!intersects(0, 10, 20, 30))
    assert(!intersects(0, 10, 10, 20))
    assert(!intersects(200, 500, 10, 150))
    assert(!intersects(200, 500, 0, 200))
  }

  test("ordinals placement order golden rings") {
    assert(ordinalsPlacementOrder(3).toSeq === Seq(0, 1, 2))
    assert(ordinalsPlacementOrder(6).toSeq === Seq(0, 3, 1, 4, 2, 5))
    assert(ordinalsPlacementOrder(12).toSeq === Seq(0, 6, 3, 7, 1, 8, 4, 9, 2, 10, 5, 11))
    assert(ordinalsPlacementOrder(24).toSeq ===
      Seq(0, 12, 6, 13, 3, 14, 7, 15, 1, 16, 8, 17, 4, 18, 9, 19, 2, 20, 10, 21, 5, 22, 11, 23))
    assert(ordinalsPlacementOrder(48).toSeq ===
      Seq(0, 24, 12, 25, 6, 26, 13, 27, 3, 28, 14, 29, 7, 30, 15, 31, 1, 32, 16, 33,
        8, 34, 17, 35, 4, 36, 18, 37, 9, 38, 19, 39, 2, 40, 20, 41, 10, 42, 21, 43,
        5, 44, 22, 45, 11, 46, 23, 47))
  }

  test("property: every token maps to a valid partition") {
    val rnd = new scala.util.Random(42)
    val tokens = Seq(Long.MinValue, Long.MaxValue, 0L, -1L, 1L) ++
      Seq.fill(2000)(rnd.nextLong())
    for (token <- tokens; cs <- Seq(3, 6, 12); rpt <- Seq(1, 4, 8)) {
      val p = partitionForToken(token, cs, rpt)
      assert(p >= 0 && p < cs * rpt, s"token=$token cs=$cs rpt=$rpt -> $p")
    }
  }

  test("property: partition is stable under ring doubling for ring tokens") {
    // existing broker tokens keep their data on scale-up (SURVEY §3.3)
    for (i <- 0 until 3) {
      val t = tokenAtIndex(3, i)
      assert(primaryTokenIndex(t, 6, 4)._1 === 2 * i)
    }
  }
}
