package graft.functions

/**
 * Consistent-hash ring arithmetic of the reference system, re-expressed for
 * Spark partition mapping.
 *
 * Semantics from `/root/reference/internal/types/token.go` (ring of
 * `3*2^n` brokers over the signed 64-bit token space, each broker token
 * subdivided into `rangesPerToken` consumer ranges) and
 * `/root/reference/internal/types/placement_order.go` (interleaved broker
 * placement order on scale-up).
 *
 * In the Spark engine a "partition" is `(brokerIndex, rangeIndex)` flattened
 * to `brokerIndex * rangesPerToken + rangeIndex`; the shuffle on this value
 * is the router (reference's leader routing, SURVEY.md §2 A3).
 */
object TokenMath {
  final val StartToken: Long = Long.MinValue
  /** 3 * 2^12 — max ring size (`token.go:32`). */
  final val MaxRingSize: Int = 12288
  /** floor(maxUint64 / 12288) as the Go untyped-const division yields. */
  final val ChunkSizeUnit: Long = java.lang.Long.divideUnsigned(-1L, MaxRingSize.toLong)

  def ringFactor(ringSize: Int): Long = (MaxRingSize / ringSize).toLong

  /** Token owned by broker `index` in a ring of `length` brokers; wraps. */
  def tokenAtIndex(length: Int, index: Int): Long = {
    val i = index % length
    StartToken + ChunkSizeUnit * ringFactor(length) * i.toLong
  }

  /** (brokerIndex, rangeIndex) owning `token` — the placement function
    * (`token.go:49-66`). */
  def primaryTokenIndex(token: Long, clusterSize: Int, rangesPerToken: Int): (Int, Int) = {
    if (clusterSize == 1) {
      // dev-mode single broker: the general formula's rangeSize
      // (ChunkSizeUnit · ringFactor(1)) wraps past 2^64 and goes negative —
      // placement must use the same float64-stepped even split as the
      // consume ranges (rangeDevMode), or produce computes a negative
      // partition id. Walk the (≤ rangesPerToken) range bounds instead.
      var i = 0
      while (i < rangesPerToken - 1 && token >= rangeDevMode(i, rangesPerToken)._2) i += 1
      return (0, i)
    }
    // sort.Search: smallest i in [0, clusterSize) with tokenAtIndex(i) > token
    var lo = 0
    var hi = clusterSize
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (tokenAtIndex(clusterSize, mid) > token) hi = mid else lo = mid + 1
    }
    val index = lo - 1
    val rangeSize = ChunkSizeUnit * ringFactor(clusterSize) / rangesPerToken.toLong
    val diff = token - tokenAtIndex(clusterSize, index)
    val tokenDiff = if (diff < 0) -diff else diff
    var rangeIndex = (tokenDiff / rangeSize).toInt
    // the last range is slightly larger than rangeSize * rangesPerToken
    if (rangeIndex >= rangesPerToken) rangeIndex = 0
    (index, rangeIndex)
  }

  /** Flat Spark partition id for a key hash. */
  def partitionForToken(token: Long, clusterSize: Int, rangesPerToken: Int): Int = {
    val (b, r) = primaryTokenIndex(token, clusterSize, rangesPerToken)
    b * rangesPerToken + r
  }

  /** [start, end) of a consumer range (`token.go:87-116`); end of the last
    * range of the last broker is MaxValue. */
  def rangeByTokenAndClusterSize(
      token: Long, index: Int, rangesPerToken: Int, clusterSize: Int): (Long, Long) = {
    val rangeSize = ChunkSizeUnit * (ringFactor(clusterSize) / rangesPerToken.toLong)
    if (clusterSize == 1) return rangeDevMode(index, rangesPerToken)
    val start = token + rangeSize * index.toLong
    val end =
      if (index < rangesPerToken - 1) token + rangeSize * (index + 1).toLong
      else {
        // smallest i with tokenAtIndex(i) >= token, then the next ring token
        var lo = 0
        var hi = clusterSize
        while (lo < hi) {
          val mid = (lo + hi) >>> 1
          if (tokenAtIndex(clusterSize, mid) >= token) hi = mid else lo = mid + 1
        }
        require(lo < clusterSize, s"Invalid token $token when mapping to ranges")
        val next = tokenAtIndex(clusterSize, lo + 1)
        if (next == StartToken) Long.MaxValue else next
      }
    (start, end)
  }

  private def rangeDevMode(index: Int, rangesPerToken: Int): (Long, Long) = {
    if (rangesPerToken == 1) return (StartToken, Long.MaxValue)
    // single-broker clusters: split the whole space evenly (token.go:118-131);
    // the reference computes the step in float64 — reproduce that exactly.
    val rangeSize = Long.MaxValue.toDouble * (2.0 / rangesPerToken.toDouble)
    val step = rangeSize.toLong
    val start = StartToken + step * index.toLong
    val end =
      if (index < rangesPerToken - 1) StartToken + step * (index + 1).toLong
      else Long.MaxValue
    (start, end)
  }

  /** Whether [startA,endA) and [startB,endB) intersect (`token.go:165-179`). */
  def intersects(startA: Long, endA: Long, startB: Long, endB: Long): Boolean = {
    var min = endA
    var max = startB
    if (startA >= startB) { min = endB; max = startA }
    if (min == Long.MaxValue) min >= max else min > max
  }

  private val Ring6 = Array(0, 3, 1, 4, 2, 5)

  /** Interleaved broker ordinal placement for ring growth
    * (`placement_order.go:8-50`): brokers added on scale-up slot between the
    * existing ones so existing tokens never move. */
  def ordinalsPlacementOrder(size: Int): Array[Int] = {
    require(validRingLength(size), s"ring size must be 3*2^n, got $size")
    if (size == 3) return Array(0, 1, 2)
    if (size == 6) return Ring6.clone()
    val exponent = java.lang.Integer.numberOfTrailingZeros(size / 3)
    val lastPow2 = 1 << (exponent - 1)
    val lastStartIndex = size / 2 // 3 * 2^(exponent-1)
    val out = new Array[Int](size)
    var i = 0
    while (i < size) {
      if (i % 2 == 1) out(i) = lastStartIndex + i / 2
      else if (i % lastPow2 == 0) out(i) = Ring6(i / lastPow2)
      else {
        var j = 1
        while (j <= exponent - 2) {
          val e = exponent - j
          val step = 1 << e
          if (i % step == (1 << (e - 1))) out(i) = 3 * (1 << j) + i / step
          j += 1
        }
      }
      i += 1
    }
    out
  }

  /** Ranges of a `newClusterSize` ring intersecting range `(token, index)`
    * of a `clusterSize` ring (`token.go:133-163` ProjectRangeByClusterSize) —
    * the arithmetic behind scale-up/down offset projection (SURVEY §2 A22). */
  def projectRangeByClusterSize(
      token: Long, index: Int, rangesPerToken: Int,
      clusterSize: Int, newClusterSize: Int): Seq[(Long, Seq[Int])] = {
    val (start, end) = rangeByTokenAndClusterSize(token, index, rangesPerToken, clusterSize)
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Seq[Int])]
    for (i <- 0 until newClusterSize) {
      val newToken = tokenAtIndex(newClusterSize, i)
      val indices = (0 until rangesPerToken).filter { newIndex =>
        val (ns, ne) = rangeByTokenAndClusterSize(newToken, newIndex, rangesPerToken, newClusterSize)
        intersects(start, end, ns, ne)
      }
      if (indices.nonEmpty) out += newToken -> indices
    }
    out.toSeq
  }

  def validRingLength(size: Int): Boolean = {
    var s = size
    if (s < 3 || s % 3 != 0) return false
    s /= 3
    (s & (s - 1)) == 0
  }
}
