package graft.functions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Banded (Ukkonen 1985) Levenshtein kernel with a hard distance cap:
 * O(min(|a|,|b|) · max) cells instead of O(|a|·|b|), cells capped at
 * max+1, and the whole computation abandons as soon as every cell of a
 * band row exceeds the cap — which for clearly-different strings happens
 * after ~max rows, not |b|. Semantics match `levenshtein(a, b)` exactly
 * for all pairs with distance ≤ max (codepoint-level, like Spark's and
 * DuckDB's built-ins); -1 otherwise.
 *
 * This is the hot inner loop of the blocked edit-distance dedup join
 * ([[graft.operators.Dedup.editDistancePairs]]); measured ~20× over the
 * built-in 3-arg `levenshtein` on the sf0.1 candidate set (the built-in
 * re-decodes UTF-8 per cell; this kernel decodes each side once).
 */
object EditDistance {

  def bounded(a: UTF8String, b: UTF8String, max: Int): Int = {
    // ASCII fast path (numBytes == numChars ⟺ every char is one byte):
    // run the DP over the raw bytes — no String materialization, no
    // codepoint stream. normalizedContent output is lowercase ASCII, so
    // the dedup join always takes this branch.
    if (a.numBytes == a.numChars && b.numBytes == b.numChars) {
      var s = a.getBytes.map(_.toInt)
      var t = b.getBytes.map(_.toInt)
      boundedArrays(s, t, max)
    } else bounded(a.toString, b.toString, max)
  }

  def bounded(sa: String, sb: String, max: Int): Int =
    boundedArrays(codePointArray(sa), codePointArray(sb), max)

  /** Manual codepoint decode — the java.util.stream path allocates a
    * spliterator + lambda frames per call, measurable at millions of
    * pairs. */
  private[functions] def codePointArray(s: String): Array[Int] = {
    val out = new Array[Int](s.codePointCount(0, s.length))
    var i = 0
    var k = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      out(k) = cp
      k += 1
      i += Character.charCount(cp)
    }
    out
  }

  private def boundedArrays(s0: Array[Int], t0: Array[Int], max: Int): Int = {
    var s = s0
    var t = t0
    // Strip the common prefix and suffix first — edit distance is
    // invariant under both, and on template-heavy corpora (long shared
    // head/tail, edits in the middle) this collapses the DP to the
    // differing span. This is where the blocked-join's surviving pairs
    // spend their time: similar-but-over-threshold docs keep the band's
    // row minimum under the cap for as long as the texts stay aligned.
    var lo = 0
    val minLen = math.min(s.length, t.length)
    while (lo < minLen && s(lo) == t(lo)) lo += 1
    var hiS = s.length
    var hiT = t.length
    while (hiS > lo && hiT > lo && s(hiS - 1) == t(hiT - 1)) { hiS -= 1; hiT -= 1 }
    if (lo > 0 || hiS < s.length) {
      s = java.util.Arrays.copyOfRange(s, lo, hiS)
      t = java.util.Arrays.copyOfRange(t, lo, hiT)
    }
    if (s.length > t.length) { val tmp = s; s = t; t = tmp }
    val n = s.length
    val m = t.length
    if (m - n > max) return -1
    if (n == 0) return if (m <= max) m else -1
    myers(s, t, max)
  }

  /**
   * Myers' bit-parallel edit distance (Myers 1999, with Hyyrö's carry
   * formulation for the multi-word case): each 64-bit word advances 64 DP
   * cells per instruction, so a 300-char pair costs ~1.5k word ops where
   * the banded DP ran ~18k full cells — measured ~10× on the dedup join's
   * surviving pairs. Global (Levenshtein) semantics come from feeding a
   * +1 horizontal delta into block 0 at every text column (first DP row =
   * 0,1,2,…), unlike the paper's approximate-matching form (first row all
   * 0). `score` tracks D[n][i] via the designated bit of the last block;
   * the early exit uses D[n][m] ≥ D[n][i] − (m − i) (row values drop by
   * at most 1 per column). Garbage bits above the pattern's top bit in
   * the last word are harmless: carries and shifts only move information
   * upward. Re-derived from the papers' recurrences (public algorithm;
   * bit-identical to the full DP by property test across caps, lengths
   * crossing the word boundary, and non-ASCII codepoints).
   */
  private def myers(p: Array[Int], t: Array[Int], max: Int): Int = {
    val n = p.length
    val m = t.length
    val w = (n + 63) >>> 6
    val scratch = tlScratch.get()
    val peq = scratch.peq(w, p) // must be built BEFORE stride is read
    val pv = scratch.pv(w)
    val mv = scratch.mv(w)
    java.util.Arrays.fill(pv, -1L)
    java.util.Arrays.fill(mv, 0L)
    var score = n
    val lastMask = 1L << ((n - 1) & 63)
    val stride = scratch.stride
    var i = 0
    while (i < m) {
      val c = t(i)
      // ASCII chars index the flat 128×stride table in place (no copy);
      // non-ASCII text chars read their HashMap slot or all-zeros
      val eqBase = if (c < 128) c * stride else -1
      val eqSlot = if (c < 128) null else scratch.extraOrZero(c, w)
      var phin = 1L // global-distance boundary: top row costs 1 per column
      var mhin = 0L
      var j = 0
      while (j < w) {
        val eqRaw = if (eqBase >= 0) peq(eqBase + j) else eqSlot(j)
        val pvj = pv(j)
        val mvj = mv(j)
        val eqIn = eqRaw | mhin
        val xv = eqRaw | mvj
        val xh = (((eqIn & pvj) + pvj) ^ pvj) | eqIn
        var ph = mvj | ~(xh | pvj)
        var mh = pvj & xh
        if (j == w - 1) {
          if ((ph & lastMask) != 0L) score += 1
          else if ((mh & lastMask) != 0L) score -= 1
        }
        val phOut = (ph >>> 63) & 1L
        val mhOut = (mh >>> 63) & 1L
        ph = (ph << 1) | phin
        mh = (mh << 1) | mhin
        pv(j) = mh | ~(xv | ph)
        mv(j) = ph & xv
        phin = phOut
        mhin = mhOut
        j += 1
      }
      i += 1
      if (score - (m - i) > max) return -1
    }
    if (score <= max) score else -1
  }

  /** Per-thread reusable buffers for [[myers]]: the expression is
    * evaluated once per candidate pair inside the join, and per-pair
    * allocation of the Peq table + state words is the dominant constant
    * at millions of pairs. ASCII codepoints index a flat 128×w table;
    * anything else falls back to a per-call map entry of zeros (a
    * non-ASCII text char can never match an ASCII-only pattern; a
    * non-ASCII PATTERN char gets its own slot). */
  private final class MyersScratch {
    private var pvArr = new Array[Long](8)
    private var mvArr = new Array[Long](8)
    private var peqArr = new Array[Long](128 * 8)
    private var peqW = 8
    private val extra = new java.util.HashMap[Integer, Array[Long]]()
    private var zero = new Array[Long](8)

    def pv(w: Int): Array[Long] = {
      if (pvArr.length < w) pvArr = new Array[Long](w * 2)
      pvArr
    }
    def mv(w: Int): Array[Long] = {
      if (mvArr.length < w) mvArr = new Array[Long](w * 2)
      mvArr
    }
    def stride: Int = peqW
    def peq(w: Int, p: Array[Int]): Array[Long] = {
      if (peqW < w) { peqW = w * 2; peqArr = new Array[Long](128 * peqW) }
      if (zero.length < w) zero = new Array[Long](w * 2)
      java.util.Arrays.fill(peqArr, 0L)
      extra.clear()
      var j = 0
      while (j < p.length) {
        val c = p(j)
        if (c < 128) peqArr(c * peqW + (j >>> 6)) |= 1L << (j & 63)
        else {
          var slot = extra.get(c)
          if (slot == null) { slot = new Array[Long](w); extra.put(c, slot) }
          slot(j >>> 6) |= 1L << (j & 63)
        }
        j += 1
      }
      peqArr
    }
    def extraOrZero(c: Int, w: Int): Array[Long] = {
      val slot = extra.get(c)
      if (slot != null) slot else zero
    }
  }

  private val tlScratch = new ThreadLocal[MyersScratch] {
    override def initialValue(): MyersScratch = new MyersScratch
  }
}

/**
 * q-gram count-filter kernels (Gravano et al., VLDB 2001): a string of
 * codepoint length L has L−q+1 overlapping q-grams, and ONE edit
 * operation destroys at most q of them — so ed(a,b) ≤ d implies the two
 * multisets share ≥ max(|a|,|b|) − q + 1 − q·d q-grams. [[hist]] buckets
 * each doc's q-gram multiset by hash ONCE (hash collisions merge
 * coordinates, which can only INCREASE the pairwise min-sum), and
 * [[minSum]] = Σ min(aᵢ,bᵢ) is therefore an upper bound on the true
 * common-q-gram count: pruning pairs with minSum below the theorem's
 * floor can never drop a pair with ed ≤ d. Unlike character-histogram
 * bounds this filter is SEQUENCE-sensitive — two docs built from the
 * same vocabulary in different order share characters but few 8-grams.
 */
object QGramFilter {

  def hist(u: UTF8String, q: Int, buckets: Int): ArrayData = {
    val cps: Array[Int] =
      if (u.numBytes == u.numChars) {
        val b = u.getBytes
        val out = new Array[Int](b.length)
        var i = 0
        while (i < b.length) { out(i) = b(i).toInt; i += 1 }
        out
      } else EditDistance.codePointArray(u.toString)
    val h = new Array[Int](buckets)
    val n = cps.length - q + 1
    var i = 0
    while (i < n) {
      var k = 0
      var j = 0
      while (j < q) { k = k * 31 + cps(i + j); j += 1 }
      // fmix32 avalanche: raw poly-31 over a ~30-char alphabet clusters
      // badly in the low bits, and every cross-doc collision of DISTINCT
      // grams inflates the min-sum toward the floor — measured at sf0.1:
      // unmixed 10-bit bucketing lost nearly all selectivity (66% of
      // pairs passing vs the exact count's 23%), mixed matches exact
      k ^= k >>> 16; k *= 0x85ebca6b
      k ^= k >>> 13; k *= 0xc2b2ae35
      k ^= k >>> 16
      h(Math.floorMod(k, buckets)) += 1
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(h)
  }

  def minSum(a: ArrayData, b: ArrayData): Long = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0L
    var i = 0
    while (i < n) { s += math.min(a.getInt(i), b.getInt(i)); i += 1 }
    s
  }

  /**
   * Sparse sorted q-gram sketch: one long per DISTINCT q-gram packing
   * `(hash32 << 20) | count`, sorted by packed value. ~L entries for a
   * length-L doc instead of a fixed dense grid — 13× smaller join rows
   * than the 4096-bucket histogram at the dedup gate's median length, and
   * the pairwise bound becomes an O(|a|+|b|) sorted merge instead of a
   * full-grid min-sum. Full 32-bit hashing also collides far less than
   * 12-bit bucketing, so the bound is TIGHTER (still only-overestimates:
   * a collision merges distinct grams, inflating the pairwise min).
   * Counts occupy 20 bits — exact for any document under 1M q-grams
   * (far beyond this operator's domain; the blocked join is for
   * document-sized strings, not books).
   */
  def sketch(u: UTF8String, q: Int): ArrayData = {
    val cps: Array[Int] =
      if (u.numBytes == u.numChars) {
        val b = u.getBytes
        val out = new Array[Int](b.length)
        var i = 0
        while (i < b.length) { out(i) = b(i).toInt; i += 1 }
        out
      } else EditDistance.codePointArray(u.toString)
    val n = cps.length - q + 1
    if (n <= 0) return UnsafeArrayData.fromPrimitiveArray(new Array[Long](0))
    val hs = new Array[Long](n)
    var i = 0
    while (i < n) {
      var k = 0
      var j = 0
      while (j < q) { k = k * 31 + cps(i + j); j += 1 }
      k ^= k >>> 16; k *= 0x85ebca6b
      k ^= k >>> 13; k *= 0xc2b2ae35
      k ^= k >>> 16
      hs(i) = (k & 0xffffffffL) << 20
      i += 1
    }
    java.util.Arrays.sort(hs)
    // run-length encode in place: identical packed hashes are adjacent
    var w = 0
    i = 0
    while (i < n) {
      var run = 1
      while (i + run < n && hs(i + run) == hs(i)) run += 1
      hs(w) = hs(i) | run.toLong
      w += 1
      i += run
    }
    UnsafeArrayData.fromPrimitiveArray(java.util.Arrays.copyOf(hs, w))
  }

  /** Σ min(countA, countB) over matching sketch hashes — the same upper
    * bound as [[minSum]], via sorted merge. */
  def minSumSorted(a: ArrayData, b: ArrayData): Long = {
    val na = a.numElements()
    val nb = b.numElements()
    var s = 0L
    var i = 0
    var j = 0
    while (i < na && j < nb) {
      val x = a.getLong(i)
      val y = b.getLong(j)
      val kx = x >>> 20
      val ky = y >>> 20
      if (kx == ky) {
        s += math.min(x & 0xfffffL, y & 0xfffffL)
        i += 1; j += 1
      } else if (kx < ky) i += 1
      else j += 1
    }
    s
  }
}

/** `char_qgram_hist(string, q, buckets) -> array<int>` — hashed q-gram
  * histogram, computed once per document (see [[QGramFilter.hist]]). */
case class CharQgramHist(child: Expression, q: Int, buckets: Int)
    extends UnaryExpression {
  require(q >= 1 && buckets >= 1, s"char_qgram_hist needs q, buckets >= 1")
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "char_qgram_hist"
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case _: StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"char_qgram_hist requires string input, got ${other.catalogString}")
    }
  override def nullSafeEval(v: Any): Any =
    QGramFilter.hist(v.asInstanceOf[UTF8String], q, buckets)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.QGramFilter.hist($c, $q, $buckets)")
  override protected def withNewChildInternal(c: Expression): CharQgramHist =
    copy(child = c)
}

/** `qgram_common_upper(array<int>, array<int>) -> long` — Σ min(aᵢ,bᵢ),
  * an upper bound on the common-q-gram count of the two docs the
  * histograms came from (see [[QGramFilter.minSum]]). */
case class QgramCommonUpper(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "qgram_common_upper"
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(IntegerType, _), ArrayType(IntegerType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"qgram_common_upper requires two array<int> inputs, got $other")
    }
  override def nullSafeEval(l: Any, r: Any): Any =
    QGramFilter.minSum(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.QGramFilter.minSum($a, $b)")
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): QgramCommonUpper = copy(left = l, right = r)
}

/** `char_qgram_sketch(string, q) -> array<long>` — sparse sorted q-gram
  * sketch, one packed (hash32 << 20 | count) long per distinct q-gram
  * (see [[QGramFilter.sketch]]). */
case class CharQgramSketch(child: Expression, q: Int)
    extends UnaryExpression {
  require(q >= 1, s"char_qgram_sketch needs q >= 1")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "char_qgram_sketch"
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case _: StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"char_qgram_sketch requires string input, got ${other.catalogString}")
    }
  override def nullSafeEval(v: Any): Any =
    QGramFilter.sketch(v.asInstanceOf[UTF8String], q)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.QGramFilter.sketch($c, $q)")
  override protected def withNewChildInternal(c: Expression): CharQgramSketch =
    copy(child = c)
}

/** `qgram_common_upper_sorted(array<long>, array<long>) -> long` — sorted-
  * merge Σ min(countA, countB), an upper bound on the common-q-gram count
  * (see [[QGramFilter.minSumSorted]]). */
case class QgramCommonUpperSorted(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "qgram_common_upper_sorted"
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"qgram_common_upper_sorted requires two array<long> inputs, got $other")
    }
  override def nullSafeEval(l: Any, r: Any): Any =
    QGramFilter.minSumSorted(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.QGramFilter.minSumSorted($a, $b)")
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): QgramCommonUpperSorted = copy(left = l, right = r)
}

/** `levenshtein_bounded(string, string) -> int` — banded early-exit edit
  * distance, -1 above the cap (see [[EditDistance.bounded]]). */
case class LevenshteinBounded(left: Expression, right: Expression, max: Int)
    extends BinaryExpression {
  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "levenshtein_bounded"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (_: StringType, _: StringType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"levenshtein_bounded requires (string, string), got $other")
    }

  override def nullSafeEval(l: Any, r: Any): Any =
    EditDistance.bounded(l.asInstanceOf[UTF8String], r.asInstanceOf[UTF8String], max)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.EditDistance.bounded($a, $b, $max)")

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): LevenshteinBounded = copy(left = l, right = r)
}
