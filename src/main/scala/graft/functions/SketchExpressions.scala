package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Sketch kernels for the training-data pipeline operators (dedup /
 * similarity), as codegen'd Catalyst expressions so they run inside
 * whole-stage codegen over 100 TB:
 *
 *  - [[SimHash64]]: 64-bit SimHash of a token array (Charikar's scheme over
 *    murmur3-hashed tokens) — near-dup fingerprinting, hamming distance ≤ k
 *    banding via 16-bit chunks;
 *  - [[HyperplaneLsh]]: sign-random-projection bucket of an embedding
 *    (Goemans–Williamson style random hyperplanes, planes derived
 *    deterministically from murmur3 so every executor agrees without
 *    shipping plane matrices);
 *  - [[RollingFingerprint]]: Karp–Rabin polynomial rolling hash of a
 *    document — order-sensitive content fingerprint.
 */
object Sketches {

  private val Whitespace = java.util.regex.Pattern.compile("\\s+")

  /** Distinct, binary-sorted k-word shingles of a document — byte-identical
    * to `sort_array(array_distinct(transform(...)))` over
    * `filter(split(lower(text),"\\s+"), len>0)` (the declarative form it
    * replaces), but ONE tight pass per row instead of five interpreted
    * higher-order functions: tokenization and shingle assembly dominate
    * every n-gram operator's runtime (dedup, decontamination), so this is
    * the kernel worth hand-writing. Fewer than k tokens collapse to a
    * single whole-text shingle ("" for an empty document — kept so empty
    * docs pair with empty docs, mirrored by the oracles). */
  def wordShingles(s: UTF8String, k: Int): ArrayData = {
    val tokens0 = Whitespace.split(s.toLowerCase.toString, -1)
    var n = 0
    var i = 0
    while (i < tokens0.length) { // compact non-empty tokens in place
      if (!tokens0(i).isEmpty) { tokens0(n) = tokens0(i); n += 1 }
      i += 1
    }
    if (n < k) {
      val sb = new java.lang.StringBuilder
      i = 0
      while (i < n) {
        if (i > 0) sb.append(' ')
        sb.append(tokens0(i))
        i += 1
      }
      return new GenericArrayData(Array[Any](UTF8String.fromString(sb.toString)))
    }
    // TreeSet on UTF8String natural order = unsigned byte order, exactly
    // sort_array's ordering for string elements
    val set = new java.util.TreeSet[UTF8String]()
    val sb = new java.lang.StringBuilder
    i = 0
    while (i <= n - k) {
      sb.setLength(0)
      var j = 0
      while (j < k) {
        if (j > 0) sb.append(' ')
        sb.append(tokens0(i + j))
        j += 1
      }
      set.add(UTF8String.fromString(sb.toString))
      i += 1
    }
    val out = new Array[Any](set.size)
    val it = set.iterator()
    i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    new GenericArrayData(out)
  }

  /** In-order word n-grams with DUPLICATES PRESERVED (LM counting) — the
    * non-distinct sibling of [[wordShingles]]. One tokenize per row (the
    * declarative `transform(sequence, i -> element_at(toks, i))` chain
    * re-evaluates the tokenizer per element after project-collapse —
    * measured 10× the single-pass cost on the bigram scorer at sf0.1).
    * Fewer than k tokens yield an EMPTY array (no sentinel). */
  def wordNgrams(s: UTF8String, k: Int): ArrayData = {
    val tokens0 = Whitespace.split(s.toLowerCase.toString, -1)
    var n = 0
    var i = 0
    while (i < tokens0.length) {
      if (!tokens0(i).isEmpty) { tokens0(n) = tokens0(i); n += 1 }
      i += 1
    }
    if (n < k) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](n - k + 1)
    val sb = new java.lang.StringBuilder
    i = 0
    while (i <= n - k) {
      sb.setLength(0)
      var j = 0
      while (j < k) {
        if (j > 0) sb.append(' ')
        sb.append(tokens0(i + j))
        j += 1
      }
      out(i) = UTF8String.fromString(sb.toString)
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Dot product of two numeric arrays in ONE tight loop, bit-identical to
    * the declarative `aggregate(zip_with(a, b, (x,y) -> x*y), 0.0, +)`
    * fold it replaces (same left-to-right IEEE accumulation): that chain
    * allocates a zipped array and runs two interpreted higher-order
    * functions PER PAIR — measured ~5× the kernel cost on bucket-join
    * similarity operators. Mirrors zip_with's null semantics: any null
    * element or a length mismatch yields null (boxed Double). */
  def dotProd(a: ArrayData, b: ArrayData, aF: Boolean, bF: Boolean): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var s = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = if (aF) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bF) b.getFloat(i).toDouble else b.getDouble(i)
      s += x * y
      i += 1
    }
    s
  }

  /** Integer squared L2 distance over two `array<bigint>` — the quantized
    * k-means assignment kernel. All-integer, so bit-identical to the
    * `aggregate(zip_with(...))` fold it replaces under ANY evaluation
    * order (unlike the float kernels, where only matching left-to-right
    * accumulation preserves hashes). */
  def l2sqLong(a: ArrayData, b: ArrayData): java.lang.Long = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var s = 0L
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val d = a.getLong(i) - b.getLong(i)
      s += d * d
      i += 1
    }
    s
  }

  /** Cosine similarity in one pass (dot + both norms in the same loop),
    * bit-identical to `dot(a,b) / (sqrt(dot(a,a)) * sqrt(dot(b,b)))` over
    * the fold above. */
  def cosineSim(a: ArrayData, b: ArrayData, aF: Boolean, bF: Boolean): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var d = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = if (aF) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bF) b.getFloat(i).toDouble else b.getDouble(i)
      d += x * y
      na += x * x
      nb += y * y
      i += 1
    }
    d / (math.sqrt(na) * math.sqrt(nb))
  }

  /** SimHash over token murmur hashes: bit b of the result is the sign of
    * sum over tokens of ±1 depending on bit b of murmur3(token). */
  def simhash64(tokens: ArrayData): Long = {
    val counts = new Array[Int](64)
    var i = 0
    val n = tokens.numElements()
    while (i < n) {
      if (!tokens.isNullAt(i)) {
        val h = Murmur3.hashUtf8(tokens.getUTF8String(i))
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (counts(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }

  /** Deterministic pseudo-random plane weight in [-0.5, 0.5): derived from
    * murmur3(seed, plane, dim) so it is identical on every executor. */
  @inline private def planeWeight(seed: Int, plane: Int, dim: Int): Double = {
    val bytes = new Array[Byte](12)
    writeInt(bytes, 0, seed); writeInt(bytes, 4, plane); writeInt(bytes, 8, dim)
    val h = Murmur3.hash(bytes)
    // top 53 bits -> uniform double in [0,1)
    (h >>> 11).toDouble / (1L << 53).toDouble - 0.5
  }

  @inline private def writeInt(a: Array[Byte], off: Int, v: Int): Unit = {
    a(off) = (v >>> 24).toByte; a(off + 1) = (v >>> 16).toByte
    a(off + 2) = (v >>> 8).toByte; a(off + 3) = v.toByte
  }

  /** Bucket id: bit j = sign of dot(vec, plane_j). Works for float or double
    * element arrays. */
  def hyperplaneLsh(vec: ArrayData, numPlanes: Int, seed: Int, isFloat: Boolean): Long = {
    val n = vec.numElements()
    var bucket = 0L
    var j = 0
    while (j < numPlanes) {
      var dot = 0.0
      var d = 0
      while (d < n) {
        val x = if (isFloat) vec.getFloat(d).toDouble else vec.getDouble(d)
        dot += x * planeWeight(seed, j, d)
        d += 1
      }
      if (dot >= 0) bucket |= (1L << j)
      j += 1
    }
    bucket
  }

  /** Jaccard similarity of two SORTED, DISTINCT string arrays by merge walk:
    * O(n+m) with zero allocation per pair — the hot kernel of pairwise
    * dedup (vs array_intersect's per-pair hash set). Callers must
    * `sort_array(array_distinct(...))` once per row before the join. */
  def sortedJaccard(a: ArrayData, b: ArrayData): Double = {
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0
    var j = 0
    var inter = 0
    var nulls = 0
    // null elements (sort_array places them first) are skipped — a null
    // token is not content to match on
    while (i < na && a.isNullAt(i)) { i += 1; nulls += 1 }
    while (j < nb && b.isNullAt(j)) { j += 1; nulls += 1 }
    while (i < na && j < nb) {
      val c = a.getUTF8String(i).compareTo(b.getUTF8String(j))
      if (c == 0) { inter += 1; i += 1; j += 1 }
      else if (c < 0) i += 1
      else j += 1
    }
    val union = na + nb - nulls - inter
    if (union == 0) 0.0 else inter.toDouble / union.toDouble
  }

  private val md5Local = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** The engine-neutral 60-bit content hash: the value of the first 15 hex
    * chars of md5 (== bytes 0..6 plus the high nibble of byte 7). Identical
    * to `conv(substr(md5(x), 1, 15), 16, 10)` but one digest + shift instead
    * of a hex round-trip — the hot kernel under minhash/simhash/HLL. */
  def md5Hash60(bytes: Array[Byte]): Long = {
    val d = md5Local.get()
    d.reset()
    val h = d.digest(bytes)
    var v = 0L
    var i = 0
    while (i < 7) { v = (v << 8) | (h(i) & 0xffL); i += 1 }
    (v << 4) | ((h(7) >> 4) & 0xfL)
  }

  def md5Hash60Utf8(s: UTF8String): Long = md5Hash60(s.getBytes)

  /** Winnowing fingerprint set (Schleimer–Wilkerson–Aiken 2003): md5-60
    * hashes of the k-char grams, sliding w-window minimum with the
    * RIGHTMOST tie win (robust winnowing), distinct winners. One pass:
    * a monotonic deque gives O(grams) total window-min work, vs the
    * declarative slice+array_min formulation's O(grams·w) interpreted
    * lambdas and per-window allocations (measured 86 s → sub-second on
    * the stream_winnow corpus at sf0.1). Char-offset walk keeps gram
    * boundaries code-point-exact, matching `substring(text, i, k)`.
    * Fewer than k+w−1 chars → empty array. */
  def winnowFpSet(s: UTF8String, k: Int, w: Int): ArrayData = {
    val bytes = s.getBytes
    val nBytes = bytes.length
    val offs = new Array[Int](nBytes + 1)
    var nChars = 0
    var i = 0
    while (i < nBytes) {
      offs(nChars) = i
      val b = bytes(i) & 0xff
      i += (if (b < 0x80) 1 else if (b < 0xe0) 2 else if (b < 0xf0) 3 else 4)
      nChars += 1
    }
    offs(nChars) = nBytes
    if (nChars < k + w - 1) return new GenericArrayData(Array.empty[Any])
    val g = nChars - k + 1
    val h = new Array[Long](g)
    val d = md5Local.get()
    var gi = 0
    while (gi < g) {
      d.reset()
      d.update(bytes, offs(gi), offs(gi + k) - offs(gi))
      val dig = d.digest()
      var v = 0L
      var j = 0
      while (j < 7) { v = (v << 8) | (dig(j) & 0xffL); j += 1 }
      h(gi) = (v << 4) | ((dig(7) >> 4) & 0xfL)
      gi += 1
    }
    // deque of indices, h strictly increasing front→back; pushing pops
    // every back with h ≥ h(j), so the surviving minimum is the rightmost
    val deque = new Array[Int](g)
    var head = 0
    var tail = 0
    val set = new java.util.LinkedHashSet[java.lang.Long]()
    var j = 0
    while (j < g) {
      while (tail > head && h(deque(tail - 1)) >= h(j)) tail -= 1
      deque(tail) = j
      tail += 1
      val lo = j - w + 1
      while (deque(head) < lo) head += 1
      if (j >= w - 1) set.add(h(deque(head)))
      j += 1
    }
    val out = new Array[Any](set.size)
    val it = set.iterator()
    i = 0
    while (it.hasNext) { out(i) = it.next().longValue(); i += 1 }
    new GenericArrayData(out)
  }

  /** 60-bit SimHash over [[md5Hash60]] token hashes — the native kernel
    * behind `md5_simhash60` (bit-identical to the higher-order-function
    * formulation, ~100× less allocation: one digest + 60 counter updates
    * per token inside one generated loop). */
  def md5Simhash60(tokens: ArrayData): Long = {
    val counts = new Array[Int](60)
    var i = 0
    val n = tokens.numElements()
    while (i < n) {
      if (!tokens.isNullAt(i)) {
        val h = md5Hash60Utf8(tokens.getUTF8String(i))
        var b = 0
        while (b < 60) {
          if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 60) {
      if (counts(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }

  /** All minhash lanes in one pass: out(i) = min over hashes of (h XOR
    * seeds(i)); empty input yields Long.MaxValue lanes (no shingles). */
  def xorMinhash(hashes: ArrayData, seeds: Array[Long]): org.apache.spark.sql.catalyst.util.GenericArrayData = {
    val out = Array.fill(seeds.length)(Long.MaxValue)
    var i = 0
    val n = hashes.numElements()
    while (i < n) {
      if (!hashes.isNullAt(i)) {
        val h = hashes.getLong(i)
        var s = 0
        while (s < seeds.length) {
          val v = h ^ seeds(s)
          if (v < out(s)) out(s) = v
          s += 1
        }
      }
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /** Karp–Rabin polynomial rolling hash over UTF-8 bytes, base 257 mod 2^64
    * (wraps) — an order-sensitive document fingerprint. */
  def rollingFingerprint(s: UTF8String): Long = {
    val bytes = s.getBytes
    var h = 0L
    var i = 0
    while (i < bytes.length) {
      h = h * 257L + (bytes(i) & 0xffL) + 1L
      i += 1
    }
    h
  }
}

/** `word_shingles(string, k) -> array<string>` — distinct sorted k-word
  * shingles in one codegen'd pass (see [[Sketches.wordShingles]]). */
case class WordShingles(child: Expression, k: Int) extends UnaryExpression {
  require(k >= 1, s"word_shingles needs k >= 1, got $k")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "word_shingles"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"word_shingles requires string input, got ${other.catalogString}")
  }
  override def nullSafeEval(v: Any): Any =
    Sketches.wordShingles(v.asInstanceOf[UTF8String], k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Sketches.wordShingles($c, $k)")
  override protected def withNewChildInternal(c: Expression): WordShingles = copy(child = c)
}

/** Shared typing for the vector kernels: both children must be arrays of
  * float or double; element width is resolved at analysis time and baked
  * into the generated call. */
sealed trait VecBinaryExpression extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  protected def floatElem(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType | DoubleType, _), ArrayType(FloatType | DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two array<float|double> inputs, got $other")
    }
  protected def kernel: String
  override def nullSafeEval(a: Any, b: Any): Any = null // overridden
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (c1, c2) => s"""
      java.lang.Double r$$ = graft.functions.Sketches.$kernel(
        $c1, $c2, ${floatElem(left)}, ${floatElem(right)});
      if (r$$ == null) { ${ev.isNull} = true; } else { ${ev.value} = r$$.doubleValue(); }
    """)
}

/** `vec_dot(array, array) -> double` — one-pass dot product (see
  * [[Sketches.dotProd]]). */
case class VecDot(left: Expression, right: Expression) extends VecBinaryExpression {
  override def prettyName: String = "vec_dot"
  override protected def kernel: String = "dotProd"
  override def nullSafeEval(a: Any, b: Any): Any =
    Sketches.dotProd(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      floatElem(left), floatElem(right))
  override protected def withNewChildrenInternal(l: Expression, r: Expression): VecDot =
    copy(left = l, right = r)
}

/** `vec_l2sq_long(array<bigint>, array<bigint>) -> bigint` — integer
  * squared L2 distance (see [[Sketches.l2sqLong]]). */
case class VecL2SqLong(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "vec_l2sq_long"
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"vec_l2sq_long requires two array<bigint> inputs, got $other")
    }
  override def nullSafeEval(a: Any, b: Any): Any =
    Sketches.l2sqLong(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (c1, c2) => s"""
      java.lang.Long r$$ = graft.functions.Sketches.l2sqLong($c1, $c2);
      if (r$$ == null) { ${ev.isNull} = true; } else { ${ev.value} = r$$.longValue(); }
    """)
  override protected def withNewChildrenInternal(l: Expression, r: Expression): VecL2SqLong =
    copy(left = l, right = r)
}

/** `vec_cosine(array, array) -> double` — one-pass cosine similarity (see
  * [[Sketches.cosineSim]]). */
case class VecCosine(left: Expression, right: Expression) extends VecBinaryExpression {
  override def prettyName: String = "vec_cosine"
  override protected def kernel: String = "cosineSim"
  override def nullSafeEval(a: Any, b: Any): Any =
    Sketches.cosineSim(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      floatElem(left), floatElem(right))
  override protected def withNewChildrenInternal(l: Expression, r: Expression): VecCosine =
    copy(left = l, right = r)
}

/** `word_ngrams(string, k) -> array<string>` — in-order k-word n-grams with
  * duplicates preserved, one codegen'd pass (see [[Sketches.wordNgrams]]). */
case class WordNgrams(child: Expression, k: Int) extends UnaryExpression {
  require(k >= 1, s"word_ngrams needs k >= 1, got $k")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "word_ngrams"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"word_ngrams requires string input, got ${other.catalogString}")
  }
  override def nullSafeEval(v: Any): Any =
    Sketches.wordNgrams(v.asInstanceOf[UTF8String], k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Sketches.wordNgrams($c, $k)")
  override protected def withNewChildInternal(c: Expression): WordNgrams = copy(child = c)
}

/** `winnow_fp_set(string, k, w) -> array<long>` — per-row winnowing
  * fingerprint set, one codegen'd pass (see [[Sketches.winnowFpSet]]). */
case class WinnowFpSet(child: Expression, k: Int, w: Int) extends UnaryExpression {
  require(k >= 1 && w >= 1, s"winnow_fp_set needs k, w >= 1, got k=$k w=$w")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "winnow_fp_set"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"winnow_fp_set requires string input, got ${other.catalogString}")
  }
  override def nullSafeEval(v: Any): Any =
    Sketches.winnowFpSet(v.asInstanceOf[UTF8String], k, w)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Sketches.winnowFpSet($c, $k, $w)")
  override protected def withNewChildInternal(c: Expression): WinnowFpSet = copy(child = c)
}

/** `md5_hash60(string|binary) -> long` — engine-neutral 60-bit content hash
  * (value of the first 15 md5 hex chars; the DuckDB oracle mirrors it). */
case class Md5Hash60(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "md5_hash60"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType | BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"md5_hash60 requires string or binary input, got ${other.catalogString}")
  }
  private def isString = child.dataType.isInstanceOf[StringType]
  override def nullSafeEval(v: Any): Any = v match {
    case s: UTF8String => Sketches.md5Hash60Utf8(s)
    case b: Array[Byte] => Sketches.md5Hash60(b)
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    if (isString) defineCodeGen(ctx, ev, c => s"graft.functions.Sketches.md5Hash60Utf8($c)")
    else defineCodeGen(ctx, ev, c => s"graft.functions.Sketches.md5Hash60($c)")
  override protected def withNewChildInternal(c: Expression): Md5Hash60 = copy(child = c)
}

/** `md5_simhash60(array<string>) -> long` */
case class Md5Simhash60(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "md5_simhash60"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(_: StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"md5_simhash60 requires array<string>, got ${other.catalogString}")
  }
  override def nullSafeEval(v: Any): Any =
    Sketches.md5Simhash60(v.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Sketches.md5Simhash60($c)")
  override protected def withNewChildInternal(c: Expression): Md5Simhash60 = copy(child = c)
}

/** `xor_minhash(array<long>, seeds) -> array<long>` — all minhash signature
  * lanes in ONE pass over the pre-hashed shingles: lane i = min(h XOR
  * seed_i). As separate `array_min(transform(...))` columns Catalyst's
  * project-collapse re-evaluates the md5 child per lane (32× the hash
  * work); this kernel walks the hash array once. */
case class XorMinhash(child: Expression, seeds: Seq[Long]) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "xor_minhash"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"xor_minhash requires array<long>, got ${other.catalogString}")
  }
  @transient private lazy val seedArr: Array[Long] = seeds.toArray
  override def nullSafeEval(v: Any): Any =
    Sketches.xorMinhash(v.asInstanceOf[ArrayData], seedArr)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("seeds", seedArr, "long[]")
    defineCodeGen(ctx, ev, c => s"graft.functions.Sketches.xorMinhash($c, $ref)")
  }
  override protected def withNewChildInternal(c: Expression): XorMinhash = copy(child = c)
}

/** `simhash64(array<string>) -> long` */
case class SimHash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "simhash64"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(_: StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"simhash64 requires array<string>, got ${other.catalogString}")
  }
  override def nullSafeEval(v: Any): Any =
    Sketches.simhash64(v.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Sketches.simhash64($c)")
  override protected def withNewChildInternal(c: Expression): SimHash64 = copy(child = c)
}

/** `hyperplane_lsh(array<float|double>, numPlanes, seed) -> long` */
case class HyperplaneLsh(child: Expression, numPlanes: Int, seed: Int)
    extends UnaryExpression {
  require(numPlanes > 0 && numPlanes <= 63, "numPlanes must be in [1, 63]")
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "hyperplane_lsh"

  private def isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"hyperplane_lsh requires array<float|double>, got ${other.catalogString}")
  }
  override def nullSafeEval(v: Any): Any =
    Sketches.hyperplaneLsh(v.asInstanceOf[ArrayData], numPlanes, seed, isFloat)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val f = isFloat
    defineCodeGen(ctx, ev,
      c => s"graft.functions.Sketches.hyperplaneLsh($c, $numPlanes, $seed, $f)")
  }
  override protected def withNewChildInternal(c: Expression): HyperplaneLsh = copy(child = c)
}

/** `sorted_jaccard(array<string>, array<string>) -> double` — inputs must be
  * sorted+distinct (see [[Sketches.sortedJaccard]]). */
case class SortedJaccard(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "sorted_jaccard"
  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(_: StringType, _), ArrayType(_: StringType, _)) =>
      TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"sorted_jaccard requires two array<string>, got ${l.catalogString}, ${r.catalogString}")
  }
  override def nullSafeEval(a: Any, b: Any): Any =
    Sketches.sortedJaccard(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.Sketches.sortedJaccard($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): SortedJaccard =
    copy(left = l, right = r)
}

/** `rolling_fingerprint(string) -> long` */
case class RollingFingerprint(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "rolling_fingerprint"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"rolling_fingerprint requires string, got ${other.catalogString}")
  }
  override def nullSafeEval(v: Any): Any =
    Sketches.rollingFingerprint(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Sketches.rollingFingerprint($c)")
  override protected def withNewChildInternal(c: Expression): RollingFingerprint =
    copy(child = c)
}
