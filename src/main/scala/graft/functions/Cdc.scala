package graft.functions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Content-defined chunking (the rolling-hash cut rule behind storage
 * dedup — Muthitacharoen et al.'s LBFS, SOSP 2001): a cut is placed after
 * byte i whenever the Karp–Rabin hash of the trailing `window` bytes has
 * its low log2(divisor) bits zero. Because the cut decision depends only
 * on LOCAL content, an insertion near the head of a document re-chunks
 * only the neighborhood of the edit — every downstream chunk keeps its
 * identity, which is what makes chunk-level dedup robust where
 * fixed-width blocking is not.
 *
 * Hash arithmetic is the engine's standard base-257 mod-2^64 fold
 * ([[Sketches.rollingFingerprint]]) over UTF-8 bytes: the window hash is
 * maintained incrementally (subtract the outgoing byte times 257^window),
 * and each chunk's identity is the plain fold over its own bytes — both
 * replayed exactly by the oracle in HUGEINT arithmetic (Java long
 * wraparound == mod 2^64 on the unsigned view; the low divisor bits of
 * the signed long equal the unsigned value's, so the cut test agrees).
 */
object Cdc {

  /** 0-based [start, end) chunk ranges of the byte array. */
  private def ranges(bytes: Array[Byte], window: Int, mask: Long): Array[Int] = {
    val n = bytes.length
    var pw = 1L
    var i = 0
    while (i < window) { pw *= 257L; i += 1 }
    val cuts = scala.collection.mutable.ArrayBuffer.empty[Int]
    var h = 0L
    i = 0
    while (i < n) {
      h = h * 257L + (bytes(i) & 0xffL) + 1L
      if (i >= window) h -= ((bytes(i - window) & 0xffL) + 1L) * pw
      if (i >= window - 1 && (h & mask) == 0L) cuts += (i + 1)
      i += 1
    }
    // starts/ends interleaved; drop the empty trailing chunk a cut at the
    // last byte would otherwise produce
    val out = scala.collection.mutable.ArrayBuffer.empty[Int]
    var s = 0
    var c = 0
    while (c < cuts.length) { out += s; out += cuts(c); s = cuts(c); c += 1 }
    if (s < n) { out += s; out += n }
    out.toArray
  }

  private def fold(bytes: Array[Byte], s: Int, e: Int): Long = {
    var h = 0L
    var i = s
    while (i < e) { h = h * 257L + (bytes(i) & 0xffL) + 1L; i += 1 }
    h
  }

  def chunkFps(u: UTF8String, window: Int, mask: Long): ArrayData = {
    val bytes = u.getBytes
    val r = ranges(bytes, window, mask)
    val out = new Array[Long](r.length / 2)
    var i = 0
    while (i < out.length) { out(i) = fold(bytes, r(2 * i), r(2 * i + 1)); i += 1 }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  def chunkLens(u: UTF8String, window: Int, mask: Long): ArrayData = {
    val bytes = u.getBytes
    val r = ranges(bytes, window, mask)
    val out = new Array[Long](r.length / 2)
    var i = 0
    while (i < out.length) { out(i) = (r(2 * i + 1) - r(2 * i)).toLong; i += 1 }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  def chunkTexts(u: UTF8String, window: Int, mask: Long): ArrayData = {
    val bytes = u.getBytes
    val r = ranges(bytes, window, mask)
    val out = new Array[Any](r.length / 2)
    var i = 0
    while (i < out.length) {
      out(i) = UTF8String.fromBytes(
        java.util.Arrays.copyOfRange(bytes, r(2 * i), r(2 * i + 1)))
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}

sealed abstract class CdcExpression extends UnaryExpression {
  def window: Int
  def divisor: Int
  // NOTE: validation lives in the case-class bodies, not here — a require
  // in this constructor runs during Java DEserialization on executors
  // before the subclass fields are restored (window reads as 0) and kills
  // the task with InvalidClassException
  protected final def mask: Long = (divisor - 1).toLong
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case _: StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires string input, got ${other.catalogString}")
    }
}

/** `cdc_chunk_fps(string, window, divisor) -> array<long>` — fingerprint
  * of each content-defined chunk, in document order. */
case class CdcChunkFps(child: Expression, window: Int, divisor: Int)
    extends CdcExpression {
  require(window >= 1, s"cdc_chunk_fps needs window >= 1, got $window")
  require(divisor >= 1 && (divisor & (divisor - 1)) == 0,
    s"cdc_chunk_fps needs a power-of-two divisor, got $divisor")
  override def prettyName: String = "cdc_chunk_fps"
  override def nullSafeEval(v: Any): Any =
    Cdc.chunkFps(v.asInstanceOf[UTF8String], window, mask)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Cdc.chunkFps($c, $window, ${mask}L)")
  override protected def withNewChildInternal(c: Expression): CdcChunkFps =
    copy(child = c)
}

/** `cdc_chunk_texts(string, window, divisor) -> array<string>` — the
  * chunks themselves as byte slices, in document order. Cuts are BYTE
  * positions (CDC is a byte-level algorithm), so a slice of multi-byte
  * UTF-8 can land mid-codepoint; concatenating the array always restores
  * the exact original bytes. */
case class CdcChunkTexts(child: Expression, window: Int, divisor: Int)
    extends CdcExpression {
  require(window >= 1, s"cdc_chunk_texts needs window >= 1, got $window")
  require(divisor >= 1 && (divisor & (divisor - 1)) == 0,
    s"cdc_chunk_texts needs a power-of-two divisor, got $divisor")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "cdc_chunk_texts"
  override def nullSafeEval(v: Any): Any =
    Cdc.chunkTexts(v.asInstanceOf[UTF8String], window, mask)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Cdc.chunkTexts($c, $window, ${mask}L)")
  override protected def withNewChildInternal(c: Expression): CdcChunkTexts =
    copy(child = c)
}

/** `cdc_chunk_lens(string, window, divisor) -> array<long>` — byte length
  * of each content-defined chunk, in document order. */
case class CdcChunkLens(child: Expression, window: Int, divisor: Int)
    extends CdcExpression {
  require(window >= 1, s"cdc_chunk_lens needs window >= 1, got $window")
  require(divisor >= 1 && (divisor & (divisor - 1)) == 0,
    s"cdc_chunk_lens needs a power-of-two divisor, got $divisor")
  override def prettyName: String = "cdc_chunk_lens"
  override def nullSafeEval(v: Any): Any =
    Cdc.chunkLens(v.asInstanceOf[UTF8String], window, mask)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Cdc.chunkLens($c, $window, ${mask}L)")
  override protected def withNewChildInternal(c: Expression): CdcChunkLens =
    copy(child = c)
}
