package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/**
 * Average-hash (aHash) perceptual fingerprint of an opaque media payload:
 * fold the bytes into 64 positional cells (`acc(i % 64) += byte`), set bit
 * j iff cell j exceeds the payload mean — the classic thumbnail
 * average-hash rule applied to the byte stream a real decoder would
 * replace with an 8×8 luma grid. Integer-exact (`acc*64 > total` avoids
 * the division), so the oracle replays it bit for bit, and near-identical
 * payloads land within a small hamming distance — which is what makes the
 * banded hamming join over this hash a multimodal near-dup pass.
 */
object MediaHash {
  def ahash64(bytes: Array[Byte]): Long = {
    val acc = new Array[Long](64)
    var total = 0L
    var i = 0
    while (i < bytes.length) {
      val b = bytes(i) & 0xffL
      acc(i % 64) += b
      total += b
      i += 1
    }
    var h = 0L
    var j = 0
    while (j < 64) {
      if (acc(j) * 64L > total) h |= (1L << j)
      j += 1
    }
    h
  }
}

/** `ahash64(binary) -> long` — see [[MediaHash.ahash64]]. */
case class AHash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "ahash64"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"ahash64 requires binary input, got ${other.catalogString}")
  }
  override def nullSafeEval(v: Any): Any =
    MediaHash.ahash64(v.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.MediaHash.ahash64($c)")
  override protected def withNewChildInternal(c: Expression): AHash64 =
    copy(child = c)
}
