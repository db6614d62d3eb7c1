package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/**
 * `polar_frames(binary) -> array<binary>` — splits a framed-records body
 * (`{uint32-BE length}{bytes}` repeated) into one element per frame: the
 * reference's `application/vnd.polar.producer.frames` splitter
 * (`/root/reference/internal/producing/models.go:89-122`, big-endian per
 * `internal/conf/constants.go:56`). A truncated trailing frame raises —
 * mirroring the reference treating short reads as a client error.
 */
object PolarFramesKernel {
  def split(body: Array[Byte]): ArrayData = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    var i = 0
    while (i < body.length) {
      require(i + 4 <= body.length, s"truncated frame header at byte $i")
      val len = ((body(i) & 0xff) << 24) | ((body(i + 1) & 0xff) << 16) |
        ((body(i + 2) & 0xff) << 8) | (body(i + 3) & 0xff)
      i += 4
      require(len >= 0 && i + len <= body.length,
        s"truncated frame body at byte $i (declared $len)")
      out += java.util.Arrays.copyOfRange(body, i, i + len)
      i += len
    }
    new GenericArrayData(out.toArray)
  }
}

case class PolarFrames(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(BinaryType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "polar_frames"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"polar_frames requires binary, got ${other.catalogString}")
  }
  override def nullSafeEval(v: Any): Any =
    PolarFramesKernel.split(v.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.PolarFramesKernel.split($c)")
  override protected def withNewChildInternal(c: Expression): PolarFrames = copy(child = c)
}
