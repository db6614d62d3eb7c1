package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.types.{DataType, LongType}

/** Morton (Z-order) bit interleaving — the space-filling-curve key behind
  * multi-dimensional data clustering (Morton 1966; the layout Delta/Iceberg
  * call Z-ORDER BY). Sorting a table by the interleaved key co-locates rows
  * that are close in BOTH dimensions, so per-file min/max stats prune scans
  * filtered on either column — the 100 TB layout story for two-predicate
  * workloads where a single-column sort only serves one predicate. */
object ZOrder {

  /** Spread the low 32 bits of `x0` to the even bit positions. */
  def spread(x0: Long): Long = {
    var x = x0 & 0xFFFFFFFFL
    x = (x | (x << 16)) & 0x0000FFFF0000FFFFL
    x = (x | (x << 8)) & 0x00FF00FF00FF00FFL
    x = (x | (x << 4)) & 0x0F0F0F0F0F0F0F0FL
    x = (x | (x << 2)) & 0x3333333333333333L
    x = (x | (x << 1)) & 0x5555555555555555L
    x
  }

  /** 64-bit Morton key of two 32-bit values: bit 2i = a's bit i, bit
    * 2i+1 = b's bit i (higher input bits are ignored). */
  def interleave(a: Long, b: Long): Long = spread(a) | (spread(b) << 1)
}

/** `morton2(long, long) -> long` — codegen'd Morton interleave of the two
  * inputs' low 32 bits. */
case class Morton2(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "morton2"
  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (LongType, LongType) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"morton2 requires two longs, got ${l.catalogString}, ${r.catalogString}")
  }
  override def nullSafeEval(a: Any, b: Any): Any =
    ZOrder.interleave(a.asInstanceOf[Long], b.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.ZOrder.interleave($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Morton2 =
    copy(left = l, right = r)
}
