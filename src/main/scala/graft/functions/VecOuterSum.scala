package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/**
 * `vec_outer_sum(q, dim) -> array<long>` — one-pass second-moment
 * accumulator over quantized vectors: for an `array<long>` input of length
 * `dim`, the buffer holds `[n, Σq_0 … Σq_{dim-1}, Σq_i·q_j (i ≤ j,
 * row-major upper triangle)]` — `1 + dim + dim(dim+1)/2` longs.
 *
 * This is the covariance/Gram building block at 100 TB scale: update is
 * O(dim²/2) multiply-adds in a tight primitive loop, merge is element-wise
 * add (partial aggregation works, the shuffled state is one ~17 KiB
 * buffer per task at dim=64 REGARDLESS of corpus size), and the integer
 * sums are exact under any fold order. The alternative long-form explode
 * (`dim(dim+1)/2` rows per input vector) multiplies the corpus row count
 * ~2000× through a shuffle — measured 3.2 s vs 0.4 s at sf0.1 — and that
 * ratio only gets worse with corpus size.
 *
 * Inputs must all have length `dim` (mismatch throws — a silent truncate
 * would corrupt the triangle layout); nulls are skipped.
 */
case class VecOuterSum(
    child: Expression,
    dim: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

  require(dim > 0 && dim <= 4096, s"vec_outer_sum dim out of range: $dim")

  private val bufLen = 1 + dim + dim * (dim + 1) / 2

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "vec_outer_sum"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"vec_outer_sum requires array<long> input, got ${other.catalogString}")
  }

  override def createAggregationBuffer(): Array[Long] = new Array[Long](bufLen)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val q = v.asInstanceOf[ArrayData].toLongArray()
      if (q.length != dim)
        throw new IllegalArgumentException(
          s"vec_outer_sum: vector length ${q.length} != dim $dim")
      buf(0) += 1L
      var i = 0
      var k = 1 + dim
      while (i < dim) {
        val qi = q(i)
        buf(1 + i) += qi
        var j = i
        while (j < dim) {
          buf(k) += qi * q(j)
          k += 1
          j += 1
        }
        i += 1
      }
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < bufLen) { a(i) += b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(bufLen * 8)
    bb.asLongBuffer().put(buf)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val out = new Array[Long](bufLen)
    java.nio.ByteBuffer.wrap(bytes).asLongBuffer().get(out)
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): VecOuterSum =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): VecOuterSum =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(c: Expression): VecOuterSum =
    copy(child = c)
}
