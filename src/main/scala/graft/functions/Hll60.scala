package graft.functions

import java.math.BigInteger

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types._

/**
 * `hll60(hash) -> long` — HyperLogLog distinct-count estimate over
 * pre-hashed 60-bit values ([[graft.operators.Dedup.md5Hash60]] — callers
 * hash first so the hash family stays engine-neutral).
 *
 * Layout: p = 12 ⇒ m = 4096 registers; bucket = low 12 bits; rank ρ =
 * 1 + (index of lowest set bit of the remaining 48 bits), 49 when they are
 * all zero. The register array is the classic mergeable HLL state — update
 * is max-per-register, merge is element-wise max, so partial aggregation
 * (map-side combine) works and the shuffled state is 4 KiB per group
 * regardless of input size: the property that makes this the right
 * distinct-count operator at 100 TB.
 *
 * The estimator is the raw-HLL formula evaluated in INTEGER arithmetic:
 * with S = Σ_j 2^(49-M_j) (an integer ≤ 2^61),
 * E = α_m·m²·2^49/S = 7213·m³·2^49 / (10·(1000m+1079)·S), taken as a floor
 * division. No floating point ⇒ bit-identical replay in any engine with
 * 128-bit integers (the DuckDB oracle uses HUGEINT). The small/large-range
 * corrections of the HLL paper are deliberately omitted — this engine
 * defines its estimator as the raw formula (documented, deterministic).
 */
case class Hll60(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Byte]] with UnaryLike[Expression] {

  import Hll60._

  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def prettyName: String = "hll60"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"hll60 requires a long (pre-hashed) input, got ${other.catalogString}")
  }

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](M)

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) {
      // mask to the declared 60-bit domain: a wider hash (e.g. xxhash64)
      // would otherwise yield rho > MaxRho and overflow the register sum
      val h = v.asInstanceOf[Long] & InputMask
      val bucket = (h & (M - 1)).toInt
      val w = h >>> P
      val rho: Byte =
        if (w == 0L) MaxRho else (java.lang.Long.numberOfTrailingZeros(w) + 1).toByte
      if (rho > buf(bucket)) buf(bucket) = rho
    }
    buf
  }

  override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < M) { if (b(i) > a(i)) a(i) = b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Byte]): Any = {
    var s = 0L // Σ 2^(49-M_j) ≤ 4096·2^49 = 2^61 — fits a long
    var i = 0
    while (i < M) { s += 1L << (MaxRho - buf(i)); i += 1 }
    Numerator.divide(BigInteger.valueOf(DenFactor).multiply(BigInteger.valueOf(s)))
      .longValueExact()
  }

  override def serialize(buf: Array[Byte]): Array[Byte] = buf
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def withNewMutableAggBufferOffset(newOffset: Int): Hll60 =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): Hll60 =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(c: Expression): Hll60 = copy(child = c)
}

object Hll60 {
  val P = 12
  val M: Int = 1 << P
  /** Inputs are 60-bit hashes; higher bits are ignored. */
  val InputMask: Long = (1L << 60) - 1
  val MaxRho: Byte = (60 - P + 1).toByte // 49
  /** 7213·m³·2^49 (α numerator scaled integer; see class doc). */
  val Numerator: BigInteger =
    BigInteger.valueOf(7213).multiply(BigInteger.ONE.shiftLeft(3 * P + 49))
  /** 10·(1000m + 1079). */
  val DenFactor: Long = 10L * (1000L * M + 1079L)
}
