package graft.functions

import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/**
 * Property guard for [[VecOuterSum]]: update/merge over ANY partitioning
 * of the input must equal the brute-force second-moment sums — the
 * covariance oracle depends on exact integer equality, and partial
 * aggregation means the buffer fold order is scheduler-chosen.
 */
class VecOuterSumPropSpec extends AnyFunSuite {

  private def brute(vs: Seq[Array[Long]], dim: Int): Array[Long] = {
    val out = new Array[Long](1 + dim + dim * (dim + 1) / 2)
    vs.foreach { q =>
      out(0) += 1
      var k = 1 + dim
      for (i <- 0 until dim) {
        out(1 + i) += q(i)
        for (j <- i until dim) { out(k) += q(i) * q(j); k += 1 }
      }
    }
    out
  }

  private def viaAgg(vs: Seq[Array[Long]], dim: Int, splits: Int): Array[Long] = {
    val agg = VecOuterSum(
      org.apache.spark.sql.catalyst.expressions.BoundReference(
        0, org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.LongType), nullable = true),
      dim)
    // split into `splits` partitions, update each, merge the partials —
    // then round-trip serialization (what the shuffle does to partials)
    val groups = if (vs.isEmpty) Seq(Seq.empty) else
      vs.grouped(math.max(1, (vs.size + splits - 1) / splits)).toSeq
    val partials = groups.map { g =>
      g.foldLeft(agg.createAggregationBuffer()) { (buf, q) =>
        agg.update(buf,
          org.apache.spark.sql.catalyst.InternalRow(
            new GenericArrayData(q.toArray[Any]): ArrayData))
      }
    }.map(b => agg.deserialize(agg.serialize(b)))
    partials.reduceLeft(agg.merge)
  }

  test("vec_outer_sum equals brute force under any partitioning") {
    val gen = for {
      dim <- Gen.chooseNum(1, 12)
      n <- Gen.chooseNum(0, 40)
      vs <- Gen.listOfN(n, Gen.listOfN(dim, Gen.chooseNum(-2048L, 2048L)))
      splits <- Gen.chooseNum(1, 7)
    } yield (dim, vs.map(_.toArray), splits)
    val p = Prop.forAll(gen) { case (dim, vs, splits) =>
      viaAgg(vs, dim, splits).sameElements(brute(vs, dim))
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), p)
    assert(res.passed, res.toString)
  }

  test("length mismatch fails loudly instead of corrupting the triangle") {
    val agg = VecOuterSum(
      org.apache.spark.sql.catalyst.expressions.BoundReference(
        0, org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.LongType), nullable = true), 4)
    val buf = agg.createAggregationBuffer()
    intercept[IllegalArgumentException] {
      agg.update(buf, org.apache.spark.sql.catalyst.InternalRow(
        new GenericArrayData(Array[Any](1L, 2L, 3L)): ArrayData))
    }
  }
}
