package graft.operators

import graft.GraftSession
import graft.functions.ZOrder
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

class ZOrderSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = GraftSession.builder(master = "local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("interleave: golden values and bit placement") {
    assert(ZOrder.interleave(0L, 0L) === 0L)
    assert(ZOrder.interleave(1L, 0L) === 1L)            // a -> even bits
    assert(ZOrder.interleave(0L, 1L) === 2L)            // b -> odd bits
    assert(ZOrder.interleave(0xFFFFFFFFL, 0L) === 0x5555555555555555L)
    assert(ZOrder.interleave(0L, 0xFFFFFFFFL) === 0xAAAAAAAAAAAAAAAAL)
    // 0b1010 and 0b0101 interleave to 0b01100110
    assert(ZOrder.interleave(0xAL, 0x5L) === 0x66L)
    // only the low 32 bits participate
    assert(ZOrder.interleave(1L << 32, 1L << 32) === 0L)
    // monotone within a quadrant: (a,b) and (a+1,b) differ only in even bits
    val base = ZOrder.interleave(6L, 9L)
    assert((ZOrder.interleave(7L, 9L) ^ base) === (ZOrder.spread(6L ^ 7L)))
  }

  test("zorderLayout narrows per-file spans on BOTH dims vs one-column sort") {
    val sp = spark; import sp.implicits._
    // a 64x64 grid: every (x, y) cell once, shuffled arrival order
    val grid = (0 until 64).flatMap(x => (0 until 64).map(y => (x.toLong, y.toLong)))
    val df = scala.util.Random.shuffle(grid).toDF("x", "y")

    def meanSpans(laid: org.apache.spark.sql.DataFrame): (Double, Double) = {
      val spans = laid
        .withColumn("__p", spark_partition_id())
        .groupBy("__p")
        .agg((max("x") - min("x")).as("sx"), (max("y") - min("y")).as("sy"))
        .collect().map(r => (r.getLong(1).toDouble, r.getLong(2).toDouble))
      (spans.map(_._1).sum / spans.length, spans.map(_._2).sum / spans.length)
    }

    val (zx, zy) = meanSpans(
      Bucketing.zorderLayout(df, col("x"), col("y"), numFiles = 16))
    val (_, xy) = meanSpans(
      df.repartitionByRange(16, col("x")).sortWithinPartitions(col("x")))

    // one-column sort: each range file spans ~4 x-values but ALL 64 y-values
    assert(xy > 60.0, s"x-sorted layout should not bound y (span $xy)")
    // z-order bounds both dims: 16 files over a 64x64 grid -> each file is
    // a contiguous curve segment covering a fraction of each axis
    assert(zx <= 40.0, s"z-order x span $zx")
    assert(zy <= 40.0, s"z-order y span $zy")
  }
}
