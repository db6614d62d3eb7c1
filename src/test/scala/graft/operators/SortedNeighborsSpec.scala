package graft.operators

import graft.GraftSession
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** The sorted-neighborhood invariant the oracle can't see: positions (and
  * therefore the candidate set) are a pure function of the (key, id) total
  * order, not of partition layout, and the candidate count is exactly
  * window·n bounded even when one block is hot. */
class SortedNeighborsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = GraftSession.builder(master = "local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")

  test("pair set is identical under any input partitioning") {
    def run(parts: Int): Set[(Long, Long, Double)] =
      Dedup.sortedNeighborPairs(docs.repartition(parts), "text", "doc_id")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val one = run(1)
    assert(one.nonEmpty)
    assert(one === run(13))
  }

  test("a hot block still yields exactly window comparisons per row") {
    val s = spark
    import s.implicits._
    // 50 identical texts: naive blocking would compare all pairs (1225);
    // SNM's window bound keeps it at window·(n-1) - (w-1)w/2 adjacent pairs
    val hot = (0L until 50L).map(i => (i, "identical text block"))
      .toDF("doc_id", "text")
    val pairs = Dedup.sortedNeighborPairs(hot, "text", "doc_id",
      window = 5, threshold = 0.0)
    // rows 0..44 contribute 5 pairs each, the last 5 rows fewer: 45*5 + 4+3+2+1
    assert(pairs.count() === 45 * 5 + 10)
    // all identical: similarity exactly 1.0
    assert(pairs.agg(min(col("sim"))).head().getDouble(0) === 1.0)
  }
}
