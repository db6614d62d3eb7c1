package graft.queries

import graft.{GraftSession, SparkEntry}
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Every registered query must run and (except known-selective ones) return
  * rows at the smoke scale factor. The value-level check is the DuckDB oracle
  * (tools/check_oracle.py) — this spec is the fast regression net. */
class QueryBatterySpec extends AnyFunSuite with BeforeAndAfterAll {

  private val sfDir = "/root/testdata/sf0.001"
  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = GraftSession.builder(master = "local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  // queries whose predicates can legitimately select zero rows at sf0.001
  private val mayBeEmpty = Set("q_anti_join", "q_except", "q_json_extract",
    "sim_pairs", "dedup_jaccard_pairs", "dedup_char_jaccard",
    "dedup_minhash_lsh", "dedup_simhash")

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name runs at sf0.001") {
      val df = fn(spark, sfDir)
      val n = df.count()
      if (!mayBeEmpty(name)) assert(n > 0, s"$name returned no rows")
    }
  }

  test("every oracle name has a query") {
    val qs = SparkEntry.queries.keySet
    val orphans = SparkEntry.oracleSql.keySet.diff(qs)
    assert(orphans.isEmpty, s"oracles without queries: $orphans")
  }

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
