package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/**
 * Session-hygiene contract: every operator materialization is OWNED — after
 * a query's result is consumed, one `Materialize.sweep` returns the session
 * to a clean slate (empty CacheManager, zero persisted RDD blocks). This is
 * what keeps a 156-query single-JVM bench at fresh-JVM speed; round 5
 * measured a ~5× session-level decay from exactly this state accumulating.
 *
 * The gate list deliberately spans every materializing family: size-gated
 * localCheckpoints (minhash/simhash fingerprints, unit vectors), the CC
 * contraction loop (per-round checkpoints + drop of the superseded round),
 * persisted edge sets (triangles), vocab checkpoints (bigram LM), and a
 * plain no-materialization query as a control.
 */
class MaterializeSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val sfDir = "/root/testdata/sf0.001"
  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = GraftSession.builder(master = "local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def persistedRddCount: Int =
    spark.sparkContext.getPersistentRDDs.size

  private val gates = Seq(
    "q1_agg",               // control: no operator materialization
    "dedup_minhash_lsh",    // size-gated fingerprint checkpoint
    "dedup_simhash",        // size-gated persist/checkpoint dual path
    "dedup_clusters",       // CC: e0/nodes/loop checkpoints + per-round drop
    "dedup_keep",
    "dedup_jaccard_pairs",
    "dedup_char_jaccard",
    "sim_ann_sq8",          // unit-vector materialization
    "sim_ann_pq",
    "sim_ann_ivfpq",
    "text_bigram_lm",       // vocab checkpoint
    "text_logprob",
    "graph_triangles",      // persisted canonical edge set
    "graph_pagerank",
    "text_bm25",
    "pipeline_curate",
    "text_heavy_hitters",
    "dedup_exact",
    "sim_topk_bruteforce",
    "q_window_rank"         // second control
  ).filter(SparkEntry.queries.contains)

  test("gate list resolves against the registry") {
    assert(gates.size >= 15, s"only ${gates.size} of the hygiene gates exist")
  }

  for (name <- gates) {
    test(s"$name leaves a clean session after sweep") {
      SparkEntry.queries(name)(spark, sfDir).count()
      Materialize.sweep(spark)
      assert(spark.sharedState.cacheManager.isEmpty,
        s"$name left CacheManager entries after sweep")
      assert(persistedRddCount == 0,
        s"$name left $persistedRddCount persisted RDDs after sweep")
      assert(Materialize.ownedCount == 0,
        s"$name left ${Materialize.ownedCount} owned registrations after sweep")
    }
  }

  test("20-gate session ends with zero retained blocks") {
    // the aggregate property the bench relies on: nothing accumulates
    // across a long sequence of queries in ONE session
    gates.foreach { name =>
      SparkEntry.queries(name)(spark, sfDir).count()
      Materialize.sweep(spark)
    }
    assert(spark.sharedState.cacheManager.isEmpty)
    assert(persistedRddCount == 0)
  }
}
