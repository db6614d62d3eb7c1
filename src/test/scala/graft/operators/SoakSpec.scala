package graft.operators

import graft.GraftSession
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/**
 * Larger-N soak for the similarity/dedup family: every operator is
 * DESIGNED for scale, but the correctness gates run on small data — this
 * suite runs the family once at sf0.1 (10× the gate rows (the largest generated SF)) and asserts
 * the invariants that would break first under constant-factor surprises:
 * candidate-set blow-ups, bucket skew, distributed-vs-driver divergence,
 * quantization recall collapse.
 */
class SoakSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private val sfDir = "/root/testdata/sf0.1"

  override def beforeAll(): Unit = {
    spark = GraftSession.builder(master = "local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def docs = graft.Tables.documents(spark, sfDir)
  private def embs = graft.Tables.embeddings(spark, sfDir)

  test("soak: minhash LSH candidates stay banded-bounded at the largest SF") {
    val corpus = docs.filter(col("doc_id") % 2 === 0)
    val n = corpus.count()
    assert(n > 2000, s"soak corpus unexpectedly small: $n")
    // 3-gram shingles: the sf0.1 corpus has a tiny vocabulary, so
    // unigram word-SET similarity is a dense predicate (a soak run showed
    // ~24% of ALL pairs above 0.8 — faithful output, but quadratic by
    // definition); trigram sets discriminate, so the pair graph is the
    // sparse near-dup structure the bound below is about
    val pairs = Dedup.md5MinhashLshPairs(corpus, "text", "doc_id",
      shingleK = 3, numHashes = 32, bands = 16, threshold = 0.8)
      .localCheckpoint()
    val nPairs = pairs.count()
    assert(nPairs < 20L * n, s"candidate blow-up: $nPairs pairs for $n docs")
    val bad = pairs.filter(col("id_a") >= col("id_b") ||
      col("sim") < 0.8 || col("sim") > 1.0).count()
    assert(bad === 0L)
    // per-doc pair degree bounded: the hottest doc participates in a
    // bounded neighborhood, not a quadratic bucket's worth
    val maxDeg = pairs.select(explode(array(col("id_a"), col("id_b"))).as("id"))
      .groupBy("id").agg(count(lit(1)).as("d"))
      .agg(max(col("d"))).head().getLong(0)
    assert(maxDeg < 1000L, s"hot doc degree $maxDeg suggests bucket skew")
  }

  test("soak: distributed salted CC equals driver union-find on the real pair graph") {
    val corpus = docs.filter(col("doc_id") % 2 === 0)
    val pairs = Dedup.md5MinhashLshPairs(corpus, "text", "doc_id",
      shingleK = 1, numHashes = 32, bands = 16, threshold = 0.8)
      .localCheckpoint()
    // unigram shingles on purpose: the dense ~750k-edge similarity graph
    // is a REAL large instance for the distributed loop (mega-components,
    // high-degree hubs — exactly what the salted path exists for)
    assert(pairs.count() < 2000000L) // safe to collect as ground truth
    val edges = pairs.collect().map(r => (r.getLong(0), r.getLong(1)))
    val parent = scala.collection.mutable.LongMap.empty[Long]
    def find(x0: Long): Long = {
      var x = x0
      while (parent.getOrElse(x, x) != x) x = parent(x)
      x
    }
    val nodes = scala.collection.mutable.Set.empty[Long]
    edges.foreach { case (a, b) =>
      nodes += a; nodes += b
      val ra = find(a); val rb = find(b)
      if (ra < rb) parent(rb) = ra else if (rb < ra) parent(ra) = rb
    }
    val truth = nodes.iterator.map(x => x -> find(x)).toMap
    val got = Dedup.connectedComponents(pairs, "id_a", "id_b",
        maxIter = 40, smallGraphMaxPairs = 0L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === truth)
  }

  test("soak: simhash banding holds its hamming contract at the largest SF") {
    val corpus = docs.filter(col("doc_id") % 4 === 0)
    val n = corpus.count()
    val pairs = Dedup.md5SimhashPairs(corpus, "text", "doc_id", maxDistance = 8)
      .localCheckpoint()
    val nPairs = pairs.count()
    assert(nPairs < 20L * n, s"simhash pair blow-up: $nPairs for $n docs")
    assert(pairs.filter(col("hamming") > 8 || col("id_a") >= col("id_b"))
      .count() === 0L)
  }

  test("soak: quantized ANN recall survives the largest-SF corpus") {
    val qv = embs.filter(col("vec_id") === 0)
      .head().getAs[scala.collection.Seq[Float]]("embedding").toSeq
    val corpus = embs.filter(col("vec_id") =!= 0)
    assert(corpus.count() > 1500)
    val truth = Similarity.bruteForceTopK(corpus, "embedding", "vec_id", qv, 20)
      .collect().map(_.getLong(0)).toSet
    val sq8 = Similarity.sq8TopK(corpus, "embedding", "vec_id", qv, 20)
      .collect().map(_.getLong(0)).toSet
    val sq8Recall = sq8.intersect(truth).size / 20.0
    assert(sq8Recall >= 0.7, s"sq8 recall collapsed at scale: $sq8Recall")
    val cbs = Similarity.pqSampledCodebooks(corpus, "embedding", "vec_id", 8, 16)
    val pq = Similarity.pqTopK(corpus, "embedding", "vec_id", qv, 20, cbs,
        rerank = 200)
      .collect().map(_.getLong(0)).toSet
    val pqRecall = pq.intersect(truth).size / 20.0
    assert(pqRecall >= 0.5, s"re-ranked PQ recall collapsed at scale: $pqRecall")
  }

  test("soak: LSH bucket occupancy stays balanced at the largest SF") {
    // the data-derived hyperplane family must not degenerate into one
    // mega-bucket (which would quadratically blow up every pair operator
    // built on it)
    val corpus = embs.filter(col("vec_id") =!= 0)
    val n = corpus.count()
    val planes = corpus.select(col("vec_id").as("id"), col("embedding").as("v"))
      .orderBy(col("id")).limit(6)
      .collect().map(_.getAs[scala.collection.Seq[Float]]("v").toSeq)
    val bucket = planes.zipWithIndex.map { case (p, j) =>
      when(Similarity.dot(col("embedding"), typedLit(p)) >= 0, lit(1L << j))
        .otherwise(lit(0L))
    }.reduce(_ + _)
    val occ = corpus.select(bucket.as("b")).groupBy("b")
      .agg(count(lit(1)).as("c"))
      .agg(max(col("c")), count(lit(1))).head()
    val (maxOcc, nBuckets) = (occ.getLong(0), occ.getLong(1))
    assert(nBuckets > 16L, s"only $nBuckets of 64 buckets occupied")
    assert(maxOcc < n / 2, s"mega-bucket: $maxOcc of $n vectors share a bucket")
  }
}
