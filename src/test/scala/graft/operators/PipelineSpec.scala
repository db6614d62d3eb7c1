package graft.operators

import graft.GraftSession
import graft.functions.GraftFunctions._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Sketch operators validated against their exact counterparts — the checks
  * the DuckDB oracle can't express. */
class PipelineSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private val sfDir = "/root/testdata/sf0.001"

  override def beforeAll(): Unit = {
    spark = GraftSession.builder(master = "local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def docs = graft.Tables.documents(spark, sfDir)
  private def embs = graft.Tables.embeddings(spark, sfDir)

  test("minhash LSH pairs: no false positives (verified) and high recall vs exact") {
    val subset = docs.filter(col("doc_id") % 5 === 0)
    val exact = Dedup.exactJaccardPairs(subset, "text", "doc_id",
      shingleK = 1, threshold = 0.7).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Dedup.minhashLshPairs(subset, "text", "doc_id",
      shingleK = 1, numHashes = 64, bands = 32, threshold = 0.7).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // verification step makes LSH output a subset of the exact pairs
    assert(lsh.subsetOf(exact), s"false positives: ${lsh.diff(exact)}")
    // banding (16 bands x 4 rows) at jaccard>=0.5 should recall nearly all
    if (exact.nonEmpty) {
      val recall = lsh.size.toDouble / exact.size
      assert(recall >= 0.8, s"recall $recall (${lsh.size}/${exact.size})")
    }
  }

  test("simhash: identical docs collide, hamming is symmetric and bounded") {
    val fps = Dedup.simhashes(docs, "text", "doc_id")
    assert(fps.count() === docs.count())
    // same token multiset -> same simhash
    val twice = spark.createDataFrame(Seq(
      (1L, "alpha beta gamma delta"),
      (2L, "alpha beta gamma delta"),
      (3L, "completely different words here entirely"))).toDF("doc_id", "text")
    val pairs = Dedup.simhashPairs(twice, "text", "doc_id", maxDistance = 0)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(pairs.toSeq === Seq((1L, 2L, 0)))
  }

  test("lsh top-k results are a subset of brute-force ranking with same scores") {
    val qv = embs.filter(col("vec_id") === 0)
      .head().getAs[scala.collection.Seq[Float]]("embedding").toSeq
    val rest = embs.filter(col("vec_id") =!= 0)
    val brute = Similarity.bruteForceTopK(rest, "embedding", "vec_id", qv, 500)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val ann = Similarity.lshTopK(rest, "embedding", "vec_id", qv, 20, numPlanes = 4)
      .collect()
    assert(ann.nonEmpty)
    ann.foreach { r =>
      val sim = brute.get(r.getLong(0))
      assert(sim.isDefined && math.abs(sim.get - r.getDouble(1)) < 1e-9,
        s"ann scored ${r.getLong(0)} differently")
    }
  }

  test("lsh cosine pairs match exact pairs at high threshold (bucket recall)") {
    val subset = embs.filter(col("vec_id") % 5 === 0)
    val exact = Similarity.exactCosinePairs(subset, "embedding", "vec_id", 0.3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Similarity.cosinePairs(subset, "embedding", "vec_id", 0.3, numPlanes = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty, "threshold should yield pairs on this data")
    assert(lsh.subsetOf(exact))
    assert(lsh.nonEmpty, "lsh buckets should recall some pairs")
  }

  test("ivf top-k scores match brute force and recall is reasonable") {
    val qv = embs.filter(col("vec_id") === 0)
      .head().getAs[scala.collection.Seq[Float]]("embedding").toSeq
    val rest = embs.filter(col("vec_id") =!= 0)
    val brute = Similarity.bruteForceTopK(rest, "embedding", "vec_id", qv, 20)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val ivf = Similarity.ivfTopK(rest, "embedding", "vec_id", qv, 20,
      nCells = 8, nProbe = 4).collect()
    assert(ivf.nonEmpty)
    // every IVF result present in the brute top-20 is scored identically
    ivf.foreach { r =>
      brute.get(r.getLong(0))
        .foreach(s => assert(math.abs(s - r.getDouble(1)) < 1e-9))
    }
    // probing half the cells should recall a decent share of the true top-20
    val recall = ivf.map(_.getLong(0)).count(brute.contains).toDouble / 20.0
    assert(recall >= 0.3, s"ivf recall $recall")
  }

  test("kmeans IVF beats sampled-centroid IVF on a skewed corpus") {
    // 3 tight clusters in 8 dims; ALL low ids sit in cluster 0, so the
    // sampled-centroid variant (lowest-N ids) seeds every cell inside one
    // cluster — adversarial skew. Deterministic jitter, no RNG.
    val centers = Seq(
      Seq(1.0, 0, 0, 0, 1, 0, 0, 0), Seq(0.0, 1, 0, 0, 0, 1, 0, 0),
      Seq(0.0, 0, 1, 0, 0, 0, 1, 0))
    val rows = (0 until 150).map { i =>
      val cl = if (i < 50) 0 else if (i < 100) 1 else 2
      val v = centers(cl).zipWithIndex.map { case (c, d) =>
        (c + 0.05 * math.sin((i + 1.0) * (d + 1.0))).toFloat
      }
      (i.toLong, v)
    }
    val skewed = spark.createDataFrame(rows).toDF("vec_id", "embedding")
    // query at cluster 2's center
    val qv = centers(2).map(_.toFloat)

    val brute = Similarity.bruteForceTopK(skewed, "embedding", "vec_id", qv, 20)
      .collect().map(_.getLong(0)).toSet
    def recallOf(df: org.apache.spark.sql.DataFrame): Double =
      df.collect().map(_.getLong(0)).count(brute.contains).toDouble / 20.0

    val naive = recallOf(Similarity.ivfTopK(
      skewed, "embedding", "vec_id", qv, 20, nCells = 3, nProbe = 1))
    val kmeans = recallOf(Similarity.ivfTopKKmeans(
      skewed, "embedding", "vec_id", qv, 20, nCells = 3, nProbe = 1, iters = 3))
    assert(kmeans >= naive, s"kmeans $kmeans < naive $naive")
    assert(kmeans >= 0.9, s"kmeans recall $kmeans on separable clusters")
    // and the centroids really did adapt: one per cluster
    val cents = Similarity.kmeansCentroids(skewed, "embedding", "vec_id", 3)
    val assignedClusters = cents.map { c =>
      centers.zipWithIndex.maxBy { case (ctr, _) =>
        ctr.zip(c).map { case (a, b) => a * b }.sum /
          (math.sqrt(ctr.map(x => x * x).sum) * math.sqrt(c.map(x => x * x).sum))
      }._2
    }
    assert(assignedClusters.toSet === Set(0, 1, 2), assignedClusters.toSeq)
  }

  test("multimodal decode is deterministic and batch-shaped") {
    val media = Multimodal.asMedia(docs.limit(50))
    val f1 = Multimodal.decodeAndFeaturize(media, batchSize = 7)
      .collect().sortBy(_.doc_id)
    val f2 = Multimodal.decodeAndFeaturize(media, batchSize = 64)
      .collect().sortBy(_.doc_id)
    assert(f1.length === 50)
    // batch size must not change results (plumbing-only knob)
    f1.zip(f2).foreach { case (a, b) =>
      assert(a.doc_id === b.doc_id && a.payload_len === b.payload_len &&
        a.features.toSeq === b.features.toSeq)
    }
    f1.foreach { f =>
      assert(f.thumb_w <= 256 && f.thumb_h <= 256 && f.features.length === 8)
    }
  }

  test("connected components: chains merge, components stay separate") {
    val sp = spark; import sp.implicits._
    // chain 5-3-8 ∪ {3-5 again}, separate pair 10-12, isolated edge 7-20
    val pairs = Seq((3L, 5L), (5L, 8L), (3L, 8L), (10L, 12L), (7L, 20L))
      .toDF("id_a", "id_b")
    val cc = Dedup.connectedComponents(pairs, "id_a", "id_b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cc === Map(3L -> 3L, 5L -> 3L, 8L -> 3L,
      10L -> 10L, 12L -> 10L, 7L -> 7L, 20L -> 7L))
  }

  test("connected components: long chain converges past one round") {
    val sp = spark; import sp.implicits._
    // a 12-node path graph needs multiple propagation rounds
    val pairs = (1L to 11L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val cc = Dedup.connectedComponents(pairs, "id_a", "id_b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cc.size === 12 && cc.values.forall(_ == 1L))
  }

  test("connected components: distributed loop agrees with union-find") {
    val sp = spark; import sp.implicits._
    // two chains + a triangle + isolated pairs; smallGraphMaxPairs = 0
    // forces the label-propagation branch on the same input
    val pairs = ((1L to 11L).map(i => (i, i + 1)) ++
      Seq((100L, 101L), (101L, 102L), (100L, 102L), (200L, 300L)))
      .toDF("id_a", "id_b")
    val small = Dedup.connectedComponents(pairs, "id_a", "id_b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val dist = Dedup.connectedComponents(pairs, "id_a", "id_b",
      smallGraphMaxPairs = 0L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(dist === small)
    assert(small(102L) === 100L && small(300L) === 200L && small(11L) === 1L)
  }

  test("distributed CC stress: chains, stars, cliques match union-find truth") {
    val sp = spark; import sp.implicits._
    // adversarial corpus for the label-propagation branch: a 40-node path
    // (diameter 39), a 50-leaf star, an 8-clique, and scattered pairs
    val chain = (1000L until 1039L).map(i => (i, i + 1))
    val star = (1L to 50L).map(i => (5000L, 5000L + i))
    val clique = for (i <- 0 until 8; j <- i + 1 until 8)
      yield (9000L + i, 9000L + j)
    val pairs0 = chain ++ star ++ clique ++ Seq((77L, 78L), (80L, 79L))
    // scramble the input order so convergence can't ride on sortedness
    val pairs = pairs0.sortBy { case (a, b) => (a * 2654435761L + b) % 997 }
      .toDF("id_a", "id_b")
    val truth = Dedup.connectedComponents(pairs, "id_a", "id_b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val dist = Dedup.connectedComponents(pairs, "id_a", "id_b",
      maxIter = 60, smallGraphMaxPairs = 0L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(dist === truth)
    assert(dist(1039L) === 1000L && dist(5050L) === 5000L &&
      dist(9007L) === 9000L && dist(78L) === 77L && dist(80L) === 79L)
  }

  test("distributed CC fails loudly when maxIter is exhausted pre-fixpoint") {
    val sp = spark; import sp.implicits._
    // one large+small-star alternation cannot collapse a 200-node path
    val pairs = (1L to 200L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val ex = intercept[IllegalStateException] {
      Dedup.connectedComponents(pairs, "id_a", "id_b",
        maxIter = 1, smallGraphMaxPairs = 0L).collect()
    }
    assert(ex.getMessage.contains("did not converge"))
  }

  test("distributed CC: star contraction needs only log rounds on a long path") {
    val sp = spark; import sp.implicits._
    // a 120-node path has diameter 119; min-label propagation would need
    // 119 rounds, large/small-star collapses it within 10 alternations
    val pairs = (1L to 120L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val cc = Dedup.connectedComponents(pairs, "id_a", "id_b",
      maxIter = 10, smallGraphMaxPairs = 0L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cc.size === 121)
    assert(cc.values.toSet === Set(1L))
  }

  test("distributed CC leaves session shuffle partitions untouched") {
    val sp = spark; import sp.implicits._
    val before = sp.conf.get("spark.sql.shuffle.partitions")
    val pairs = (1L to 6L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    Dedup.connectedComponents(pairs, "id_a", "id_b",
      smallGraphMaxPairs = 0L).collect()
    assert(sp.conf.get("spark.sql.shuffle.partitions") === before)
  }

  test("keepRepresentatives drops non-min members, passes uniques through") {
    val sp = spark; import sp.implicits._
    val df = Seq((1L, "a"), (2L, "b"), (3L, "c"), (9L, "x")).toDF("doc_id", "text")
    val clusters = Seq((1L, 1L), (2L, 1L), (3L, 3L)).toDF("id", "cluster_id")
    val kept = Dedup.keepRepresentatives(df, "doc_id", clusters)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept === Set(1L, 3L, 9L))
  }

  test("global shuffle: dense positions, hash-rank order, partition-invariant") {
    val base = docs.select(col("doc_id"))
    val out = Sampling.globalShuffle(base, "doc_id", seed = 7L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap // doc_id -> pos
    val n = base.count()
    // dense 0..n-1 positions
    assert(out.values.toSeq.sorted === (0L until n).toSeq)
    // pos is the rank in (md5Hash60("7:" || id), id) order
    val ranked = base
      .select(col("doc_id"),
        Dedup.md5Hash60(concat(lit("7:"), col("doc_id").cast("string"))).as("h"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .sortBy { case (id, h) => (h, id) }.map(_._1).zipWithIndex
    ranked.foreach { case (id, pos) => assert(out(id) === pos.toLong) }
    // the order is a pure function of (seed, key): a different input
    // partitioning yields identical positions
    val repart = Sampling.globalShuffle(base.repartition(13), "doc_id", seed = 7L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(repart === out)
    // a different seed is a different permutation of the same positions
    val reseeded = Sampling.globalShuffle(base, "doc_id", seed = 8L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(reseeded.values.toSeq.sorted === (0L until n).toSeq)
    assert(reseeded !== out)
  }

  test("knn classify: separable clusters vote their own label; ties break low") {
    // two tight clusters along different axes; probes sit on the axes
    val corpus = spark.createDataFrame(Seq(
      (10L, Array(1.0f, 0.1f), 1),
      (11L, Array(1.0f, -0.1f), 1),
      (12L, Array(0.9f, 0.0f), 1),
      (20L, Array(-1.0f, 0.1f), 2),
      (21L, Array(-1.0f, -0.1f), 2),
      (22L, Array(-0.9f, 0.0f), 2))).toDF("vec_id", "embedding", "label")
    val probes = spark.createDataFrame(Seq(
      (1L, Array(1.0f, 0.0f)), (2L, Array(-1.0f, 0.0f))))
      .toDF("vec_id", "embedding")
    val out = Similarity.knnClassify(probes, corpus,
        "embedding", "vec_id", "label", k = 3, numPlanes = 2)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out(1L) === ((1L, 3L)) && out(2L) === ((2L, 3L)))
  }

  test("semantic dedup keeps one representative per cosine cluster") {
    // three exact-duplicate vectors + one distinct: the duplicates form one
    // component (cosine 1.0 in any bucket scheme), min id survives
    val rows = Seq(
      (1L, Array(1.0f, 0.0f, 0.0f)),
      (2L, Array(1.0f, 0.0f, 0.0f)),
      (5L, Array(2.0f, 0.0f, 0.0f)), // same direction = cosine 1.0
      (9L, Array(0.0f, 1.0f, 0.0f)))
    val df = spark.createDataFrame(rows).toDF("vec_id", "embedding")
    val pairs = Similarity.dataPlaneCosinePairs(
      df, "embedding", "vec_id", threshold = 0.99, numPlanes = 2)
    val clusters = Dedup.connectedComponents(pairs, "id_a", "id_b")
    val kept = Dedup.keepRepresentatives(df, "vec_id", clusters)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(kept === Set(1L, 9L))
  }

  test("PII redaction replaces emails, phones and IPs with typed tokens") {
    val sp = spark; import sp.implicits._
    val df = Seq(
      "mail a.b+c@x-corp.co.uk now",
      "call +1-555-0199 or 44-123-4567",
      "host 192.168.0.1 up, 999.1.2.3 still matches the scrubber",
      "no pii here").toDF("text")
    val out = df.select(TextAnalysis.redactPii($"text")).as[String].collect()
    assert(out(0) === "mail <EMAIL> now")
    assert(out(1) === "call <PHONE> or <PHONE>")
    assert(out(2) === "host <IP> up, <IP> still matches the scrubber")
    assert(out(3) === "no pii here")
    val counts = df.agg(
      sum(TextAnalysis.emailCount($"text")),
      sum(TextAnalysis.phoneCount($"text")),
      sum(TextAnalysis.ipCount($"text"))).head
    assert((counts.getLong(0), counts.getLong(1), counts.getLong(2)) === ((1L, 2L, 2L)))
  }

  test("rolling fingerprint is order-sensitive; simhash is order-insensitive") {
    val df = spark.createDataFrame(Seq(
      (1L, "alpha beta gamma"), (2L, "gamma beta alpha"))).toDF("doc_id", "text")
    val fp = df.select(rolling_fingerprint(col("text"))).collect().map(_.getLong(0))
    assert(fp(0) !== fp(1))
    val sh = df.select(simhash64(TextAnalysis.tokens(col("text")))).collect().map(_.getLong(0))
    assert(sh(0) === sh(1))
  }

  test("sq8 quantized top-k ranks close to brute-force cosine") {
    val qv = embs.filter(col("vec_id") === 0)
      .head().getAs[scala.collection.Seq[Float]]("embedding").toSeq
    val corpus = embs.filter(col("vec_id") =!= 0)
    val exact = Similarity.bruteForceTopK(corpus, "embedding", "vec_id", qv, 10)
      .collect().map(_.getLong(0)).toSet
    val sq8 = Similarity.sq8TopK(corpus, "embedding", "vec_id", qv, 10)
      .collect().map(_.getLong(0)).toSet
    // int8 quantization keeps most of the exact neighborhood (unnormalized
    // dot vs cosine + 8-bit rounding both cost a little)
    val overlap = sq8.intersect(exact).size.toDouble / exact.size
    assert(overlap >= 0.5, s"overlap $overlap ($sq8 vs $exact)")
    // scores are exact integers: two runs with different partitioning agree
    val rescored = Similarity.sq8TopK(corpus.repartition(7), "embedding", "vec_id", qv, 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val first = Similarity.sq8TopK(corpus, "embedding", "vec_id", qv, 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(rescored === first)
  }

  test("bq sign-bit packing and hamming top-k; rerank recovers exact neighbors") {
    val qv = embs.filter(col("vec_id") === 0)
      .head().getAs[scala.collection.Seq[Float]]("embedding").toSeq
    val corpus = embs.filter(col("vec_id") =!= 0)
    // packed-long hamming equals a direct per-component sign comparison
    val direct = corpus.select(col("vec_id"),
      (0 until qv.length).map { i =>
        when((element_at(col("embedding"), i + 1) >= 0) =!= lit(qv(i) >= 0), 1)
          .otherwise(0)
      }.reduce(_ + _).cast("long").as("h")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val packed = Similarity.bqTopK(corpus, "embedding", "vec_id", qv, 1000)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(packed.forall { case (id, h) => direct(id) == h })
    // 1-bit scan keeps some neighborhood; exact re-rank of a 50-candidate
    // shortlist recovers most of the true top-10
    val exact = Similarity.bruteForceTopK(corpus, "embedding", "vec_id", qv, 10)
      .collect().map(_.getLong(0)).toSet
    val rr = Similarity.bqTopK(corpus, "embedding", "vec_id", qv, 10, rerank = 50)
      .collect().map(_.getLong(0)).toSet
    val overlap = rr.intersect(exact).size.toDouble / exact.size
    assert(overlap >= 0.5, s"rerank overlap $overlap ($rr vs $exact)")
  }

  test("bm25 ranks term-dense short docs above sparse long ones") {
    val sp = spark; import sp.implicits._
    val df = Seq(
      (1L, "spark spark spark query"),
      (2L, "spark and a very long document about nothing in particular with many words diluting the match"),
      (3L, "no relevant terms at all"),
      (4L, "query stream spark")).toDF("doc_id", "text")
    val out = Ranking.bm25TopK(df, "text", "doc_id", Seq("spark", "query", "stream"), 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    // doc 3 matches nothing -> absent
    assert(!out.map(_._1).contains(3L))
    // doc 4 hits all three terms, doc 1 two with high tf; both beat doc 2
    val rank = out.map(_._1).toSeq
    assert(rank.indexOf(4L) < rank.indexOf(2L))
    assert(rank.indexOf(1L) < rank.indexOf(2L))
    // scores strictly positive and sorted desc
    assert(out.forall(_._2 > 0))
    assert(out.map(_._2).toSeq === out.map(_._2).sortBy(-_).toSeq)
  }

  test("stratified sample respects per-stratum rates and is partition-stable") {
    val sampled = Sampling.stratifiedSample(docs, "doc_id", "lang",
      Map("en" -> 100, "zh" -> 0), defaultPct = 50)
    val byLang = sampled.groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val totals = docs.groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byLang.getOrElse("en", 0L) === totals("en")) // 100% kept
    assert(byLang.getOrElse("zh", -1L) === -1L)         // 0% kept
    // default strata roughly halved (hash buckets, not exact)
    for (l <- totals.keys if l != "en" && l != "zh" && totals(l) >= 10)
      assert(byLang.getOrElse(l, 0L) < totals(l))
    // membership is a pure content-hash function: repartition changes nothing
    val again = Sampling.stratifiedSample(docs.repartition(13), "doc_id", "lang",
      Map("en" -> 100, "zh" -> 0), defaultPct = 50)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(again === sampled.select("doc_id").collect().map(_.getLong(0)).toSet)
  }

  test("vocabulary counts tf and df correctly on a known corpus") {
    val sp = spark; import sp.implicits._
    val df = Seq(
      (1L, "alpha beta alpha"),
      (2L, "alpha gamma")).toDF("doc_id", "text")
    val v = TextAnalysis.vocabulary(df, "text", "doc_id", 10)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(v.head === (("alpha", 3L, 2L)))
    assert(v.toSet === Set(("alpha", 3L, 2L), ("beta", 1L, 1L), ("gamma", 1L, 1L)))
  }

  test("persisted IVF index bucket-prunes the probe scan and matches per-query IVF") {
    val corpus = embs.filter(col("vec_id") =!= 0)
    val qv = embs.filter(col("vec_id") === 0)
      .head().getAs[scala.collection.Seq[Float]]("embedding").toSeq
    val centroids = corpus.select(col("vec_id").as("id"), col("embedding").as("v"))
      .orderBy(col("id")).limit(8).collect()
      .map(_.getAs[scala.collection.Seq[Float]]("v").toSeq.map(_.toDouble)).toSeq
    val root = java.nio.file.Files.createTempDirectory("ivf_idx_spec").toString
    Similarity.ivfIndexWrite(corpus, "embedding", "vec_id", centroids, s"$root/ivf")
    val probe = Similarity.ivfIndexProbe(spark, s"$root/ivf", centroids, qv, 20, nProbe = 2)
    // the layout makes the cell filter a PHYSICAL partition prune: the
    // scan's file count covers only the probed cells' directories
    val plan = probe.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [cell"), plan.take(800))
    probe.collect()
    val scans = probe.queryExecution.executedPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    assert(scans.nonEmpty)
    val filesRead = scans.head.metrics("numFiles").value
    val allFiles = new java.io.File(s"$root/ivf").listFiles()
      .filter(_.getName.startsWith("cell=")).map(_.listFiles()
        .count(_.getName.endsWith(".parquet")).toLong).sum
    assert(filesRead < allFiles, s"read $filesRead of $allFiles files — no pruning")
    // same results as the per-query assignment path
    val direct = Similarity.ivfTopK(corpus, "embedding", "vec_id", qv, 20,
      nCells = 8, nProbe = 2)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val indexed = probe.collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(indexed === direct)
  }

  test("IVF index append: half-build + insert equals the full build's probes") {
    val corpus = embs.filter(col("vec_id") =!= 0)
    val qv = embs.filter(col("vec_id") === 0)
      .head().getAs[scala.collection.Seq[Float]]("embedding").toSeq
    val centroids = corpus.select(col("vec_id").as("id"), col("embedding").as("v"))
      .orderBy(col("id")).limit(8).collect()
      .map(_.getAs[scala.collection.Seq[Float]]("v").toSeq.map(_.toDouble)).toSeq
    val root = java.nio.file.Files.createTempDirectory("ivf_app_spec").toString
    // build with the even half, append the odd half (frozen centroids)
    Similarity.ivfIndexWrite(corpus.filter(col("vec_id") % 2 === 0),
      "embedding", "vec_id", centroids, s"$root/ivf")
    Similarity.ivfIndexAppend(corpus.filter(col("vec_id") % 2 =!= 0),
      "embedding", "vec_id", centroids, s"$root/ivf")
    val appended = Similarity
      .ivfIndexProbe(spark, s"$root/ivf", centroids, qv, 20, nProbe = 2)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    Similarity.ivfIndexWrite(corpus, "embedding", "vec_id", centroids, s"$root/full")
    val full = Similarity
      .ivfIndexProbe(spark, s"$root/full", centroids, qv, 20, nProbe = 2)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(appended === full)
  }

  test("knn join: per-id ranks contiguous, neighbors symmetric-bucket, scores match exact cosine") {
    val sample = embs.filter(col("vec_id") % 5 === 0)
    val out = Similarity.knnJoin(sample, "embedding", "vec_id", k = 3, numPlanes = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(out.nonEmpty)
    // per id: at most k rows, ranks exactly 1..n, sims non-increasing
    out.groupBy(_._1).foreach { case (_, rows) =>
      val sorted = rows.sortBy(_._3)
      assert(sorted.length <= 3)
      assert(sorted.map(_._3).toSeq === (1L to sorted.length).toSeq)
      assert(sorted.map(_._4).toSeq.reverse.sorted.reverse === sorted.map(_._4).toSeq)
    }
    // no self-neighbors
    assert(out.forall(r => r._1 != r._2))
    // spot-check one score against the exact cosine of those two vectors
    val (a, b, _, sim) = out.head
    val va = embs.filter(col("vec_id") === a).head().getAs[scala.collection.Seq[Float]]("embedding")
    val vb = embs.filter(col("vec_id") === b).head().getAs[scala.collection.Seq[Float]]("embedding")
    val dotD = va.zip(vb).foldLeft(0.0) { case (acc, (x, y)) => acc + x.toDouble * y.toDouble }
    val na = math.sqrt(va.foldLeft(0.0)((acc, x) => acc + x.toDouble * x.toDouble))
    val nb = math.sqrt(vb.foldLeft(0.0)((acc, x) => acc + x.toDouble * x.toDouble))
    assert(math.abs(sim - dotD / (na * nb)) < 1e-5)
  }

  test("unigram log-prob scores common-word docs above rare-word docs") {
    val sp = spark; import sp.implicits._
    val df = Seq(
      (1L, "the the the the"),      // all high-frequency tokens
      (2L, "the zzyzx"),            // one singleton token
      (3L, "the the")).toDF("doc_id", "text")
    val out = TextAnalysis.unigramLogProb(df, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(out(1)._1 === 4L)
    assert(out(2)._1 === 2L)
    // doc 1 and 3 are all-'the' -> identical avg; doc 2 dragged down by the singleton
    assert(out(1)._2 === out(3)._2)
    assert(out(2)._2 < out(1)._2)
    // probabilities < 1 -> log-probs negative
    assert(out.values.forall(_._2 < 0))
  }

  test("bigram LM scores formulaic text above shuffled same-unigram text") {
    val sp = spark; import sp.implicits._
    val df = (Seq.tabulate(4)(i => (i.toLong, "the cat sat on the mat")) :+
      (9L, "mat the on sat cat the")).toDF("doc_id", "text")
    val out = TextAnalysis.bigramLogProb(df, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(out.size === 5)
    // the four formulaic docs share every bigram (high conditional prob);
    // the shuffled doc's bigrams are singletons against the same contexts
    (0L until 4L).foreach(i => assert(out(i) > out(9L),
      s"doc $i ${out(i)} should beat shuffled ${out(9L)}"))
  }

  test("repeated n-grams surface only cross-document shared spans") {
    val sp = spark; import sp.implicits._
    val df = Seq(
      (1L, "the quick brown fox jumps high"),
      (2L, "the quick brown fox sleeps"),
      (3L, "completely different text entirely here")).toDF("doc_id", "text")
    val grams = TextAnalysis.repeatedNgrams(df, "text", "doc_id", n = 4, minDocs = 2, k = 10)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(grams.toSeq === Seq(("the quick brown fox", 2L)))
  }

  test("incremental minhash pairs = cross-set slice of the full pair set") {
    val corpus = docs.filter(col("doc_id") % 3 =!= 0)
    val inc = docs.filter(col("doc_id") % 3 === 0)
    val incremental = Dedup.md5MinhashIncrementPairs(corpus, inc, "text", "doc_id",
        shingleK = 1, numHashes = 32, bands = 16, threshold = 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    // ground truth: full-corpus pairs restricted to (new, old) across the
    // split — the increment path must find exactly these, reoriented
    val full = Dedup.md5MinhashLshPairs(docs, "text", "doc_id",
        shingleK = 1, numHashes = 32, bands = 16, threshold = 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val expected = full.flatMap { case (a, b, s) =>
      if (a % 3 == 0 && b % 3 != 0) Some((a, b, s))
      else if (b % 3 == 0 && a % 3 != 0) Some((b, a, s))
      else None
    }.toSet
    assert(incremental === expected)
    assert(incremental.nonEmpty, "expected cross-set near-dups at sf0.001")
  }

  test("paragraph dedup: first occurrence wins, rebuild preserves order, empty docs vanish") {
    val sp = spark; import sp.implicits._
    val df = Seq(
      (1L, "alpha one\nshared para\nBETA two"),
      (2L, "shared  para\ngamma three"), // normalizes to doc 1's paragraph
      (3L, "shared para"),               // every paragraph is a dup → doc gone
      (4L, "delta four\ndelta four")     // within-doc duplicate
    ).toDF("doc_id", "text")
    val winners = Dedup.dedupParagraphs(df, "text", "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    // "shared para" keeps its (1,1) occurrence with 3 copies total
    assert(winners.toSet.contains((1L, 1L, "shared para", 3L)))
    assert(winners.count(_._3.toLowerCase.matches("shared\\s+para")) === 1)
    // within-doc dup keeps only the first position
    assert(winners.toSet.contains((4L, 0L, "delta four", 2L)))
    val rebuilt = Dedup.paragraphDedupRebuild(df, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    assert(rebuilt(1L) === (("alpha one\nshared para\nBETA two", 3L, 0L)))
    assert(rebuilt(2L) === (("gamma three", 1L, 1L)))
    assert(!rebuilt.contains(3L)) // nothing survived
    assert(rebuilt(4L) === (("delta four", 1L, 1L)))
  }

  test("above the materialization cap: no checkpoint in the plan, same results") {
    val subset = docs.filter(col("doc_id") % 5 === 0)
    def planOf(df: org.apache.spark.sql.DataFrame): String =
      df.queryExecution.executedPlan.toString
    // minhash: scale path recomputes shingles behind a broadcast semi-join
    val mhSmall = Dedup.md5MinhashLshPairs(subset, "text", "doc_id",
      shingleK = 1, numHashes = 32, bands = 16, threshold = 0.8)
    val mhScale = Dedup.md5MinhashLshPairs(subset, "text", "doc_id",
      shingleK = 1, numHashes = 32, bands = 16, threshold = 0.8,
      materializeMaxRows = 0L)
    assert(!planOf(mhScale).contains("ExistingRDD"),
      "scale path must not checkpoint the corpus")
    assert(planOf(mhScale).contains("BroadcastExchange"),
      "candidate ids should re-enter via broadcast")
    assert(mhScale.collect().toSet === mhSmall.collect().toSet)
    // simhash: scale path persists (lineage kept) instead of checkpointing
    val shSmall = Dedup.md5SimhashPairs(subset, "text", "doc_id", maxDistance = 8)
    val shScale = Dedup.md5SimhashPairs(subset, "text", "doc_id", maxDistance = 8,
      materializeMaxRows = 0L)
    assert(!planOf(shScale).contains("ExistingRDD"))
    assert(planOf(shScale).contains("InMemoryTableScan"))
    assert(shScale.collect().toSet === shSmall.collect().toSet)
    // sq8: same switch
    val qv = embs.filter(col("vec_id") === 0)
      .head().getAs[scala.collection.Seq[Float]]("embedding").toSeq
    val sqSmall = Similarity.sq8TopK(embs.filter(col("vec_id") =!= 0),
      "embedding", "vec_id", qv, 20)
    val sqScale = Similarity.sq8TopK(embs.filter(col("vec_id") =!= 0),
      "embedding", "vec_id", qv, 20, materializeMaxRows = 0L)
    assert(!planOf(sqScale).contains("ExistingRDD"))
    assert(planOf(sqScale).contains("InMemoryTableScan"))
    assert(sqScale.collect().toSeq === sqSmall.collect().toSeq)
  }

  test("pq top-k: trained codebooks rank usefully; recall comparable to sq8") {
    val qv = embs.filter(col("vec_id") === 0)
      .head().getAs[scala.collection.Seq[Float]]("embedding").toSeq
    val corpus = embs.filter(col("vec_id") =!= 0)
    val truth = Similarity.bruteForceTopK(corpus, "embedding", "vec_id", qv, 20)
      .collect().map(_.getLong(0)).toSet
    def recallOf(ids: Set[Long]): Double = ids.intersect(truth).size / 20.0
    val trained = Similarity.pqKmeansCodebooks(corpus, "embedding", "vec_id", 8, 16)
    val pqAdc = Similarity.pqTopK(corpus, "embedding", "vec_id", qv, 20, trained)
      .collect().map(_.getLong(0)).toSet
    val pqReranked = Similarity.pqTopK(corpus, "embedding", "vec_id", qv, 20,
      trained, rerank = 100).collect().map(_.getLong(0)).toSet
    val sq8 = Similarity.sq8TopK(corpus, "embedding", "vec_id", qv, 20)
      .collect().map(_.getLong(0)).toSet
    info(s"recall: pqAdc=${recallOf(pqAdc)} pqReranked=${recallOf(pqReranked)} " +
      s"sq8=${recallOf(sq8)}")
    // 32-bit PQ codes are far lossier than 8-bit-per-dim SQ8 levels —
    // raw ADC only shortlists; exact re-rank of the ADC shortlist is the
    // standard retrieval shape and must recover most of the truth
    assert(recallOf(pqReranked) >= 0.7,
      s"re-ranked PQ recall ${recallOf(pqReranked)} too low")
    assert(recallOf(pqReranked) >= recallOf(pqAdc),
      "exact re-rank cannot lose to raw ADC ordering")
    assert(recallOf(sq8) >= recallOf(pqAdc),
      "8-bit scalar quantization should not lose to 4-bit PQ codes")
    assert(pqAdc.size === 20 && pqReranked.size === 20)
  }

  test("principal components: Cv = λv residual small, components orthogonal, λ ordered") {
    val comps = Similarity.principalComponents(embs, "embedding", k = 2, iters = 500)
    val Seq((l1, v1), (l2, v2)) = comps.toList
    assert(l1 >= l2 && l2 > 0, s"eigenvalues out of order: $l1, $l2")
    // rebuild C from the same operator output and check the eigen residual
    val rows = Similarity.covarianceLong(embs, "embedding").collect()
      .map(r => (r.getLong(0).toInt, r.getLong(1).toInt, r.getDouble(2)))
    val dim = v1.size
    val c = Array.ofDim[Double](dim, dim)
    rows.foreach { case (i, j, x) => c(i)(j) = x; c(j)(i) = x }
    def residual(l: Double, v: Seq[Double]): Double = {
      val cv = Array.tabulate(dim)(i =>
        (0 until dim).foldLeft(0.0)((a, j) => a + c(i)(j) * v(j)))
      math.sqrt((0 until dim).foldLeft(0.0)((a, i) =>
        a + math.pow(cv(i) - l * v(i), 2)))
    }
    // near-flat spectra (synthetic embeddings) converge slowly: accept a
    // small relative residual rather than machine precision
    assert(residual(l1, v1) < 5e-3 * math.max(l1, 1e-12), s"r1=${residual(l1, v1)}")
    assert(residual(l2, v2) < 2e-2 * math.max(l1, 1e-12), s"r2=${residual(l2, v2)}")
    val dot12 = v1.zip(v2).map { case (a, b) => a * b }.sum
    assert(math.abs(dot12) < 1e-3, s"components not orthogonal: $dot12")
  }

  test("PCA projection: coordinate variances match eigenvalues in order") {
    val comps = Similarity.principalComponents(embs, "embedding", k = 2, iters = 500)
    val proj = Similarity.projectComponents(embs, "embedding", "vec_id",
        comps.map(_._2))
      .collect().map(_.getAs[scala.collection.Seq[Double]]("proj"))
    def varOf(xs: Seq[Double]): Double = {
      val m = xs.sum / xs.size
      xs.map(x => (x - m) * (x - m)).sum / xs.size
    }
    val v0 = varOf(proj.map(_(0)).toSeq)
    val v1 = varOf(proj.map(_(1)).toSeq)
    assert(v0 >= v1, s"first component must carry more variance: $v0 < $v1")
    // the projected variance is the eigenvalue of the (quantized)
    // covariance — allow the quantization grid + convergence slack
    assert(math.abs(v0 - comps(0)._1) < 0.05 * comps(0)._1 + 1e-4,
      s"var $v0 vs eigenvalue ${comps(0)._1}")
  }

  test("linear probe separates its own training labels") {
    val w = Similarity.centroidProbeWeights(embs, "embedding", "label", 0, 1)
    val scored = Similarity.linearProbe(embs, "embedding", "vec_id", w)
      .join(embs.select(col("vec_id").as("id"), col("label")), "id")
      .filter(col("label").isin(0, 1))
      .collect().map(r => r.getInt(2) -> r.getDouble(1))
    val m1 = scored.filter(_._1 == 1).map(_._2)
    val m0 = scored.filter(_._1 == 0).map(_._2)
    assert(m1.nonEmpty && m0.nonEmpty)
    // the difference-of-centroids direction must score its positive class
    // higher on average — the minimal sanity a trained head must satisfy
    assert(m1.sum / m1.size > m0.sum / m0.size,
      s"probe failed to separate: ${m1.sum / m1.size} vs ${m0.sum / m0.size}")
  }

  test("persisted PQ code index probes identically to inline pqTopK") {
    val qv = embs.filter(col("vec_id") === 0)
      .head().getAs[scala.collection.Seq[Float]]("embedding").toSeq
    val corpus = embs.filter(col("vec_id") =!= 0)
    val cbs = Similarity.pqSampledCodebooks(corpus, "embedding", "vec_id", 4, 8)
    val path = java.nio.file.Files.createTempDirectory("pq_index").toString + "/idx"
    Similarity.pqIndexWrite(corpus, "embedding", "vec_id", cbs, path)
    val probed = Similarity.pqIndexProbe(spark, path, cbs, qv, 20)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val inline = Similarity.pqTopK(corpus, "embedding", "vec_id", qv, 20, cbs)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(probed === inline)
    // the index stores only id + m small code columns — no vectors
    val idx = spark.read.parquet(path)
    assert(idx.columns.sorted.toSeq === Seq("c0", "c1", "c2", "c3", "id"))
  }

  test("classCentroids packs classCentroidsLong per label in dimension order") {
    val long = Similarity.classCentroidsLong(embs, "embedding", "label")
      .collect().map(r => (r.get(0), r.getAs[Int]("pos"), r.getAs[Double]("m")))
    val packed = Similarity.classCentroids(embs, "embedding", "label").collect()
    assert(packed.nonEmpty)
    val dim = embs.head().getAs[scala.collection.Seq[Float]]("embedding").size
    packed.foreach { r =>
      val label = r.get(0)
      val centroid = r.getAs[scala.collection.Seq[Double]]("centroid")
      assert(centroid.size === dim)
      val expect = long.filter(_._1 == label).sortBy(_._2).map(_._3).toSeq
      assert(centroid.toSeq === expect)
    }
  }

  test("ivfPqTopK: probed-cell subset, ADC approximates exact cosine, layout-invariant") {
    val qv = embs.filter(col("vec_id") === 0)
      .head().getAs[scala.collection.Seq[Float]]("embedding").toSeq
    val rest = embs.filter(col("vec_id") =!= 0)
    val brute = Similarity.bruteForceTopK(rest, "embedding", "vec_id", qv, 500)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val ivfpq = Similarity.ivfPqTopK(rest, "embedding", "vec_id", qv, 20,
      nCells = 8, nProbe = 4).collect()
    assert(ivfpq.nonEmpty)
    // ADC = dot(q,c) + quantized-residual correction. With 8 sampled
    // codebook seeds on this tiny corpus the per-id quantization error is
    // coarse, so bound the MEAN error (approximation sanity), not each id
    val errs = ivfpq.map(r => math.abs(brute(r.getLong(0)) - r.getDouble(1)))
    assert(errs.max < 1.5, s"ADC error blew past score scale: ${errs.max}")
    assert(errs.sum / errs.length < 0.6, s"mean ADC error ${errs.sum / errs.length}")
    // deterministic: invariant under input layout
    val again = Similarity.ivfPqTopK(rest.repartition(7), "embedding", "vec_id", qv, 20,
      nCells = 8, nProbe = 4).collect()
    assert(ivfpq.map(r => (r.getLong(0), r.getDouble(1))).toSeq ===
      again.map(r => (r.getLong(0), r.getDouble(1))).toSeq)
  }

  test("mmrSelect: first pick is argmax relevance, picks diversify, deterministic") {
    val qv = embs.filter(col("vec_id") === 0)
      .head().getAs[scala.collection.Seq[Float]]("embedding").toSeq
    val rest = embs.filter(col("vec_id") =!= 0)
    val sel = Similarity.mmrSelect(rest, "embedding", "vec_id", qv, k = 5)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2)))
    assert(sel.map(_._1).toSeq === Seq(1, 2, 3, 4, 5))
    val top1 = Similarity.bruteForceTopK(rest, "embedding", "vec_id", qv, 1)
      .head().getLong(0)
    assert(sel.head._2 === top1)
    assert(sel.map(_._2).distinct.length === 5) // without replacement
    // λ<1 penalizes redundancy: each later pick scores no higher than rank 1
    assert(sel.tail.forall(_._3 <= sel.head._3))
    val again = Similarity.mmrSelect(rest.repartition(9), "embedding", "vec_id", qv, k = 5)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2)))
    assert(sel.toSeq === again.toSeq)
  }
}
