package graft.operators

import graft.GraftSession
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** HNSW contract: exact when the beam covers the partition, measured
  * recall in the true ANN regime, full determinism (hash-derived levels,
  * id-ordered insertion, (dist, idx) tie-breaks), partitioning-invariant
  * results at covering ef. */
class HnswSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = GraftSession.builder(master = "local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  /** Deterministic pseudo-vectors: dims from a SplitMix-style hash of
    * (id, dim) — no RNG state, reproducible across runs. */
  private def vecOf(id: Long, dim: Int): Array[Float] =
    Array.tabulate(dim) { j =>
      var z = id * 1000003L + j * 0x9E3779B97F4A7C15L
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = z ^ (z >>> 31)
      ((z % 2000L) / 1000.0f) - 1.0f
    }

  private def bruteTopK(
      n: Int, dim: Int, q: Array[Float], k: Int): Seq[Long] = {
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < a.length) {
        val x = a(i).toDouble; val y = b(i).toDouble
        d += x * y; na += x * x; nb += y * y; i += 1
      }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    (1 to n).map(i => (i.toLong, cos(vecOf(i, dim), q)))
      .sortBy { case (id, s) => (-s, id) }.take(k).map(_._1)
  }

  test("kernel: covering ef reproduces exact top-k; graph stays connected") {
    val dim = 16
    val idx = new HnswIndex(8, 64)
    (1 to 500).foreach(i => idx.add(i.toLong, vecOf(i, dim)))
    val q = vecOf(9999L, dim)
    val got = idx.searchKnn(q, ef = 500, k = 10).map(_._1)
    assert(got === bruteTopK(500, dim, q, 10))
    // covering-beam search reaches every node → the graph is connected
    assert(idx.searchKnn(q, ef = 500, k = 500).size === 500)
  }

  test("kernel: tombstone-heavy shard still yields k live results at small ef") {
    val dim = 16
    val idx = new HnswIndex(8, 64)
    (1 to 400).foreach(i => idx.add(i.toLong, vecOf(i, dim)))
    val q = vecOf(9999L, dim)
    // tombstone the brute-force top 60: a non-widening ef=16 beam would be
    // dominated by excluded nodes and return fewer than k live survivors —
    // the beam must widen until k live results (or provable exhaustion)
    val dead = bruteTopK(400, dim, q, 60).toSet
    val got = idx.searchKnn(q, ef = 16, k = 10, excluded = dead.contains)
    assert(got.size === 10, s"beam did not widen past tombstones: $got")
    assert(got.forall { case (id, _) => !dead(id) })
    // and the widened answer stays exact when the beam covers the shard
    val exact = bruteTopK(400, dim, q, 70).filterNot(dead).take(10)
    val exactAtFullEf =
      idx.searchKnn(q, ef = 400, k = 10, excluded = dead.contains).map(_._1)
    assert(exactAtFullEf === exact)
    // excluding EVERYTHING is provable exhaustion, not an infinite loop
    assert(idx.searchKnn(q, ef = 4, k = 10, excluded = _ => true).isEmpty)
  }

  test("kernel: recall@10 >= 0.8 in the sub-linear beam regime") {
    val dim = 16
    val idx = new HnswIndex(12, 96)
    (1 to 2000).foreach(i => idx.add(i.toLong, vecOf(i, dim)))
    val queries = Seq(5001L, 5002L, 5003L, 5004L, 5005L)
    val recalls = queries.map { qid =>
      val q = vecOf(qid, dim)
      val truth = bruteTopK(2000, dim, q, 10).toSet
      val got = idx.searchKnn(q, ef = 64, k = 10).map(_._1).toSet
      truth.intersect(got).size / 10.0
    }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.8, s"mean recall@10 = $mean (per-query: $recalls)")
  }

  test("persisted index: reload answers exactly like the in-memory build") {
    val sp = spark
    import sp.implicits._
    val dim = 16
    val df = (1 to 400).map(i => (i.toLong, vecOf(i, dim))).toDF("vec_id", "embedding")
    val q = vecOf(8888L, dim).toSeq
    val path = java.nio.file.Files.createTempDirectory("hnsw_idx_spec").toString
    Similarity.hnswIndexWrite(df, "embedding", "vec_id", path,
      shards = 4, m = 8, efConstruction = 64)
    def probe() = Similarity.hnswIndexProbe(sp, path, q, 12,
        m = 8, efConstruction = 64, efSearch = 400)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val a = probe()
    // covering ef → exact, and a second reload is byte-identical
    assert(a.map(_._1) === bruteTopK(400, dim, q.toArray, 12))
    assert(probe() === a)
    // sub-linear regime: the RELOADED graph walks like the exported one —
    // per matching shard, beam results agree with a fresh in-memory build
    val byShard = (1 to 400).groupBy(i =>
      java.lang.Math.floorMod(graft.functions.Sketches.md5Hash60(
        i.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8)), 4L))
    val loaded = sp.read.parquet(path)
      .select(col("shard").cast("int"), col("id"), col("v"),
        col("level").cast("int"), col("nbrs"))
      .collect().groupBy(_.getInt(0))
    byShard.foreach { case (shard, members) =>
      val mem = new HnswIndex(8, 64)
      members.sorted.foreach(i => mem.add(i.toLong, vecOf(i, dim)))
      val rows = loaded(shard.toInt).toSeq.map { r =>
        (r.getLong(1),
          r.getAs[scala.collection.Seq[Float]](2).toArray,
          r.getInt(3),
          r.getAs[scala.collection.Seq[scala.collection.Seq[Long]]](4)
            .map(_.toSeq).toSeq)
      }
      val re = HnswIndex.fromAdjacency(8, 64, rows)
      assert(re.searchKnn(q.toArray, 24, 8) === mem.searchKnn(q.toArray, 24, 8),
        s"shard $shard reload diverged")
    }
  }

  test("persisted index: append inserts online, untouched shards unread") {
    val sp = spark
    import sp.implicits._
    val dim = 16
    val base = (1 to 300).map(i => (i.toLong, vecOf(i, dim)))
    val extra = (301 to 450).map(i => (i.toLong, vecOf(i, dim)))
    val path = java.nio.file.Files.createTempDirectory("hnsw_app_spec").toString
    Similarity.hnswIndexWrite(base.toDF("vec_id", "embedding"),
      "embedding", "vec_id", path, shards = 4, m = 8, efConstruction = 64)
    Similarity.hnswIndexAppend(extra.toDF("vec_id", "embedding"),
      "embedding", "vec_id", path, shards = 4, m = 8, efConstruction = 64)
    val q = vecOf(6666L, dim).toSeq
    val got = Similarity.hnswIndexProbe(sp, path, q, 12,
        m = 8, efConstruction = 64, efSearch = 450)
      .collect().map(_.getLong(0)).toSeq
    assert(got === bruteTopK(450, dim, q.toArray, 12))
    // every vector is a graph citizen exactly once
    assert(sp.read.parquet(path).count() === 450)
    assert(sp.read.parquet(path).select("id").distinct().count() === 450)
  }

  test("persisted index: append is idempotent under at-least-once replay") {
    val sp = spark
    import sp.implicits._
    val dim = 16
    val base = (1 to 200).map(i => (i.toLong, vecOf(i, dim)))
    val extra = (201 to 300).map(i => (i.toLong, vecOf(i, dim)))
    val path = java.nio.file.Files.createTempDirectory("hnsw_idem_spec").toString
    Similarity.hnswIndexWrite(base.toDF("vec_id", "embedding"),
      "embedding", "vec_id", path, shards = 4, m = 8, efConstruction = 64)
    // foreachBatch replays the SAME epoch after a crash: the second append
    // must insert nothing (no duplicate graph nodes, probes unskewed)
    Similarity.hnswIndexAppend(extra.toDF("vec_id", "embedding"),
      "embedding", "vec_id", path, shards = 4, m = 8, efConstruction = 64)
    val once = sp.read.parquet(path).orderBy("id")
      .collect().map(r => (r.getLong(0), r.getInt(2))).toSeq
    Similarity.hnswIndexAppend(extra.toDF("vec_id", "embedding"),
      "embedding", "vec_id", path, shards = 4, m = 8, efConstruction = 64)
    assert(sp.read.parquet(path).count() === 300)
    val twice = sp.read.parquet(path).orderBy("id")
      .collect().map(r => (r.getLong(0), r.getInt(2))).toSeq
    assert(twice === once)
    val q = vecOf(5555L, dim).toSeq
    val got = Similarity.hnswIndexProbe(sp, path, q, 10,
        m = 8, efConstruction = 64, efSearch = 300)
      .collect().map(_.getLong(0)).toSeq
    assert(got === bruteTopK(300, dim, q.toArray, 10))
  }

  test("persisted index: tombstone delete, resurrection on re-append, compaction") {
    val sp = spark
    import sp.implicits._
    val dim = 16
    val path = java.nio.file.Files.createTempDirectory("hnsw_del_spec").toString
    val all = (1 to 300).map(i => (i.toLong, vecOf(i, dim)))
    Similarity.hnswIndexWrite(all.toDF("vec_id", "embedding"),
      "embedding", "vec_id", path, shards = 4, m = 8, efConstruction = 64)
    val q = vecOf(4444L, dim)
    def bruteWithout(dead: Set[Long]): Seq[Long] = {
      def cos(a: Array[Float], b: Array[Float]): Double = {
        var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
        while (i < a.length) { val x = a(i).toDouble; val y = b(i).toDouble
          d += x * y; na += x * x; nb += y * y; i += 1 }
        d / (math.sqrt(na) * math.sqrt(nb))
      }
      (1 to 300).map(_.toLong).filterNot(dead.contains)
        .map(id => (id, cos(vecOf(id, dim), q)))
        .sortBy { case (id, s) => (-s, id) }.take(10).map(_._1)
    }
    def probe(): Seq[Long] = Similarity.hnswIndexProbe(sp, path, q.toSeq, 10,
      m = 8, efConstruction = 64, efSearch = 300).collect().map(_.getLong(0)).toSeq
    // delete the current top-3: the probe must surface the next ranks
    val doomed = bruteTopK(300, dim, q, 10).take(3)
    Similarity.hnswIndexDelete(sp, path, doomed)
    assert(probe() === bruteWithout(doomed.toSet))
    // re-appending one deleted id resurrects it
    val back = doomed.head
    Similarity.hnswIndexAppend(Seq((back, vecOf(back, dim))).toDF("vec_id", "embedding"),
      "embedding", "vec_id", path, shards = 4, m = 8, efConstruction = 64)
    assert(probe() === bruteWithout(doomed.toSet - back))
    // compaction rebuilds without the remaining tombstones and clears them
    Similarity.hnswIndexCompact(sp, path, m = 8, efConstruction = 64)
    assert(probe() === bruteWithout(doomed.toSet - back))
    assert(sp.read.parquet(path).count() === 300 - (doomed.size - 1))
    val t = new org.apache.hadoop.fs.Path(s"$path/_tombstones")
    assert(!t.getFileSystem(sp.sparkContext.hadoopConfiguration).exists(t))
  }

  test("operator: partitioning-invariant exact top-k at covering ef") {
    val sp = spark
    import sp.implicits._
    val dim = 16
    val df = (1 to 600).map(i => (i.toLong, vecOf(i, dim))).toDF("vec_id", "embedding")
    val q = vecOf(7777L, dim).toSeq
    def run(parts: Int) = Similarity.hnswTopK(
        df.repartition(parts), "embedding", "vec_id", q, 15,
        m = 8, efConstruction = 64, efSearch = 600)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val a = run(1)
    val b = run(7)
    assert(a === b)
    assert(a.map(_._1) === bruteTopK(600, dim, q.toArray, 15))
  }
}
