package graft.operators

import graft.functions.GraftFunctions.hyperplane_lsh
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Similarity search over embedding columns (`array<float>`).
 *
 * Dot products and cosines run through the native one-pass
 * [[graft.functions.Sketches.dotProd]]/[[graft.functions.Sketches.cosineSim]]
 * kernels — left-to-right IEEE accumulation over double-cast elements,
 * bit-identical to the DuckDB oracle's `list_dot_product(DOUBLE[])`.
 *
 *  - [[bruteForceTopK]]: exact top-k by cosine — one scan + TakeOrdered,
 *    the correctness baseline (and often the right answer even at scale:
 *    a 100 TB scan with a 64-dim dot product is embarrassingly parallel);
 *  - [[lshTopK]]: sign-random-projection bucketed ANN — the scale path
 *    when the query set is large: candidates are restricted to matching
 *    [[graft.functions.HyperplaneLsh]] buckets (multi-probe via fewer
 *    planes ⇒ bigger buckets ⇒ higher recall);
 *  - [[cosinePairs]]: embedding near-dup pairs above a threshold, LSH
 *    bucketed so the quadratic term is bounded per bucket.
 */
object Similarity {

  // Native one-pass kernels, bit-identical to the declarative
  // aggregate(zip_with(...)) folds they replaced (same left-to-right IEEE
  // accumulation — oracle hashes unchanged): the fold chain allocated a
  // zipped array and ran interpreted higher-order functions THREE times
  // per cosine (dot + both norms); measured 10× on sim_pairs (3.1s →
  // 0.31s) and ~4× on the full-corpus bucket-join pipeline
  // (pipeline_semantic_curate 4.6s → 1.2s at sf0.1), with every
  // similarity operator sharing the win.
  def dot(a: Column, b: Column): Column =
    graft.functions.GraftFunctions.vec_dot(a, b)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** `transform(vec, x => x / nrm)` with the O(dim) norm BOUND once per
    * row — written inline in the lambda, Catalyst re-evaluates the norm
    * per element (O(dim²) per row at encode time; at real embedding
    * widths the quadratic IS the encode cost). Value-identical to the
    * inline form, including null/zero-vector behavior. */
  private def divByNormOnce(vec: Column, nrm: Column): Column =
    Curation.bindOnce(nrm)(n => transform(vec, x => x / n))

  def cosine(a: Column, b: Column): Column =
    graft.functions.GraftFunctions.vec_cosine(a, b)

  /** Exact cosine top-k of `queryVec` over `df(vecCol)`. */
  def bruteForceTopK(
      df: DataFrame,
      vecCol: String,
      idCol: String,
      queryVec: Seq[Float],
      k: Int): DataFrame = {
    val q = typedLit(queryVec)
    df.select(col(idCol).as("id"),
        round(cosine(col(vecCol), q), 6).as("sim"))
      .orderBy(col("sim").desc, col("id"))
      .limit(k)
  }

  /** Exact cosine RANGE query: every vector with `sim ≥ threshold` — the
    * vector-store range API beside [[bruteForceTopK]]'s top-k. One
    * embarrassingly parallel scan with the predicate on the codegen'd
    * cosine — no shuffle, no global sort, output size set by the data.
    * At 100 TB the LSH/IVF bucket prefilters in this file bound the
    * scanned candidates the same way they do for top-k (recall traded,
    * sized by the `sim_ann_recall` evals). */
  def rangeSearch(
      df: DataFrame,
      vecCol: String,
      idCol: String,
      queryVec: Seq[Float],
      threshold: Double): DataFrame = {
    val q = typedLit(queryVec)
    df.select(col(idCol).as("id"),
        round(cosine(col(vecCol), q), 6).as("sim"))
      .filter(col("sim") >= threshold)
  }

  /** ANN top-k: only vectors sharing the query's LSH bucket are scored.
    * `numPlanes` trades recall (fewer planes) against candidate-set size. */
  def lshTopK(
      df: DataFrame,
      vecCol: String,
      idCol: String,
      queryVec: Seq[Float],
      k: Int,
      numPlanes: Int = 8,
      seed: Int = 42): DataFrame = {
    val q = typedLit(queryVec)
    val qBucket = df.sparkSession.range(1)
      .select(hyperplane_lsh(q, numPlanes, seed).as("b"))
      .head().getLong(0)
    df.withColumn("bucket", hyperplane_lsh(col(vecCol), numPlanes, seed))
      .filter(col("bucket") === qBucket)
      .select(col(idCol).as("id"), round(cosine(col(vecCol), q), 6).as("sim"))
      .orderBy(col("sim").desc, col("id"))
      .limit(k)
  }

  /**
   * ANN top-k with DATA-DERIVED hyperplanes: the `numPlanes` lowest-id
   * vectors act as projection normals (a cheap stand-in for sampled/learned
   * projections), bucket bit j = sign(dot(v, plane_j)). Fully deterministic
   * from the data — no engine-private RNG — so an external oracle can
   * rebuild the whole index; [[lshTopK]]'s murmur-seeded planes remain the
   * data-independent variant. Same scale shape: one codegen'd pass computes
   * buckets, the probe touches one bucket.
   */
  def dataPlaneLshTopK(
      df: DataFrame,
      vecCol: String,
      idCol: String,
      queryVec: Seq[Float],
      k: Int,
      numPlanes: Int = 6): DataFrame = {
    val planes = df.select(col(idCol).as("id"), col(vecCol).as("v"))
      .orderBy(col("id")).limit(numPlanes)
      .collect().map(_.getAs[scala.collection.Seq[Float]]("v").toSeq)
    def bucketOf(vec: Column): Column =
      planes.zipWithIndex.map { case (p, j) =>
        when(dot(vec, typedLit(p)) >= 0, lit(1L << j)).otherwise(lit(0L))
      }.reduce(_ + _)
    // query bucket: same sequential double fold as the column-side dot
    val qBucket = planes.zipWithIndex.map { case (p, j) =>
      val d = queryVec.zip(p).foldLeft(0.0) { case (acc, (x, y)) =>
        acc + x.toDouble * y.toDouble
      }
      if (d >= 0) 1L << j else 0L
    }.sum
    val q = typedLit(queryVec)
    df.withColumn("bucket", bucketOf(col(vecCol)))
      .filter(col("bucket") === qBucket)
      .select(col(idCol).as("id"), round(cosine(col(vecCol), q), 6).as("sim"))
      .orderBy(col("sim").desc, col("id"))
      .limit(k)
  }

  /**
   * ANN top-k over a PARTITIONED SMALL-WORLD GRAPH — the HNSW family
   * (Malkov–Yashunin 2016), completing the ANN ladder beside brute/LSH/
   * IVF/PQ/BQ: each Spark partition builds a [[HnswIndex]] over its
   * vectors (insertion in ascending-id order, hash-derived levels — fully
   * deterministic, see the kernel's scaladoc), beam-searches it with
   * `efSearch`, and the per-partition top-k merge is one
   * `TakeOrderedAndProject`. Zero shuffle of the corpus; graph memory is
   * executor-local O(n·M) per partition, the sharded-HNSW layout every
   * production vector store uses.
   *
   * Recall: exact when `efSearch` covers the partition (the gate regime —
   * the DuckDB oracle verifies equality with brute force end-to-end);
   * sub-linear beam search with measured recall below that (HnswSpec
   * pins the recall floor in the true ANN regime). Similarities are the
   * same fold as the codegen'd cosine kernel and rounded HALF_UP to 6,
   * so scores merge exactly with the column-side operators.
   */
  def hnswTopK(
      df: DataFrame,
      vecCol: String,
      idCol: String,
      queryVec: Seq[Float],
      k: Int,
      m: Int = 16,
      efConstruction: Int = 128,
      efSearch: Int = 512): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val q = queryVec.toArray
    df.select(col(idCol).cast("long").as("id"),
        col(vecCol).cast("array<float>").as("v"))
      .as[(Long, Array[Float])]
      .mapPartitions { it =>
        val pts = it.toArray.sortBy(_._1)
        if (pts.isEmpty) Iterator.empty
        else {
          val idx = new HnswIndex(m, efConstruction)
          pts.foreach { case (id, v) => idx.add(id, v) }
          idx.searchKnn(q, math.max(efSearch, k), k).iterator.map {
            case (id, sim) =>
              (id, BigDecimal(sim)
                .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
          }
        }
      }
      .toDF("id", "sim")
      .orderBy(col("sim").desc, col("id"))
      .limit(k)
  }

  /**
   * Persist a sharded HNSW index: vectors shard by a stable content hash
   * of the id, each shard builds its deterministic [[HnswIndex]] on the
   * executor, and the graph is serialized as plain parquet rows
   * `(shard, id, v, level, nbrs)` with neighbor references BY ID — the
   * build-once/serve-many layout ([[ivfIndexWrite]]'s HNSW sibling).
   * Rebuilding on ingest is the expensive step of any graph ANN index;
   * persisting the adjacency makes every probe reconstruction-only (no
   * distance computations, no graph construction).
   */
  def hnswIndexWrite(
      df: DataFrame,
      vecCol: String,
      idCol: String,
      path: String,
      shards: Int = 16,
      m: Int = 16,
      efConstruction: Int = 128): Unit = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long").as("id"),
        col(vecCol).cast("array<float>").as("v"),
        pmod(Dedup.md5Hash60(col(idCol).cast("string")), lit(shards.toLong))
          .cast("int").as("shard"))
      .as[(Long, Array[Float], Int)]
      .groupByKey(_._3)
      .flatMapGroups { (shard, it) =>
        val idx = new HnswIndex(m, efConstruction)
        it.toArray.sortBy(_._1).foreach { case (id, v, _) => idx.add(id, v) }
        idx.exportNodes().map { case (id, v, lvl, nbrs) =>
          (shard, id, v, lvl, nbrs)
        }
      }
      .toDF("shard", "id", "v", "level", "nbrs")
      .write.mode("overwrite").partitionBy("shard").parquet(path)
  }

  /**
   * Incremental insert into a persisted [[hnswIndexWrite]] layout: new
   * vectors shard by the SAME id hash, each touched shard's graph is
   * reconstructed and the new nodes are INSERTED — HNSW insertion is
   * online, so there is no global rebuild — and only the touched shard
   * partitions are rewritten (dynamic partition overwrite). Untouched
   * shards are never read or written: append cost is O(touched shards),
   * the [[ivfIndexAppend]] contract with the graph maintained instead of
   * a file dropped in a cell. Probes see the new vectors immediately.
   */
  def hnswIndexAppend(
      df: DataFrame,
      vecCol: String,
      idCol: String,
      path: String,
      shards: Int = 16,
      m: Int = 16,
      efConstruction: Int = 128): Unit = {
    val spark = df.sparkSession
    import spark.implicits._
    // level = -1 marks fresh vectors (graph rows are always >= 0)
    val fresh = df.select(col(idCol).cast("long").as("id"),
        col(vecCol).cast("array<float>").as("v"),
        pmod(Dedup.md5Hash60(col(idCol).cast("string")), lit(shards.toLong))
          .cast("int").as("shard"),
        lit(-1).as("level"),
        typedLit(Seq.empty[Seq[Long]]).as("nbrs"))
    val touched = fresh.select(col("shard")).distinct()
      .as[Int].collect().toSeq // bounded: at most `shards` values
    val existing = spark.read.parquet(path)
      .filter(col("shard").isin(touched.map(Integer.valueOf): _*))
      .select(col("id"), col("v"), col("shard").cast("int").as("shard"),
        col("level").cast("int").as("level"), col("nbrs"))
    val all = existing
      .unionByName(fresh.select("id", "v", "shard", "level", "nbrs"))
      .as[(Long, Array[Float], Int, Int, Seq[Seq[Long]])]
    val rebuilt = all.groupByKey(_._3).flatMapGroups { (shard, it) =>
      val rows = it.toArray
      val (old, add) = rows.partition(_._4 >= 0)
      val idx = HnswIndex.fromAdjacency(m, efConstruction,
        old.map(r => (r._1, r._2, r._4, r._5)).toSeq)
      // IDEMPOTENT insert: ids already in the graph are skipped (and the
      // batch itself dedups by id). The documented streaming-maintenance
      // path is foreachBatch — at-least-once — so a replayed epoch
      // re-appends every vector of that batch; without the skip each
      // replay would insert DUPLICATE graph nodes and skew probes.
      // (Append is insert-if-absent; changing an id's vector is a
      // delete + re-append.)
      val present = old.iterator.map(_._1).toSet
      add.filter(r => !present.contains(r._1)).sortBy(_._1)
        .distinctBy(_._1).foreach(r => idx.add(r._1, r._2))
      idx.exportNodes().map { case (id, v, lvl, nbrs) =>
        (shard, id, v, lvl, nbrs)
      }
    }.toDF("shard", "id", "v", "level", "nbrs")
    val prev = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try rebuilt.write.mode("overwrite").partitionBy("shard").parquet(path)
    finally prev match {
      case Some(v) => spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
      case None => spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
    }
    // re-appending a TOMBSTONED id resurrects it: drop it from the side
    // table (bounded — the tombstone set is deletes-since-compaction)
    val dead = hnswTombstones(spark, path)
    if (dead.nonEmpty) {
      val res = fresh.filter(col("id").isin(dead.toSeq.map(Long.box): _*))
        .select(col("id")).distinct().as[Long].collect().toSet
      if (res.nonEmpty) {
        val t = new org.apache.hadoop.fs.Path(s"$path/_tombstones")
        val fs = t.getFileSystem(spark.sparkContext.hadoopConfiguration)
        fs.delete(t, true)
        val remaining = (dead -- res).toSeq
        if (remaining.nonEmpty) hnswIndexDelete(spark, path, remaining)
      }
    }
  }

  /**
   * DELETE ids from a persisted [[hnswIndexWrite]] layout — tombstones,
   * not graph surgery: removing nodes would tear the small-world
   * connectivity, so deletes append to a `_tombstones/` side table
   * (underscore-prefixed: invisible to the index scan) and probes filter
   * them from the beam OUTPUT while still traversing them — the standard
   * mark-delete treatment of every production graph-ANN store.
   * [[hnswIndexCompact]] physically rebuilds once tombstones accumulate.
   * Idempotent (re-deleting is a no-op at probe time); unknown ids are
   * harmless.
   */
  def hnswIndexDelete(
      spark: org.apache.spark.sql.SparkSession,
      path: String,
      ids: Seq[Long]): Unit = {
    import spark.implicits._
    if (ids.nonEmpty)
      ids.toDF("id").write.mode("append").parquet(s"$path/_tombstones")
  }

  /** The index's live tombstone set — bounded by deletes since the last
    * compaction (compaction clears it); ships to executors inside the
    * probe closures. */
  private def hnswTombstones(
      spark: org.apache.spark.sql.SparkSession, path: String): Set[Long] = {
    import spark.implicits._
    val p = new org.apache.hadoop.fs.Path(s"$path/_tombstones")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) Set.empty
    else spark.read.parquet(p.toString).select(col("id").cast("long"))
      .as[Long].collect().toSet
  }

  /**
   * COMPACT a persisted HNSW index: rebuild every shard's graph WITHOUT
   * the tombstoned ids (fresh deterministic insertion — levels are
   * id-derived, so the result equals an index never containing them),
   * overwrite the layout, and clear the tombstone table. Run it once
   * tombstones pass a deployment's threshold (e.g. 10–20% of the index);
   * until then probes pay only the result-filter. The rebuilt rows are
   * localCheckpoint-materialized before the overwrite so the write never
   * reads the files it is replacing.
   */
  def hnswIndexCompact(
      spark: org.apache.spark.sql.SparkSession,
      path: String,
      m: Int = 16,
      efConstruction: Int = 128): Unit = {
    import spark.implicits._
    val dead = hnswTombstones(spark, path)
    val rebuilt = spark.read.parquet(path)
      .select(col("shard").cast("int"), col("id"), col("v"))
      .as[(Int, Long, Array[Float])]
      .filter(r => !dead.contains(r._2))
      .groupByKey(_._1)
      .flatMapGroups { (shard, it) =>
        val idx = new HnswIndex(m, efConstruction)
        it.toArray.sortBy(_._2).foreach { case (_, id, v) => idx.add(id, v) }
        idx.exportNodes().map { case (id, v, lvl, nbrs) =>
          (shard, id, v, lvl, nbrs)
        }
      }
      .toDF("shard", "id", "v", "level", "nbrs")
      .localCheckpoint(true)
    rebuilt.write.mode("overwrite").partitionBy("shard").parquet(path)
    val t = new org.apache.hadoop.fs.Path(s"$path/_tombstones")
    val fs = t.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(t)) fs.delete(t, true)
  }

  /**
   * Probe a persisted [[hnswIndexWrite]] layout: each shard's adjacency is
   * reconstructed (id → index remap, entry re-derived by the builder's
   * rule — byte-identical search behavior to the exported graph, spec'd)
   * and beam-searched; the per-shard top-k merge is one TakeOrdered.
   * Every shard is probed — HNSW sharding is hash-split, not
   * centroid-routed like IVF — but each probe is sub-linear beam work,
   * and shards probe in parallel across executors. Tombstoned ids
   * ([[hnswIndexDelete]]) are excluded from the beam output exactly.
   */
  def hnswIndexProbe(
      spark: org.apache.spark.sql.SparkSession,
      path: String,
      queryVec: Seq[Float],
      k: Int,
      m: Int = 16,
      efConstruction: Int = 128,
      efSearch: Int = 512): DataFrame = {
    import spark.implicits._
    val q = queryVec.toArray
    val dead = hnswTombstones(spark, path)
    spark.read.parquet(path)
      .select(col("shard").cast("int"), col("id"), col("v"),
        col("level").cast("int"), col("nbrs"))
      .as[(Int, Long, Array[Float], Int, Seq[Seq[Long]])]
      .groupByKey(_._1)
      .flatMapGroups { (_, it) =>
        val rows = it.map(r => (r._2, r._3, r._4, r._5)).toSeq
        val idx = HnswIndex.fromAdjacency(m, efConstruction, rows)
        idx.searchKnn(q, math.max(efSearch, k), k, dead.contains).iterator.map {
          case (id, sim) =>
            (id, BigDecimal(sim)
              .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
        }
      }
      .toDF("id", "sim")
      .orderBy(col("sim").desc, col("id"))
      .limit(k)
  }

  /**
   * BATCH probe of a persisted [[hnswIndexWrite]] layout: top-k for MANY
   * query vectors in one pass. Each shard's graph is reconstructed ONCE
   * and beam-searched for every query — the per-probe reconstruction
   * cost of [[hnswIndexProbe]] amortizes across the whole query batch,
   * which is the realistic serving shape (rerank candidates, offline
   * kNN joins, eval sweeps). Per-query global top-k is a rank window
   * over the ≤ shards·k per-query candidates (WindowGroupLimit prunes
   * below the exchange). Returns (query_id, id, sim).
   */
  def hnswIndexProbeBatch(
      spark: org.apache.spark.sql.SparkSession,
      path: String,
      queries: Seq[(Long, Seq[Float])],
      k: Int,
      m: Int = 16,
      efConstruction: Int = 128,
      efSearch: Int = 512): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import spark.implicits._
    val qArr = queries.map { case (qid, v) => (qid, v.toArray) }
    val dead = hnswTombstones(spark, path)
    spark.read.parquet(path)
      .select(col("shard").cast("int"), col("id"), col("v"),
        col("level").cast("int"), col("nbrs"))
      .as[(Int, Long, Array[Float], Int, Seq[Seq[Long]])]
      .groupByKey(_._1)
      .flatMapGroups { (_, it) =>
        val rows = it.map(r => (r._2, r._3, r._4, r._5)).toSeq
        val idx = HnswIndex.fromAdjacency(m, efConstruction, rows)
        qArr.iterator.flatMap { case (qid, q) =>
          idx.searchKnn(q, math.max(efSearch, k), k, dead.contains).iterator.map {
            case (id, sim) =>
              (qid, id, BigDecimal(sim)
                .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
          }
        }
      }
      .toDF("query_id", "id", "sim")
      .withColumn("rk", row_number().over(Window.partitionBy(col("query_id"))
        .orderBy(col("sim").desc, col("id"))))
      .filter(col("rk") <= k)
      .select(col("query_id"), col("id"), col("sim"))
  }

  /**
   * Multi-probe variant of [[dataPlaneLshTopK]]: additionally scans every
   * bucket at Hamming distance ≤ `flips` from the query's bucket (flip
   * each hyperplane sign bit in turn — the points most likely to be near
   * misses sit just across ONE hyperplane, the multi-probe LSH insight of
   * Lv et al., VLDB'07). Probing 1+numPlanes buckets of one table buys
   * the recall that would otherwise cost numPlanes independent hash
   * tables — i.e., numPlanes× the index storage. [[annRecallAtK]] is the
   * gate that measures exactly this trade.
   *
   * Scale shape: identical to single-probe — one codegen'd bucket
   * projection, one `IN` filter over 1+numPlanes bucket ids (partition-
   * prunable under the IVF-style persisted layout), top-k via
   * TakeOrdered. The candidate set grows (numPlanes+1)/2^numPlanes of the
   * corpus in expectation, still never all-pairs.
   */
  def dataPlaneLshTopKMultiProbe(
      df: DataFrame,
      vecCol: String,
      idCol: String,
      queryVec: Seq[Float],
      k: Int,
      numPlanes: Int = 6,
      flips: Int = 1): DataFrame = {
    require(flips <= 1, "only 1-flip probing implemented")
    val planes = df.select(col(idCol).as("id"), col(vecCol).as("v"))
      .orderBy(col("id")).limit(numPlanes)
      .collect().map(_.getAs[scala.collection.Seq[Float]]("v").toSeq)
    def bucketOf(vec: Column): Column =
      planes.zipWithIndex.map { case (p, j) =>
        when(dot(vec, typedLit(p)) >= 0, lit(1L << j)).otherwise(lit(0L))
      }.reduce(_ + _)
    val qBucket = planes.zipWithIndex.map { case (p, j) =>
      val d = queryVec.zip(p).foldLeft(0.0) { case (acc, (x, y)) =>
        acc + x.toDouble * y.toDouble
      }
      if (d >= 0) 1L << j else 0L
    }.sum
    val probed: Seq[Long] =
      if (flips == 0) Seq(qBucket)
      else qBucket +: planes.indices.map(j => qBucket ^ (1L << j))
    val q = typedLit(queryVec)
    df.withColumn("bucket", bucketOf(col(vecCol)))
      .filter(col("bucket").isin(probed: _*))
      .select(col(idCol).as("id"), round(cosine(col(vecCol), q), 6).as("sim"))
      .orderBy(col("sim").desc, col("id"))
      .limit(k)
  }

  /** [[cosinePairs]] with DATA-DERIVED planes (lowest-id vectors as
    * normals, like [[dataPlaneLshTopK]]): deterministic bucketing, so the
    * whole near-dup pass — buckets, candidate pairs, scores — is
    * oracle-replayable. Same scale shape: bucket in one codegen'd pass,
    * quadratic term bounded per bucket. */
  def dataPlaneCosinePairs(
      df: DataFrame,
      vecCol: String,
      idCol: String,
      threshold: Double,
      numPlanes: Int = 4): DataFrame = {
    val planes = df.select(col(idCol).as("id"), col(vecCol).as("v"))
      .orderBy(col("id")).limit(numPlanes)
      .collect().map(_.getAs[scala.collection.Seq[Float]]("v").toSeq)
    def bucketOf(vec: Column): Column =
      planes.zipWithIndex.map { case (p, j) =>
        when(dot(vec, typedLit(p)) >= 0, lit(1L << j)).otherwise(lit(0L))
      }.reduce(_ + _)
    val bucketed = df.select(col(idCol).as("id"), col(vecCol).as("v"))
      .withColumn("bucket", bucketOf(col("v")))
    bucketed.as("a").join(bucketed.as("b"),
        col("a.bucket") === col("b.bucket") && col("a.id") < col("b.id"))
      .withColumn("sim", cosine(col("a.v"), col("b.v")))
      .filter(col("sim") >= threshold)
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        round(col("sim"), 6).as("sim"))
  }

  /**
   * k-NN JOIN: for EVERY vector, its top-k most-similar neighbors among
   * vectors sharing its (data-derived) LSH bucket — ANN as a join, the
   * shape batch pipelines actually need at 100 TB ("attach each document's
   * near neighbors"), where per-query top-k ([[dataPlaneLshTopK]]) would
   * mean one job per query. One bucketing pass, one bucket-equi self-join
   * (quadratic only within buckets), one window rank partitioned by the
   * left id — three exchanges total, none over more than the bucketed
   * candidate pairs. Returns (id, neighbor_id, nn_rank, sim).
   */
  def knnJoin(
      df: DataFrame,
      vecCol: String,
      idCol: String,
      k: Int,
      numPlanes: Int = 4): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val planes = df.select(col(idCol).as("id"), col(vecCol).as("v"))
      .orderBy(col("id")).limit(numPlanes)
      .collect().map(_.getAs[scala.collection.Seq[Float]]("v").toSeq)
    def bucketOf(vec: Column): Column =
      planes.zipWithIndex.map { case (p, j) =>
        when(dot(vec, typedLit(p)) >= 0, lit(1L << j)).otherwise(lit(0L))
      }.reduce(_ + _)
    val bucketed = df.select(col(idCol).as("id"), col(vecCol).as("v"))
      .withColumn("bucket", bucketOf(col("v")))
    val w = Window.partitionBy(col("id")).orderBy(col("sim").desc, col("neighbor_id"))
    bucketed.as("a").join(bucketed.as("b"),
        col("a.bucket") === col("b.bucket") && col("a.id") =!= col("b.id"))
      .select(col("a.id").as("id"), col("b.id").as("neighbor_id"),
        round(cosine(col("a.v"), col("b.v")), 6).as("sim"))
      .withColumn("nn_rank", row_number().over(w))
      .filter(col("nn_rank") <= k)
      // LONG to match any BIGINT-producing oracle engine byte-for-byte
      .select(col("id"), col("neighbor_id"), col("nn_rank").cast("long").as("nn_rank"),
        col("sim"))
  }

  /** k-NN label classification (weak labeling): each probe gets the
    * majority label of its `k` nearest LABELED corpus neighbors within its
    * LSH bucket — ties break toward more votes, then the smaller label.
    * The batch "attach labels to every new document" shape: one bucket
    * join (never probe × corpus), local top-k pruned below the shuffle
    * (WindowGroupLimit), one vote aggregate. Probes in a bucket with no
    * corpus member are absent from the output (no neighbors = no vote). */
  def knnClassify(
      probes: DataFrame,
      corpus: DataFrame,
      vecCol: String,
      idCol: String,
      labelCol: String,
      k: Int,
      numPlanes: Int = 4): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val planes = corpus.select(col(idCol).as("id"), col(vecCol).as("v"))
      .orderBy(col("id")).limit(numPlanes)
      .collect().map(_.getAs[scala.collection.Seq[Float]]("v").toSeq)
    def bucketOf(vec: Column): Column =
      planes.zipWithIndex.map { case (p, j) =>
        when(dot(vec, typedLit(p)) >= 0, lit(1L << j)).otherwise(lit(0L))
      }.reduce(_ + _)
    val pb = probes.select(col(idCol).as("id"), col(vecCol).as("v"))
      .withColumn("bucket", bucketOf(col("v")))
    val cb = corpus.select(col(idCol).as("nid"), col(labelCol).as("label"),
        col(vecCol).as("w"))
      .withColumn("bucket", bucketOf(col("w")))
    val wRank = Window.partitionBy(col("id")).orderBy(col("sim").desc, col("nid"))
    val neighbors = pb.join(cb, "bucket")
      .select(col("id"), col("nid"), col("label"),
        round(cosine(col("v"), col("w")), 6).as("sim"))
      .withColumn("r", row_number().over(wRank))
      .filter(col("r") <= k)
    val wVote = Window.partitionBy(col("id"))
      .orderBy(col("votes").desc, col("label"))
    neighbors.groupBy(col("id"), col("label"))
      .agg(count(lit(1)).as("votes"))
      .withColumn("vr", row_number().over(wVote))
      .filter(col("vr") === 1)
      .select(col("id"), col("label").cast("long").as("pred_label"),
        col("votes").cast("long").as("votes"))
  }

  /** Embedding near-dup pairs (cosine ≥ threshold), LSH-bucketed: pairs are
    * only scored within a bucket. With `numPlanes` small the recall is high;
    * exactness on a given dataset is checked against the brute-force path in
    * the spec. */
  def cosinePairs(
      df: DataFrame,
      vecCol: String,
      idCol: String,
      threshold: Double,
      numPlanes: Int = 6,
      seed: Int = 7): DataFrame = {
    val bucketed = df.select(col(idCol).as("id"), col(vecCol).as("v"))
      .withColumn("bucket", hyperplane_lsh(col("v"), numPlanes, seed))
    bucketed.as("a").join(bucketed.as("b"),
        col("a.bucket") === col("b.bucket") && col("a.id") < col("b.id"))
      .withColumn("sim", cosine(col("a.v"), col("b.v")))
      .filter(col("sim") >= threshold)
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        round(col("sim"), 6).as("sim"))
  }

  /**
   * IVF (inverted-file) ANN: coarse-quantize every vector to its nearest of
   * `nCells` centroid vectors (deterministically sampled from the data —
   * a real deployment would k-means them; the index structure and probe
   * path are identical), then answer queries by scanning only the `nProbe`
   * cells nearest the query. Complements [[lshTopK]]: IVF cells adapt to
   * the data distribution where LSH planes are data-independent.
   *
   * At 100 TB the cell assignment is one codegen'd pass, the cell id is a
   * partition/cluster column, and a query touches nProbe/nCells of the data.
   */
  def ivfTopK(
      df: DataFrame,
      vecCol: String,
      idCol: String,
      queryVec: Seq[Float],
      k: Int,
      nCells: Int = 8,
      nProbe: Int = 2): DataFrame = {
    val spark = df.sparkSession
    // deterministic centroid sample: the nCells lowest ids
    val centroids = df.select(col(idCol).as("id"), col(vecCol).as("v"))
      .orderBy(col("id")).limit(nCells)
      .collect().map(_.getAs[scala.collection.Seq[Float]]("v").toSeq)

    def cellOf(vec: Column): Column =
      centroids.zipWithIndex.foldLeft((lit(-1), lit(Double.MinValue))) {
        case ((bestIdx, bestSim), (c, i)) =>
          val sim = cosine(vec, typedLit(c))
          (when(sim > bestSim, lit(i)).otherwise(bestIdx),
            greatest(sim, bestSim))
      }._1

    val qCells = centroids.zipWithIndex
      .map { case (c, i) =>
        var dot = 0.0; var qq = 0.0; var cc = 0.0
        queryVec.zip(c).foreach { case (a, b) =>
          dot += a.toDouble * b.toDouble; qq += a.toDouble * a.toDouble
          cc += b.toDouble * b.toDouble
        }
        i -> dot / (math.sqrt(qq) * math.sqrt(cc))
      }
      .sortBy(-_._2).take(nProbe).map(_._1)

    val q = typedLit(queryVec)
    df.withColumn("cell", cellOf(col(vecCol)))
      .filter(col("cell").isin(qCells: _*))
      .select(col(idCol).as("id"), round(cosine(col(vecCol), q), 6).as("sim"))
      .orderBy(col("sim").desc, col("id"))
      .limit(k)
  }

  /**
   * Lloyd k-means centroids over an embedding column, as DataFrame
   * aggregations — the "real deployment" centroid path [[ivfTopK]]'s doc
   * promises:
   *
   *  - init: k-means||-style oversample-then-refine (Bahmani et al., VLDB
   *    2012): ONE parallel hash-aggregate picks `4*nCells` candidate seeds
   *    (per-bucket min of the engine-neutral md5 hash — a uniform sample,
   *    no global sort, no count pass), then a driver-side greedy
   *    farthest-point pass over that tiny candidate matrix picks `nCells`
   *    well-spread seeds deterministically;
   *  - each round: one codegen'd assignment pass (cosine argmax against the
   *    current centroids) + a per-dimension mean via `posexplode`;
   *  - only the `nCells × dim` centroid matrix crosses the driver per round
   *    — at 100 TB each round is one scan, the reduction state is tiny, and
   *    the result feeds the same one-pass cell assignment as the sampled
   *    variant.
   */
  def kmeansCentroids(
      df: DataFrame,
      vecCol: String,
      idCol: String,
      nCells: Int,
      iters: Int = 3): Array[Seq[Double]] = {
    val vecs = df.select(col(idCol).as("id"), col(vecCol).as("v"))
    // Candidate seeds: per-bucket min-hash representative. One partial-agg
    // hash-aggregate pass — every partition combines locally, only
    // 4*nCells rows reach the driver. No global sort, no count() pass.
    val h = Dedup.md5Hash60(col("id").cast("string"))
    val nBuckets = 4 * nCells
    val candidates: Array[Seq[Double]] = vecs
      .groupBy(pmod(h, lit(nBuckets.toLong)).as("bucket"))
      .agg(min_by(col("v"), struct(h, col("id"))).as("v"))
      .orderBy(col("bucket"))
      .collect()
      .map(_.getAs[scala.collection.Seq[Float]]("v").toSeq.map(_.toDouble))

    def cosSim(a: Seq[Double], b: Seq[Double]): Double = {
      var d = 0.0; var aa = 0.0; var bb = 0.0
      a.zip(b).foreach { case (x, y) => d += x * y; aa += x * x; bb += y * y }
      d / (math.sqrt(aa) * math.sqrt(bb))
    }
    // Greedy farthest-point refinement on the driver (candidate matrix is
    // ≤ 4*nCells × dim — same bounded size as the centroid matrix itself).
    // Deterministic: starts at bucket 0's rep, ties resolve to the lowest
    // candidate index.
    val seeds = scala.collection.mutable.ArrayBuffer(candidates.head)
    while (seeds.size < nCells && seeds.size < candidates.length) {
      val next = candidates.maxBy(c => -seeds.map(s => cosSim(c, s)).max)
      seeds += next
    }
    var centroids: Array[Seq[Double]] = seeds.toArray

    for (_ <- 0 until iters) {
      val assigned = vecs.withColumn("cell", cellOf(centroids.toSeq)(col("v")))
      val dims = assigned
        .select(col("cell"), posexplode(col("v")).as(Seq("pos", "x")))
        .groupBy(col("cell"), col("pos"))
        .agg(avg(col("x").cast("double")).as("m"))
        .collect()
      val byCell = dims.groupBy(_.getInt(0))
      centroids = centroids.zipWithIndex.map { case (old, c) =>
        byCell.get(c) match {
          case Some(rows) => rows.sortBy(_.getInt(1)).map(_.getDouble(2)).toSeq
          case None => old // empty cell keeps its centroid
        }
      }
    }
    centroids
  }

  /** Nearest-centroid (cosine argmax, lowest index wins ties) as a codegen'd
    * column expression. */
  private[operators] def cellOf(centroids: Seq[Seq[Double]])(vec: Column): Column =
    centroids.zipWithIndex.foldLeft((lit(-1), lit(Double.MinValue))) {
      case ((bestIdx, bestSim), (c, i)) =>
        val sim = cosine(vec, typedLit(c))
        (when(sim > bestSim, lit(i)).otherwise(bestIdx),
          greatest(sim, bestSim))
    }._1

  /** [[ivfTopK]] with k-means centroids: same index structure and probe
    * path, centroids adapted to the data distribution — the variant to use
    * when the corpus is skewed (see `SimilaritySpec`'s recall comparison). */
  def ivfTopKKmeans(
      df: DataFrame,
      vecCol: String,
      idCol: String,
      queryVec: Seq[Float],
      k: Int,
      nCells: Int = 8,
      nProbe: Int = 2,
      iters: Int = 3): DataFrame = {
    val centroids = kmeansCentroids(df, vecCol, idCol, nCells, iters)
    val qCells = centroids.zipWithIndex
      .map { case (c, i) =>
        var d = 0.0; var qq = 0.0; var cc = 0.0
        queryVec.map(_.toDouble).zip(c).foreach { case (a, b) =>
          d += a * b; qq += a * a; cc += b * b
        }
        i -> d / (math.sqrt(qq) * math.sqrt(cc))
      }
      .sortBy(-_._2).take(nProbe).map(_._1)
    val q = typedLit(queryVec)
    df.withColumn("cell", cellOf(centroids.toSeq)(col(vecCol)))
      .filter(col("cell").isin(qCells: _*))
      .select(col(idCol).as("id"), round(cosine(col(vecCol), q), 6).as("sim"))
      .orderBy(col("sim").desc, col("id"))
      .limit(k)
  }

  private def cosSimD(a: Seq[Double], b: Seq[Double]): Double = {
    var d = 0.0; var aa = 0.0; var bb = 0.0
    a.zip(b).foreach { case (x, y) => d += x * y; aa += x * x; bb += y * y }
    d / (math.sqrt(aa) * math.sqrt(bb))
  }

  /**
   * Persist an IVF index PARTITIONED BY CELL (one directory per cell):
   * the assignment pass runs once at build time and the layout makes
   * every probe's `cell IN (...)` filter a PARTITION PRUNE — the scan
   * physically lists and reads only the nProbe probed cells' directories
   * (`PartitionFilters` in the plan, `numFiles` ≈ nProbe/nCells of the
   * corpus), not just a post-scan filter. This is the 100 TB posture for
   * a query-heavy corpus: [[ivfTopK]] re-assigns cells per query (fine
   * for one-off), the index layout amortizes assignment AND I/O across
   * every probe — the same move as [[Bucketing]]'s pre-shuffled join
   * layout. (partitionBy, not bucketBy: Spark's planner auto-disables
   * bucketed scans for filter-only queries, dropping bucket pruning with
   * them; directory partitions always prune.)
   */
  def ivfIndexWrite(
      df: DataFrame,
      vecCol: String,
      idCol: String,
      centroids: Seq[Seq[Double]],
      path: String): Unit =
    df.select(col(idCol).as("id"), col(vecCol).as("v"))
      .withColumn("cell", cellOf(centroids)(col("v")))
      .write.mode("overwrite").partitionBy("cell").parquet(path)

  /** Incremental insert into a persisted [[ivfIndexWrite]] layout: new
    * vectors are assigned to cells with the SAME frozen centroids and
    * appended as new files inside their cell directories — no rebuild, no
    * touch of existing files, probes see them immediately. The standard
    * vector-store ingest path: centroids only retrain when drift warrants
    * a full [[ivfIndexWrite]] (the append/rebuild split every IVF system
    * has). */
  def ivfIndexAppend(
      df: DataFrame,
      vecCol: String,
      idCol: String,
      centroids: Seq[Seq[Double]],
      path: String): Unit =
    df.select(col(idCol).as("id"), col(vecCol).as("v"))
      .withColumn("cell", cellOf(centroids)(col("v")))
      .write.mode("append").partitionBy("cell").parquet(path)

  /**
   * Compact a persisted [[ivfIndexWrite]] layout: within each cell
   * directory, merge every group of ≥ `minRun` files smaller than
   * `smallBytes` into one file. [[ivfIndexAppend]] leaves one file per
   * append micro-batch per cell; at vector-store ingest rates that long
   * tail of tiny files inflates open-file counts and object-store request
   * rates on every probe — the same pathology
   * [[graft.sources.PolarCompaction]] fixes for log segments, minus the
   * registry (a plain partitioned-parquet layout has no metadata CAS, so
   * the swap is not atomic: the merged file lands FIRST, then the
   * originals are deleted — a probe planned exactly across the swap can
   * transiently double-count the compacted tail; run in the ingest
   * maintenance window, like every filesystem-table compactor).
   *
   * Row content, cell assignment and probe results are byte-preserved —
   * only the file layout changes. Returns the number of cells compacted.
   */
  def ivfIndexCompact(
      spark: org.apache.spark.sql.SparkSession,
      path: String,
      smallBytes: Long = 64L << 20,
      minRun: Int = 2): Int = {
    import org.apache.hadoop.fs.Path
    val root = new Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val cellDirs = fs.listStatus(root)
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("cell="))
    var compacted = 0
    cellDirs.foreach { cd =>
      val small = fs.listStatus(cd.getPath).filter { f =>
        val n = f.getPath.getName
        f.isFile && n.endsWith(".parquet") && !n.startsWith("_") &&
          !n.startsWith(".") && f.getLen < smallBytes
      }
      if (small.length >= minRun) {
        val suffix = java.util.UUID.randomUUID().toString.take(8)
        val tmp = new Path(root, s".compact_tmp-$suffix")
        spark.read.parquet(small.map(_.getPath.toString).toIndexedSeq: _*)
          .coalesce(1).write.parquet(tmp.toString)
        val part = fs.listStatus(tmp)
          .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
          .head.getPath
        val dest = new Path(cd.getPath, s"compact-$suffix.parquet")
        // HDFS/object-store rename signals failure by returning FALSE, not
        // by throwing — deleting the originals after an unchecked rename
        // would lose the cell's vectors (merged file still inside tmp, then
        // removed with it). Originals are only deleted once the merged file
        // is confirmed in place.
        val renamed =
          try fs.rename(part, dest)
          catch { case scala.util.control.NonFatal(e) =>
            fs.delete(tmp, true); throw e }
        if (!renamed) {
          fs.delete(tmp, true)
          throw new IllegalStateException(
            s"ivfIndexCompact: rename $part -> $dest failed; " +
              "cell left untouched (originals preserved)")
        }
        small.foreach(f => fs.delete(f.getPath, false))
        fs.delete(tmp, true)
        compacted += 1
      }
    }
    compacted
  }

  /** Probe a persisted [[ivfIndexWrite]] layout: rank centroids by query
    * cosine, scan only the `nProbe` nearest cells' directories. Same
    * probe semantics as [[ivfTopK]] (stable tie-break to the lower cell
    * index). */
  def ivfIndexProbe(
      spark: org.apache.spark.sql.SparkSession,
      path: String,
      centroids: Seq[Seq[Double]],
      queryVec: Seq[Float],
      k: Int,
      nProbe: Int): DataFrame = {
    val qd = queryVec.map(_.toDouble)
    val qCells = centroids.zipWithIndex
      .map { case (c, i) => i -> cosSimD(qd, c) }
      .sortBy(-_._2).take(nProbe).map(_._1)
    val q = typedLit(queryVec)
    spark.read.parquet(path)
      .filter(col("cell").isin(qCells: _*))
      .select(col("id"), round(cosine(col("v"), q), 6).as("sim"))
      .orderBy(col("sim").desc, col("id"))
      .limit(k)
  }

  /**
   * Deterministic PQ codebooks SAMPLED from the data: for subspace j, the
   * `k` lowest-id vectors' j-th subvectors are the centroids — the PQ
   * analog of [[ivfTopK]]'s sampled coarse centroids, fully
   * oracle-replayable. Returns m × k × (dim/m). The trained variant is
   * [[pqKmeansCodebooks]] (spec-verified, like [[ivfTopKKmeans]]).
   */
  def pqSampledCodebooks(
      df: DataFrame,
      vecCol: String,
      idCol: String,
      m: Int,
      k: Int): Array[Array[Array[Double]]] = {
    // PQ here quantizes UNIT vectors (the whole similarity family ranks
    // by cosine); seeds are normalized with the same sequential fold the
    // column kernels and the oracle use
    val seeds = df.select(col(idCol).as("id"), col(vecCol).as("v"))
      .orderBy(col("id")).limit(k).collect()
      .map { r =>
        val a = r.getAs[scala.collection.Seq[Float]]("v").toArray.map(_.toDouble)
        val n = math.sqrt(a.foldLeft(0.0)((s, x) => s + x * x))
        a.map(_ / n)
      }
    val sub = seeds.head.length / m
    Array.tabulate(m)(j => seeds.map(_.slice(j * sub, (j + 1) * sub)))
  }

  /** PQ codebooks TRAINED per subspace with the existing
    * [[kmeansCentroids]] machinery (one projection per subspace — each
    * round is still one scan + tiny driver matrix, now ×m subspaces).
    * Codebooks adapt to each subspace's distribution, which is the whole
    * point of PQ over scalar quantization. */
  def pqKmeansCodebooks(
      df: DataFrame,
      vecCol: String,
      idCol: String,
      m: Int,
      k: Int,
      iters: Int = 3): Array[Array[Array[Double]]] = {
    val dim = df.select(col(vecCol)).head()
      .getAs[scala.collection.Seq[Float]](0).length
    val sub = dim / m
    // full-vector normalization (cast back to float for the kmeans
    // reader) so trained centroids live on the same unit scale the
    // encoder compares against
    val vn = Curation.bindOnce(norm(col(vecCol)))(n =>
      transform(col(vecCol), x => (x.cast("double") / n).cast("float")))
    Array.tabulate(m) { j =>
      val projected = df.select(col(idCol),
        slice(vn, j * sub + 1, sub).as("__sub"))
      kmeansCentroids(projected, "__sub", idCol, k, iters).map(_.toArray)
    }
  }

  /**
   * ANN top-k by PRODUCT QUANTIZATION with asymmetric distance scoring
   * (Jégou et al., "Product Quantization for Nearest Neighbor Search",
   * TPAMI 2011) — the compression rung above [[sq8TopK]]: each vector is
   * stored as m small codes (m·log₂k bits, here 4 codes of 3 bits vs
   * 64 bytes of SQ8 levels), and the query is NOT quantized — its exact
   * per-subspace dot products against the codebook are precomputed into
   * an m × k table on the driver, so scoring a vector is m table lookups
   * and m−1 additions inside codegen. Encoding picks each subspace's
   * centroid by the rank-equivalent L2 form (c·c − 2 s·c — the
   * per-vector ‖s‖² constant cannot change the argmin), ties to the
   * lowest centroid index; every arithmetic step is a left-to-right IEEE
   * fold the oracle mirrors exactly. At 100 TB the corpus is one
   * codegen'd scan of the PQ codes + TakeOrdered — and the codes are
   * ~20× smaller than the float vectors.
   */
  def pqTopK(
      df: DataFrame,
      vecCol: String,
      idCol: String,
      queryVec: Seq[Float],
      k: Int,
      codebooks: Array[Array[Array[Double]]],
      rerank: Int = 0,
      materializeMaxRows: Long = 2000000L): DataFrame = {
    val m = codebooks.length
    val sub = codebooks(0)(0).length
    // unit vectors, materialized behind the same size-gated barrier as
    // [[sq8TopK]] (without the cut, projection collapse inlines the norm
    // into every per-element division — O(dim²) per encode probe)
    val vn = divByNormOnce(col(vecCol).cast("array<double>"), norm(col(vecCol)))
    val unitBase = df.select(col(idCol).as("id"), vn.as("v"))
    val unit = graft.Materialize.pinBySize(unitBase, df, materializeMaxRows)
    def codeOf(j: Int): Column =
      codebooks(j).zipWithIndex.foldLeft((lit(-1), lit(Double.MaxValue))) {
        case ((bestI, bestD), (c, i)) =>
          val cc = c.foldLeft(0.0)((a, x) => a + x * x)
          val d = lit(cc) - lit(2.0) *
            dot(slice(col("v"), j * sub + 1, sub), typedLit(c.toSeq))
          (when(d < bestD, lit(i)).otherwise(bestI), least(d, bestD))
      }._1
    // ADC tables: exact dot(normalized query subvector, centroid),
    // driver-computed with the same sequential fold as the column kernels
    val qn = {
      val nrm = math.sqrt(queryVec.foldLeft(0.0)((a, x) =>
        a + x.toDouble * x.toDouble))
      queryVec.map(_.toDouble / nrm)
    }
    val tables: Array[Seq[Double]] = Array.tabulate(m) { j =>
      val qs = qn.slice(j * sub, (j + 1) * sub)
      codebooks(j).map(c => qs.zip(c).foldLeft(0.0)((a, p) => a + p._1 * p._2)).toSeq
    }
    val score = (0 until m).map(j =>
      element_at(typedLit(tables(j)), codeOf(j) + 1)).reduce(_ + _)
    val adc = unit.select(col("id"), round(score, 6).as("score"))
      .orderBy(col("score").desc, col("id"))
    if (rerank <= k) adc.limit(k)
    else {
      // standard PQ two-stage retrieval: ADC shortlists `rerank`
      // candidates (codes only — the compressed scan), then ONLY those
      // get exact cosine against the query. The shortlist ids are a
      // bounded driver pull (same class as a centroid matrix); the
      // re-rank scan prunes to them with an isin filter.
      val shortlist = adc.limit(rerank).collect().map(_.getLong(0))
      unit.filter(col("id").isin(shortlist.map(Long.box): _*))
        .select(col("id"),
          round(dot(col("v"), typedLit(qn.toSeq)), 6).as("score"))
        .orderBy(col("score").desc, col("id"))
        .limit(k)
    }
  }

  /**
   * Long-form class prototypes: per (label, dimension) mean of the
   * embedding column, emitted as scalar rows `(label, pos, m, n_vecs)` —
   * the shape the correctness gate verifies (array cells defeat generic
   * row comparators). `posexplode` → one (label, pos) hash-aggregate: the
   * shuffle carries one row per (label, dim), never a vector. Components
   * quantize to a 2^-20 grid BEFORE summing so the aggregate is
   * integer-exact and order-independent (a raw double sum would be
   * partition-order nondeterministic).
   */
  def classCentroidsLong(
      df: DataFrame,
      vecCol: String,
      labelCol: String): DataFrame = {
    df.select(col(labelCol).as("label"),
        posexplode(col(vecCol)).as(Seq("pos", "x")))
      .select(col("label"), col("pos"),
        floor(col("x").cast("double") * lit(1048576.0)).cast("long").as("q"))
      .groupBy(col("label"), col("pos"))
      .agg(sum(col("q")).as("sq"), count(lit(1)).as("n"))
      .select(col("label"), col("pos"),
        round(col("sq").cast("double") / col("n") / lit(1048576.0), 6).as("m"),
        col("n").as("n_vecs"))
  }

  /** [[classCentroidsLong]] re-assembled to one `array<double>` centroid
    * per label — the library shape for prototype classification /
    * semantic-dedup seeding. The per-label `collect_list` is bounded by
    * the embedding dimension (64 here), never by corpus size. */
  def classCentroids(
      df: DataFrame,
      vecCol: String,
      labelCol: String): DataFrame =
    classCentroidsLong(df, vecCol, labelCol)
      .groupBy(col("label"))
      .agg(min(col("n_vecs")).as("n_vecs"),
        transform(sort_array(collect_list(struct(col("pos"), col("m")))),
          s => s.getField("m")).as("centroid"))

  /**
   * Linear probe scoring — the deployment shape of every
   * fasttext/linear-head quality filter: `score = sigmoid(w·x + b)` with
   * the weight vector broadcast as a literal. One codegen'd projection
   * over the corpus (a single native dot per row), embarrassingly
   * parallel at any scale; train the head anywhere (e.g.
   * [[classCentroidsLong]] difference-of-centroids, or an external
   * model's exported weights) and drop it in.
   */
  def linearProbe(
      df: DataFrame,
      vecCol: String,
      idCol: String,
      weights: Seq[Double],
      bias: Double = 0.0): DataFrame =
    df.select(col(idCol).as("id"),
      round(lit(1.0) / (lit(1.0) +
        exp(-(dot(col(vecCol), typedLit(weights)) + lit(bias)))), 6).as("score"))

  /** Reliability (calibration) table for a linear probe — the eval→trust
    * loop before a classifier gates a corpus: 6-dp scores over labeled
    * vectors bucketed into `bins` fixed-width bins, each emitting
    * (n, n_pos, mean_score_ppm, pos_rate_ppm). A well-calibrated probe has
    * pos_rate ≈ mean_score per bin; systematic gaps say the threshold
    * chosen from scores will not deliver the precision it promises.
    * All outputs are exact integers (`div`), so the table is
    * order-independent and oracle-replayable; one scan + one ≤`bins`-row
    * aggregate, scoring never shuffles the corpus. */
  def probeCalibration(
      df: DataFrame,
      vecCol: String,
      labelCol: String,
      weights: Seq[Double],
      posLabel: Int,
      bins: Int = 10): DataFrame = {
    val score = round(lit(1.0) / (lit(1.0) +
      exp(-dot(col(vecCol), typedLit(weights)))), 6)
    df.filter(col(labelCol).isNotNull)
      .select(score.as("score"),
        (col(labelCol) === posLabel).cast("long").as("pos"))
      // binning on the ROUNDED score keeps the bin edge deterministic
      // across engines (the probe gate pins round-6 score equality)
      .withColumn("bin",
        least(floor(col("score") * bins).cast("int"), lit(bins - 1)))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n"), sum(col("pos")).as("n_pos"),
        sum(round(col("score") * 1e6).cast("long")).as("__sppm"))
      .select(col("bin"), col("n"), col("n_pos"),
        expr("__sppm div n").as("mean_score_ppm"),
        expr("(n_pos * 1000000) div n").as("pos_rate_ppm"))
  }

  /** Difference-of-centroids weights for [[linearProbe]]: w = c(pos) −
    * c(neg) over the integer-exact per-label means — the nearest-centroid
    * binary classifier in linear-head form, deterministic and
    * oracle-replayable. */
  def centroidProbeWeights(
      df: DataFrame,
      vecCol: String,
      labelCol: String,
      negLabel: Int,
      posLabel: Int): Seq[Double] = {
    val cents = classCentroidsLong(df.filter(col(labelCol).isin(negLabel, posLabel)),
        vecCol, labelCol)
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getDouble(2)))
    val dim = cents.map(_._2).max + 1
    val c = Map(negLabel -> new Array[Double](dim), posLabel -> new Array[Double](dim))
    cents.foreach { case (l, p, m) => c(l)(p) = m }
    (0 until dim).map(i => c(posLabel)(i) - c(negLabel)(i))
  }

  /** Per-subspace PQ code columns for [[pqIndexWrite]] (same argmin as
    * [[pqTopK]]'s inline encode). */
  private def pqCodes(codebooks: Array[Array[Array[Double]]], v: Column): Seq[Column] = {
    val m = codebooks.length
    val sub = codebooks(0)(0).length
    (0 until m).map { j =>
      codebooks(j).zipWithIndex.foldLeft((lit(-1), lit(Double.MaxValue))) {
        case ((bestI, bestD), (c, i)) =>
          val cc = c.foldLeft(0.0)((a, x) => a + x * x)
          val d = lit(cc) - lit(2.0) *
            dot(slice(v, j * sub + 1, sub), typedLit(c.toSeq))
          (when(d < bestD, lit(i)).otherwise(bestI), least(d, bestD))
      }._1.as(s"c$j")
    }
  }

  /**
   * Persist a PQ CODE index: encode once, store only (id, m small code
   * columns) — the ~20×-smaller corpus every subsequent [[pqIndexProbe]]
   * scans instead of the float vectors. The encode pass is the only time
   * the vectors are read; at 100 TB this is the difference between
   * scanning 100 TB of floats per query and scanning a few TB of codes.
   * Codebooks are the caller's to persist alongside (they are a tiny
   * driver-side matrix, like IVF centroids).
   */
  def pqIndexWrite(
      df: DataFrame,
      vecCol: String,
      idCol: String,
      codebooks: Array[Array[Array[Double]]],
      path: String): Unit = {
    val vn = divByNormOnce(col(vecCol).cast("array<double>"), norm(col(vecCol)))
    val unit = graft.Materialize.localCheckpoint(
      df.select(col(idCol).as("id"), vn.as("v")))
    unit.select(col("id") +: pqCodes(codebooks, col("v")): _*)
      .write.mode("overwrite").parquet(path)
  }

  /** Probe a persisted [[pqIndexWrite]] layout: ADC-score the code
    * columns (m table lookups + m−1 adds per row, zero vector reads),
    * identical scores to [[pqTopK]]'s inline path on the same codebooks. */
  def pqIndexProbe(
      spark: org.apache.spark.sql.SparkSession,
      path: String,
      codebooks: Array[Array[Array[Double]]],
      queryVec: Seq[Float],
      k: Int): DataFrame = {
    val m = codebooks.length
    val sub = codebooks(0)(0).length
    val qn = {
      val nrm = math.sqrt(queryVec.foldLeft(0.0)((a, x) =>
        a + x.toDouble * x.toDouble))
      queryVec.map(_.toDouble / nrm)
    }
    val tables: Array[Seq[Double]] = Array.tabulate(m) { j =>
      val qs = qn.slice(j * sub, (j + 1) * sub)
      codebooks(j).map(c => qs.zip(c).foldLeft(0.0)((a, p) => a + p._1 * p._2)).toSeq
    }
    val score = (0 until m).map(j =>
      element_at(typedLit(tables(j)), col(s"c$j") + 1)).reduce(_ + _)
    spark.read.parquet(path)
      .select(col("id"), round(score, 6).as("score"))
      .orderBy(col("score").desc, col("id"))
      .limit(k)
  }

  /**
   * Long-form embedding covariance: one row per (i, j), i ≤ j — the
   * input to PCA/whitening (the preprocessing step before semantic dedup
   * or low-rank ANN). Components quantize to a 2^-10 grid first so every
   * aggregate is an INTEGER sum (order-independent, oracle-exact); the
   * final covariance is assembled from those sums in a fixed double-op
   * order. The per-row upper-triangle explode happens inside one
   * generator projection (q computed once per row, no self-join): the
   * only shuffle is the (i, j) hash-aggregate, whose partial phase
   * collapses each task to ≤ dim(dim+3)/2 rows — at 100 TB the reduction
   * state is a dim² matrix per task, nothing more.
   */
  def covarianceLong(df: DataFrame, vecCol: String): DataFrame = {
    val dim = df.select(col(vecCol)).head()
      .getAs[scala.collection.Seq[Float]](0).length
    val qv = transform(col(vecCol).cast("array<double>"),
      x => floor(x * lit(1024.0)).cast("long"))
    // ONE corpus pass through the native second-moment aggregate
    // ([[graft.functions.VecOuterSum]]): each task folds its vectors into
    // a single [n | linear sums | upper-triangle products] long buffer,
    // partials merge element-wise, and the shuffled state is one ~17 KiB
    // array per task regardless of corpus size. The former long-form
    // explode (dim(dim+1)/2 rows PER VECTOR through a 2144-key shuffle)
    // measured 3.2 s vs 0.4 s at sf0.1 — a ~2000× row amplification that
    // only worsens with scale. The (i, j) long form the oracle compares
    // against is then generated from the ONE result row.
    val s = df.select(qv.as("q"))
      .agg(graft.functions.GraftFunctions.vec_outer_sum(col("q"), dim).as("s"))
    // upper-triangle offset of (i, j): rows before i occupy
    // Σ_{r<i}(dim−r) = i·(2·dim−i+1)/2 cells; element_at is 1-based and
    // the triangle starts after the count + dim linear cells
    val quadIdx = (i: Column, j: Column) =>
      lit(2 + dim) + (i * (lit(2 * dim) - i + 1)) / 2 + (j - i)
    s.select(col("s"), explode(sequence(lit(0), lit(dim - 1))).as("i"))
      .select(col("s"), col("i"), explode(sequence(col("i"), lit(dim - 1))).as("j"))
      .select(col("i").cast("long").as("i"), col("j").cast("long").as("j"),
        // + 0.0 canonicalizes IEEE negative zero (engines disagree on
        // round's zero sign, and -0.0 vs 0.0 breaks value hashing)
        (round(((element_at(col("s"), quadIdx(col("i"), col("j")).cast("int"))
            .cast("double") / element_at(col("s"), 1)) -
          (element_at(col("s"), col("i").cast("int") + 2).cast("double") /
            element_at(col("s"), 1)) *
            (element_at(col("s"), col("j").cast("int") + 2).cast("double") /
              element_at(col("s"), 1))) / lit(1048576.0), 6) +
          lit(0.0)).as("cov"))
  }

  /**
   * Top-k principal components by power iteration with deflation over
   * the COLLECTED covariance matrix — dim² doubles on the driver, the
   * same bounded-matrix budget as the centroid/codebook pulls; the
   * corpus-sized work is [[covarianceLong]]'s single pass. Deterministic:
   * fixed all-ones init, fixed iteration count. Returns (eigenvalue,
   * eigenvector) pairs, largest first.
   */
  def principalComponents(
      df: DataFrame,
      vecCol: String,
      k: Int,
      iters: Int = 50): Seq[(Double, Seq[Double])] = {
    val rows = covarianceLong(df, vecCol).collect()
      .map(r => (r.getLong(0).toInt, r.getLong(1).toInt, r.getDouble(2)))
    val dim = rows.map(_._2).max + 1
    val cov = Array.ofDim[Double](dim, dim)
    rows.foreach { case (i, j, c) => cov(i)(j) = c; cov(j)(i) = c }
    val comps = scala.collection.mutable.ArrayBuffer.empty[(Double, Seq[Double])]
    val c = cov.map(_.clone())
    for (_ <- 0 until k) {
      var v = Array.fill(dim)(1.0 / math.sqrt(dim.toDouble))
      var lambda = 0.0
      for (_ <- 0 until iters) {
        val w = Array.tabulate(dim)(i =>
          (0 until dim).foldLeft(0.0)((a, j) => a + c(i)(j) * v(j)))
        val n = math.sqrt(w.foldLeft(0.0)((a, x) => a + x * x))
        if (n > 0) { v = w.map(_ / n); lambda = n }
      }
      comps += ((lambda, v.toSeq))
      // deflate: C -= λ v vᵀ
      for (i <- 0 until dim; j <- 0 until dim) c(i)(j) -= lambda * v(i) * v(j)
    }
    comps.toSeq
  }

  /** Project embeddings onto principal components (the application half
    * of [[principalComponents]] — dimensionality reduction / whitening
    * before semantic dedup or low-dimensional ANN): one codegen'd dot
    * per component per row, components broadcast as literals, no
    * shuffle. Returns (id, proj: array<double> of k coordinates). */
  def projectComponents(
      df: DataFrame,
      vecCol: String,
      idCol: String,
      components: Seq[Seq[Double]]): DataFrame =
    df.select(col(idCol).as("id"),
      array(components.map(c => dot(col(vecCol), typedLit(c))): _*).as("proj"))

  /** Exact all-pairs cosine ≥ threshold (quadratic baseline). */
  def exactCosinePairs(
      df: DataFrame,
      vecCol: String,
      idCol: String,
      threshold: Double): DataFrame = {
    val vecs = df.select(col(idCol).as("id"), col(vecCol).as("v"))
    vecs.as("a").join(vecs.as("b"), col("a.id") < col("b.id"))
      .withColumn("sim", cosine(col("a.v"), col("b.v")))
      .filter(col("sim") >= threshold)
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        round(col("sim"), 6).as("sim"))
  }

  /** Symmetric int8 quantization of a double-array column against one
    * global scale: level = clamp(floor(x·127/maxAbs), −127, 127). A
    * SINGLE scale (not per-dimension) keeps the integer dot product
    * proportional to the float one — per-dimension scales would reweight
    * dimensions and distort the ranking; an affine (min/max) mapping is
    * worse, adding per-document bias terms that never cancel. `floor`
    * (not round) avoids rounding-mode divergence between engines. */
  private def quantize(v: Column, maxAbs: Double): Column =
    transform(v, x =>
      if (maxAbs == 0) lit(0L)
      else least(greatest(
        floor(x * lit(127.0) / lit(maxAbs)).cast("long"), lit(-127L)), lit(127L)))

  /**
   * ANN top-k over int8 scalar-quantized vectors (the memory-compression
   * path: 4 bytes/dim → 1 byte/dim, the standard first rung of vector
   * index compression below product quantization). Vectors are normalized
   * then symmetrically quantized, so the INTEGER dot product of levels
   * tracks cosine up to rounding — and integer arithmetic makes the
   * ranking deterministic and bit-reproducible in any engine, unlike
   * float scores. At 100 TB the quantized corpus is a quarter the bytes
   * of the float one and the scan stays embarrassingly parallel (one
   * stats pass + one scoring pass + TakeOrdered).
   */
  def sq8TopK(
      df: DataFrame,
      vecCol: String,
      idCol: String,
      queryVec: Seq[Float],
      k: Int,
      materializeMaxRows: Long = 2000000L): DataFrame = {
    // quantize NORMALIZED vectors: the integer dot product then tracks
    // cosine, not raw magnitude (vectors must be non-zero). Materialized
    // once — the stats pass and the scoring pass both read it, and without
    // the cut projection collapse would inline the norm's dot product into
    // the per-element lambda (O(dim²) per vector). At 100 TB you'd persist
    // the quantized corpus anyway — compression is the point of SQ8.
    // Size-gated: localCheckpoint below the cap; `persist` above it — the
    // InMemoryRelation is the same projection barrier but KEEPS lineage,
    // so an executor loss recomputes its blocks (and spills to disk past
    // memory) instead of failing on a truncated RDD.
    val vn = divByNormOnce(col(vecCol).cast("array<double>"), norm(col(vecCol)))
    val unitBase = df.select(col(idCol).as("id"), vn.as("v"))
    val unit = graft.Materialize.pinBySize(unitBase, df, materializeMaxRows)
    // one scalar stat: the corpus-wide max |component| (max is exact, so
    // partial-agg order cannot change it — safe bounded driver pull)
    val maxAbs = unit.agg(
        max(aggregate(col("v"), lit(0.0), (acc, x) => greatest(acc, abs(x)))))
      .head().getDouble(0)
    // query normalized+quantized on the driver with the same sequential
    // IEEE fold order as the column expressions
    val qn = {
      val nrm = math.sqrt(queryVec.foldLeft(0.0)((acc, x) =>
        acc + x.toDouble * x.toDouble))
      queryVec.toSeq.map(_.toDouble / nrm)
    }
    val qq: Seq[Long] = qn.map { x =>
      if (maxAbs == 0) 0L
      else math.min(127L, math.max(-127L, math.floor(x * 127.0 / maxAbs).toLong))
    }
    unit.select(col("id"),
        aggregate(
          zip_with(quantize(col("v"), maxAbs), typedLit(qq), (a, b) => a * b),
          lit(0L), (acc, x) => acc + x).as("score"))
      .orderBy(col("score").desc, col("id"))
      .limit(k)
  }

  // --------------------------------------------- binary quantization (BQ)

  /** Sign bits of `vec`'s first `dim` components packed into
    * ceil(dim/64) longs (bit i of word w = component w·64+i ≥ 0) — a
    * 32× compression of a float corpus. Static bit-OR chain: stays in
    * whole-stage codegen, no higher-order functions in the hot path. */
  def bqWords(vec: Column, dim: Int): Seq[Column] =
    (0 until (dim + 63) / 64).map { w =>
      val hi = math.min(63, dim - w * 64 - 1)
      (0 to hi).map { i =>
        when(element_at(vec, w * 64 + i + 1) >= 0, lit(1L << i)).otherwise(lit(0L))
      }.reduce(_ bitwiseOR _)
    }

  /**
   * ANN top-k by BINARY QUANTIZATION — the 1-bit rung below [[pqTopK]] /
   * [[sq8TopK]] on the compression ladder: each vector is its sign
   * bitmask (dim bits), distance is the Hamming distance of the masks
   * (XOR + popcount — integer-exact, bit-reproducible). Ties break to the
   * lowest id. With `rerank > k`, BQ shortlists `rerank` candidates from
   * the bit scan and only those get exact cosine — the standard two-stage
   * retrieval. At 100 TB the corpus scan touches dim/8 bytes per vector
   * inside one codegen'd loop; nothing shuffles (TakeOrdered collects
   * per-partition top-k only).
   */
  def bqTopK(
      df: DataFrame,
      vecCol: String,
      idCol: String,
      queryVec: Seq[Float],
      k: Int,
      rerank: Int = 0): DataFrame = {
    val dim = queryVec.length
    val qWords: Seq[Long] = (0 until (dim + 63) / 64).map { w =>
      val hi = math.min(63, dim - w * 64 - 1)
      (0 to hi).foldLeft(0L) { (acc, i) =>
        if (queryVec(w * 64 + i) >= 0) acc | (1L << i) else acc
      }
    }
    val ham = bqWords(col(vecCol), dim).zip(qWords).map { case (wrd, q) =>
      bit_count(wrd.bitwiseXOR(lit(q)))
    }.reduce(_ + _).cast("long")
    val byHamming = df.select(col(idCol).as("id"), ham.as("hamming"))
      .orderBy(col("hamming"), col("id"))
    if (rerank <= k) byHamming.limit(k)
    else {
      val shortlist = byHamming.limit(rerank).collect().map(_.getLong(0))
      val q = typedLit(queryVec)
      df.filter(col(idCol).isin(shortlist.map(Long.box): _*))
        .select(col(idCol).as("id"),
          round(cosine(col(vecCol), q), 6).as("sim"))
        .orderBy(col("sim").desc, col("id"))
        .limit(k)
    }
  }

  /**
   * IVF-PQ (IVFADC — Jégou et al. 2011 §IV): the coarse inverted file of
   * [[ivfTopK]] composed with RESIDUAL product quantization. Every vector
   * is assigned to its nearest coarse centroid, and what gets PQ-encoded
   * is the residual r = v̂ − ĉ(cell) — residuals concentrate near the
   * origin, which is why IVFADC quantizes them instead of the raw vectors.
   * Scoring uses the linearity of the dot product:
   * dot(q̂, v̂) = dot(q̂, ĉ) + dot(q̂, r) ≈ qdotc[cell] + Σⱼ T[j][code_j]
   * — one table lookup per subspace plus one per-cell constant, all inside
   * codegen.
   *
   * Determinism: coarse centroids are the nCells lowest-id vectors,
   * codebook seeds the NEXT kCodes lowest-id vectors' residuals (the
   * centroids' own residuals are zero — using them would degenerate the
   * codebooks); encode/probe argmins break ties to the lowest index; every
   * fold is left-to-right IEEE, so the oracle replays the whole index.
   *
   * At 100 TB: cell is a partition column (probe = partition prune, as
   * [[ivfIndexWrite]] materializes), codes are ~20× smaller than floats,
   * and a query scans nProbe/nCells of the codes with m lookups per row.
   */
  def ivfPqTopK(
      df: DataFrame,
      vecCol: String,
      idCol: String,
      queryVec: Seq[Float],
      k: Int,
      nCells: Int = 8,
      nProbe: Int = 2,
      m: Int = 4,
      kCodes: Int = 8,
      materializeMaxRows: Long = 2000000L): DataFrame = {
    def unitD(a: Seq[Double]): Seq[Double] = {
      val n = math.sqrt(a.foldLeft(0.0)((s, x) => s + x * x))
      a.map(_ / n)
    }
    val head = df.select(col(idCol).as("id"), col(vecCol).as("v"))
      .orderBy(col("id")).limit(nCells + kCodes).collect()
      .map(_.getAs[scala.collection.Seq[Float]]("v").toSeq.map(_.toDouble))
    val cents = head.take(nCells)
    val centUnits = cents.map(unitD)
    val dim = cents.head.length
    val sub = dim / m
    def cellOfD(v: Seq[Double]): Int =
      cents.zipWithIndex.foldLeft((-1, Double.MinValue)) {
        case ((bi, bs), (c, i)) =>
          val s = cosSimD(v, c)
          if (s > bs) (i, s) else (bi, bs)
      }._1
    // codebooks: residuals of the next kCodes lowest-id vectors, sliced
    val cbs: Array[Array[Array[Double]]] = {
      val res = head.drop(nCells).map { s =>
        val vn = unitD(s)
        val cu = centUnits(cellOfD(s))
        vn.zip(cu).map { case (a, b) => a - b }.toArray
      }
      Array.tabulate(m)(j => res.map(_.slice(j * sub, (j + 1) * sub)))
    }
    val qn = unitD(queryVec.map(_.toDouble))
    val qdotc: Seq[Double] = centUnits.map(c =>
      qn.zip(c).foldLeft(0.0)((a, p) => a + p._1 * p._2))
    val tables: Array[Seq[Double]] = Array.tabulate(m) { j =>
      val qs = qn.slice(j * sub, (j + 1) * sub)
      cbs(j).map(c => qs.zip(c).foldLeft(0.0)((a, p) => a + p._1 * p._2)).toSeq
    }
    // probe the nProbe cells nearest the query (raw-vector cosine, lowest
    // index on ties — same rule as ivfTopK)
    val qCells = cents.zipWithIndex
      .map { case (c, i) => i -> cosSimD(queryVec.map(_.toDouble), c) }
      .sortBy { case (i, s) => (-s, i) }.take(nProbe).map(_._1)

    val vn = divByNormOnce(col(vecCol).cast("array<double>"), norm(col(vecCol)))
    val baseAll = df
      .select(col(idCol).as("id"), vn.as("vn"),
        cellOf(cents.map(_.toSeq))(col(vecCol)).as("cell"))
      .withColumn("r", zip_with(col("vn"),
        element_at(typedLit(centUnits.map(_.toSeq).toSeq), col("cell") + 1),
        (a, b) => a - b))
    // same size-gated materialization barrier as pqTopK (projection
    // collapse would inline the norm into every residual element)
    val base = graft.Materialize.pinBySize(baseAll, df, materializeMaxRows)
    def codeOf(j: Int): Column =
      cbs(j).zipWithIndex.foldLeft((lit(-1), lit(Double.MaxValue))) {
        case ((bestI, bestD), (c, i)) =>
          val cc = c.foldLeft(0.0)((a, x) => a + x * x)
          val d = lit(cc) - lit(2.0) *
            dot(slice(col("r"), j * sub + 1, sub), typedLit(c.toSeq))
          (when(d < bestD, lit(i)).otherwise(bestI), least(d, bestD))
      }._1
    val adcScore = element_at(typedLit(qdotc), col("cell") + 1) +
      (0 until m).map(j => element_at(typedLit(tables(j)), codeOf(j) + 1)).reduce(_ + _)
    base
      .filter(col("cell").isin(qCells: _*))
      .select(col("id"), round(adcScore, 6).as("score"))
      .orderBy(col("score").desc, col("id"))
      .limit(k)
  }

  /**
   * Maximal Marginal Relevance (Carbonell & Goldstein, SIGIR 1998): pick k
   * results that balance relevance to the query against redundancy with
   * what's already picked — score(i) = λ·rel(i) − (1−λ)·maxⱼ sim(i, sⱼ).
   *
   * Greedy MMR is inherently sequential, so the scale shape is the one
   * implemented: the CLUSTER does one top-`shortlist` relevance pass
   * (codegen scan + TakeOrdered — the same shape as [[bruteForceTopK]]);
   * the greedy loop then runs on the driver over that bounded shortlist
   * (shortlist × dim doubles — the same class of bounded pull as a
   * centroid matrix). Selection ties break to the lowest id; every dot
   * product is the sequential fold the oracle's `list_dot_product`
   * mirrors, so the whole selection is engine-reproducible.
   */
  def mmrSelect(
      df: DataFrame,
      vecCol: String,
      idCol: String,
      queryVec: Seq[Float],
      k: Int,
      shortlist: Int = 50,
      lambda: Double = 0.7): DataFrame = {
    val spark = df.sparkSession
    val qn = {
      val q = queryVec.map(_.toDouble)
      val n = math.sqrt(q.foldLeft(0.0)((a, x) => a + x * x))
      q.map(_ / n)
    }
    val vn = divByNormOnce(col(vecCol).cast("array<double>"), norm(col(vecCol)))
    val cand = df
      .select(col(idCol).as("id"), vn.as("vn"),
        dot(vn, typedLit(qn)).as("rel"))
      .orderBy(col("rel").desc, col("id"))
      .limit(shortlist)
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray, r.getDouble(2)))
    def dotD(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }
      s
    }
    val selected = scala.collection.mutable.ArrayBuffer.empty[(Int, Long, Double)]
    val chosen = scala.collection.mutable.ArrayBuffer.empty[Array[Double]]
    val remaining = scala.collection.mutable.ArrayBuffer(cand: _*)
    for (rank <- 1 to math.min(k, cand.length)) {
      val scored = remaining.map { case (id, v, rel) =>
        val score =
          if (chosen.isEmpty) rel
          else lambda * rel -
            (1.0 - lambda) * chosen.map(c => dotD(v, c)).max
        (id, v, score)
      }
      val best = scored.minBy { case (id, _, s) => (-s, id) }
      selected += ((rank, best._1, best._3))
      chosen += best._2
      remaining --= remaining.filter(_._1 == best._1)
    }
    import spark.implicits._
    selected.toSeq.map { case (r, id, s) =>
      // + 0.0 folds −0.0 (cross-engine repr parity)
      (r, id, BigDecimal(s).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble + 0.0)
    }.toDF("sel_rank", "id", "mmr")
  }

  /**
   * ANN quality evaluation: recall@k of the LSH index against exact
   * brute-force ground truth — the metric every vector-store deployment
   * tracks before trusting an approximate index. Both rankings use the
   * same deterministic order (round-6 cosine desc, id asc), so the whole
   * evaluation — ground truth, index answer, and the recall fractions —
   * is oracle-replayable.
   *
   * Scale shape: ground truth is one TakeOrderedAndProject (per-partition
   * top-k, k rows to the driver-side merge — never a global sort of the
   * corpus); the index answer scans only the query's LSH bucket. The
   * rank-window and the k-grid join run on ≤ max(ks) rows. Evaluating on
   * a sampled query set at 100 TB is this same plan per query, fanned out.
   */
  /**
   * Rank-aware ANN evaluation — the MRR companion of [[annRecallAtK]]
   * (recall says IF the truth was retrieved; this says WHERE it landed):
   * each brute-force ground-truth top-`k` item carries its rank in the
   * approximate answer (`rk_l`, null if the index missed it) and an EXACT
   * reciprocal-rank numerator `rr2520` = 2520/rk_l (2520 = lcm(1..10),
   * so every reciprocal is an integer for k ≤ 10 — MRR =
   * avg(rr2520)/2520 with zero float accumulation). Same bounded shapes
   * as recall: ground truth is a k-row TakeOrdered, the index answer
   * scans one bucket, the join touches ≤ k rows.
   */
  def annRankEval(
      df: DataFrame,
      vecCol: String,
      idCol: String,
      queryVec: Seq[Float],
      k: Int,
      numPlanes: Int = 6): DataFrame = {
    require(k <= 10, s"rr2520 is exact only for ranks <= 10, got k=$k")
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("sim").desc, col("id")) // ≤ k rows: bounded window
    val brute = bruteForceTopK(df, vecCol, idCol, queryVec, k)
      .withColumn("rk_b", row_number().over(w))
    val approx = dataPlaneLshTopK(df, vecCol, idCol, queryVec, k, numPlanes)
      .withColumn("rk_l", row_number().over(w))
    brute.join(approx.select(col("id"), col("rk_l")), Seq("id"), "left")
      .select(col("id"), col("rk_b").cast("long"), col("rk_l").cast("long"),
        coalesce(expr("CAST(2520 div rk_l AS BIGINT)"), lit(0L)).as("rr2520"))
  }

  def annRecallAtK(
      df: DataFrame,
      vecCol: String,
      idCol: String,
      queryVec: Seq[Float],
      ks: Seq[Int],
      numPlanes: Int = 6,
      multiProbe: Boolean = false): DataFrame = {
    val spark = df.sparkSession
    val kmax = ks.max
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("sim").desc, col("id")) // ≤ kmax rows: bounded window
    val brute = bruteForceTopK(df, vecCol, idCol, queryVec, kmax)
      .withColumn("rk_b", row_number().over(w))
    val answer =
      if (multiProbe)
        dataPlaneLshTopKMultiProbe(df, vecCol, idCol, queryVec, kmax, numPlanes)
      else dataPlaneLshTopK(df, vecCol, idCol, queryVec, kmax, numPlanes)
    val approx = answer.withColumn("rk_l", row_number().over(w))
    import spark.implicits._
    val grid = ks.toDF("k")
    brute.join(approx.select(col("id"), col("rk_l")), Seq("id"))
      .crossJoin(grid)
      .filter(col("rk_b") <= col("k") && col("rk_l") <= col("k"))
      .groupBy(col("k"))
      .agg(count(lit(1)).as("n_hits"))
      .select(col("k"), col("n_hits"),
        round(col("n_hits").cast("double") / col("k"), 6).as("recall"))
  }

  /**
   * Integer-exact Lloyd k-means assignment — the oracle-verifiable twin of
   * [[kmeansCentroids]] (whose float `avg` update is aggregation-order
   * nondeterministic and therefore only spec-checkable). Every quantity
   * lives on the 2^-20 grid as BIGINT:
   *
   *  - init: the `k` lowest-id vectors, quantized (`floor(x * 2^20)`) —
   *    no randomness;
   *  - assignment: squared-L2 in grid units, all-integer; ties resolve to
   *    the lowest cluster index via `array_min` over `(dist, cl)` structs
   *    (lexicographic struct order = argmin with deterministic tie-break);
   *  - update: per-(cluster, dim) BIGINT sum → `floor(sum / n)` back onto
   *    the grid. The sum is order-independent (integer addition commutes),
   *    so the whole trajectory is bit-reproducible under ANY partitioning —
   *    and replayable in DuckDB SQL.
   *
   * Scale shape: each round is one codegen'd assignment scan plus one
   * posexplode aggregation whose map-side partials reduce to
   * `k × dim × partitions` rows; only the `k × dim` centroid matrix ever
   * reaches the driver. Empty clusters drop out of the update (both
   * engines agree: no rows, no centroid) — the standard Lloyd degeneracy,
   * handled identically on replay.
   */
  def kmeansAssignQ(
      df: DataFrame,
      vecCol: String,
      idCol: String,
      k: Int = 8,
      iters: Int = 2): DataFrame = {
    val pts = df.select(col(idCol).cast("long").as("id"),
      transform(col(vecCol),
        x => floor(x.cast("double") * lit(1048576d)).cast("long")).as("qv"))

    // init: k lowest ids — a driver pull of k vectors, bounded like every
    // other centroid matrix in this file
    var cents: Seq[(Int, Array[Long])] = pts.orderBy(col("id")).limit(k)
      .collect().zipWithIndex
      .map { case (r, i) => i -> r.getSeq[Long](1).toArray }.toSeq

    def assign(): DataFrame = {
      // native codegen'd kernel — all-integer, so bit-identical to the
      // aggregate(zip_with(...)) fold under any evaluation order
      val scored = cents.map { case (cl, c) =>
        struct(
          graft.functions.GraftFunctions.vec_l2sq_long(
            col("qv"), typedLit(c.toSeq)).as("d"),
          lit(cl).as("cl"))
      }
      pts.withColumn("best", array_min(array(scored: _*)))
        .select(col("id"), col("qv"),
          col("best.cl").as("cluster"), col("best.d").as("dist"))
    }

    for (_ <- 0 until iters) {
      val upd = assign()
        .select(col("cluster"), posexplode(col("qv")).as(Seq("pos", "q")))
        .groupBy(col("cluster"), col("pos"))
        .agg(sum(col("q")).as("s"), count(lit(1)).as("n"))
        .collect()
      cents = upd.groupBy(_.getInt(0)).toSeq.sortBy(_._1).map { case (cl, rows) =>
        cl -> rows.sortBy(_.getInt(1))
          .map(r => math.floor(r.getLong(2).toDouble / r.getLong(3)).toLong)
          .toArray
      }
    }
    assign().select(col("id").as("vec_id"), col("cluster"), col("dist"))
  }
}
