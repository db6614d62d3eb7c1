package graft.operators

import graft.functions.GraftFunctions.simhash64
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Deduplication family for training-data pipelines, each designed as a
 * shuffle-minimal declarative plan:
 *
 *  - exact: one hash-aggregate on the content key;
 *  - n-gram Jaccard: exact pairwise similarity, candidate-limited;
 *  - MinHash + LSH banding: near-dup pairs at scale — shingle → signature
 *    (all inside codegen via higher-order functions), band → bucket
 *    self-join (the only shuffles are the bucket groupBy and the verify
 *    join, both on bounded candidate sets — never all-pairs);
 *  - SimHash: 64-bit fingerprints, hamming ≤ k retrieval via 16-bit chunk
 *    banding (pigeonhole: hamming ≤ 3 ⇒ at least one of 4 chunks equal).
 *
 * At 100 TB: all-pairs comparison is never materialized; LSH bucket sizes
 * bound the quadratic term, and the band explode is a constant ×bands row
 * multiplier before a hash shuffle — the canonical scale-out shape.
 */
object Dedup {

  /** Exact dedup: keep the smallest id per distinct content. */
  def exact(df: DataFrame, contentCol: String, idCol: String): DataFrame =
    df.groupBy(col(contentCol))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))

  /** Case/whitespace-normalized content key: lowercase, runs of whitespace
    * collapsed to one space, trimmed — the cheap canonicalization that
    * catches trivially-reformatted duplicates exact hashing misses, while
    * staying a pure projection (dedup on it is still ONE hash-aggregate). */
  def normalizedContent(content: Column): Column =
    trim(regexp_replace(lower(content), "\\s+", " "))

  /** [[exact]] over the normalized content key. */
  def exactNormalized(df: DataFrame, contentCol: String, idCol: String): DataFrame =
    df.select(normalizedContent(col(contentCol)).as("norm_content"),
        col(idCol).as("__id"))
      .groupBy(col("norm_content"))
      .agg(min(col("__id")).as("keep_id"), count(lit(1)).as("n_copies"))

  /** Word k-shingles of a document, distinct and SORTED — sorted once per
    * row so pairwise similarity can use the allocation-free merge-walk
    * kernel ([[graft.functions.Sketches.sortedJaccard]]) instead of per-pair
    * hash sets. One native codegen'd pass
    * ([[graft.functions.Sketches.wordShingles]]): the declarative
    * sort_array(array_distinct(transform(...))) form it replaces ran five
    * interpreted higher-order functions per row and dominated every n-gram
    * operator's runtime. */
  def shingles(text: Column, k: Int): Column =
    graft.functions.GraftFunctions.word_shingles(text, k)

  /** Exact Jaccard similarity of two string-array columns (general form;
    * does not require sorted inputs). */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b)).cast("double")
    val union = (size(a) + size(b)).cast("double") - inter
    when(union === 0, lit(0.0)).otherwise(inter / union)
  }

  /** Merge-walk Jaccard for sorted+distinct arrays (what [[shingles]]
    * produces) — the pairwise hot path. */
  def jaccardSorted(a: Column, b: Column): Column =
    graft.functions.GraftFunctions.sorted_jaccard(a, b)

  /** MinHash signature: for each of `numHashes` seeds, the min of
    * xxhash64(seed-tagged shingle) — pure higher-order functions, codegen'd. */
  def minhashSignature(shingleCol: Column, numHashes: Int): Column =
    transform(sequence(lit(0), lit(numHashes - 1)),
      s => array_min(transform(shingleCol, x => xxhash64(x, s))))

  /**
   * Near-duplicate pairs via MinHash + LSH banding, verified by exact
   * Jaccard on the shingle sets. Returns (id_a, id_b, sim), id_a < id_b.
   */
  def minhashLshPairs(
      df: DataFrame,
      textCol: String,
      idCol: String,
      shingleK: Int = 3,
      numHashes: Int = 64,
      bands: Int = 16,
      threshold: Double = 0.6,
      materializeMaxRows: Long = 2000000L): DataFrame = {
    val rows = numHashes / bands
    val base = df.select(col(idCol).as("id"), shingles(col(textCol), shingleK).as("sh"))
      .withColumn("sig", minhashSignature(col("sh"), numHashes))
    // Size-gated materialization (same dual-path rationale as
    // [[connectedComponents]]'s driver cap): below the cap the (id, sh,
    // sig) frame is localCheckpoint'ed — one compute, re-read by banding
    // and both verify sides. Above it nothing corpus-sized is pinned to
    // executor disk: banding reads only (id, sig), and shingles are
    // RECOMPUTED behind a broadcast semi-join of the candidate ids, so
    // the full shingle set neither shuffles nor persists (candidate sets
    // are the near-dup graph — a tiny fraction of the corpus).
    val small = graft.Materialize.atMostRows(df, materializeMaxRows)
    val docs = if (small) graft.Materialize.localCheckpoint(base) else base
    // band hash: xxhash64 over the band's signature slice (+ band index so
    // buckets from different bands never collide). Bands carry ONLY
    // (id, band_idx, band_hash): shuffling the shingle arrays through the
    // ×bands explode multiplies the dominant byte volume by the band count
    // (see md5MinhashLshPairs for the measurement).
    val banded = docs.select(col("id"), col("sig")).withColumn("band",
        explode(transform(sequence(lit(0), lit(bands - 1)),
          b => struct(b.as("band_idx"),
            xxhash64(slice(col("sig"), b * rows + 1, lit(rows)), b).as("band_hash")))))
      .select(col("id"), col("band.band_idx"), col("band.band_hash"))
    val candidates = banded.as("a").join(banded.as("b"),
        col("a.band_idx") === col("b.band_idx") &&
          col("a.band_hash") === col("b.band_hash") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .dropDuplicates("id_a", "id_b")
    val shSource =
      if (small) docs
      else base.join(broadcast(
          candidates.select(col("id_a").as("id"))
            .union(candidates.select(col("id_b").as("id"))).distinct()),
        Seq("id"), "left_semi")
    candidates
      .join(shSource.select(col("id").as("id_a"), col("sh").as("sh_a")), "id_a")
      .join(shSource.select(col("id").as("id_b"), col("sh").as("sh_b")), "id_b")
      .withColumn("sim", jaccardSorted(col("sh_a"), col("sh_b")))
      .filter(col("sim") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("sim"), 6).as("sim"))
  }

  /** 60-bit cross-engine-deterministic content hash: the first 15 hex chars
    * of md5 interpreted as an integer. Any engine with md5 computes the same
    * value (the DuckDB oracle mirrors it nibble-by-nibble), unlike
    * xxhash64/murmur whose implementations are engine-private. Native
    * codegen'd kernel ([[graft.functions.Md5Hash60]]) — equivalent to
    * `conv(substr(md5(x), 1, 15), 16, 10)` without the hex round-trip. */
  def md5Hash60(c: Column): Column =
    graft.functions.GraftFunctions.md5_hash60(c.cast("binary"))

  /** XOR-scramble seeds for the md5 minhash family: golden-ratio multiples
    * masked to 60 bits. XOR by a constant is a bijection on the hash space,
    * so `min(h XOR r_i)` is an independent minwise sample per seed at one
    * md5 per shingle (vs one keyed hash per shingle per seed). */
  private[graft] def xorSeeds(n: Int): Seq[Long] =
    (0 until n).map(i => (i * 0x9E3779B97F4A7C15L) & ((1L << 60) - 1))

  /**
   * [[minhashLshPairs]] with the oracle-mirrorable md5 hash family and
   * band-value (not band-hash) bucketing, so every intermediate — signature,
   * band bucket, candidate set, final pairs — is reproducible in any engine
   * with md5. Same plan shape and shuffle structure as the xxhash64 variant;
   * the only differences are the hash kernel and joining on the band's
   * `array<long>` slice directly instead of hashing it first.
   */
  def md5MinhashLshPairs(
      df: DataFrame,
      textCol: String,
      idCol: String,
      shingleK: Int = 3,
      numHashes: Int = 64,
      bands: Int = 16,
      threshold: Double = 0.6,
      materializeMaxRows: Long = 2000000L): DataFrame = {
    val rows = numHashes / bands
    val seeds = xorSeeds(numHashes)
    // Two pathologies if the (id, sh, sig) frame is computed naively:
    // the self-join computes the shingle+minhash pipeline on BOTH sides,
    // and — the dominant cost — a band explode that carries the full
    // shingle array puts ×bands copies of every document's shingles
    // through the bucket shuffle. Bands therefore carry only (id, band
    // slice), and shingles re-enter AFTER the candidate set has collapsed
    // to near-dup pairs. Size-gated (connectedComponents-style dual
    // path): below `materializeMaxRows` the frame is localCheckpoint'ed
    // (one compute, three readers); above it nothing corpus-sized is
    // pinned to executor local disk — shingles are recomputed behind a
    // broadcast semi-join of the candidate ids instead.
    val base = df.select(col(idCol).as("id"), shingles(col(textCol), shingleK).as("sh"))
      // hash each shingle once, then every lane in one pass — as 32
      // array_min(transform(...)) columns, project-collapse re-evaluates
      // the md5 child per lane (32× the hash work)
      .withColumn("sig", graft.functions.GraftFunctions.xor_minhash(
        transform(col("sh"), x => md5Hash60(x)), seeds))
    val small = graft.Materialize.atMostRows(df, materializeMaxRows)
    val docs = if (small) graft.Materialize.localCheckpoint(base) else base
    val banded = docs.select(col("id"), col("sig")).withColumn("band",
        explode(transform(sequence(lit(0), lit(bands - 1)),
          b => struct(b.as("band_idx"),
            slice(col("sig"), b * rows + 1, lit(rows)).as("band_val")))))
      .select(col("id"), col("band.band_idx"), col("band.band_val"))
    val candidates = banded.as("a").join(banded.as("b"),
        col("a.band_idx") === col("b.band_idx") &&
          col("a.band_val") === col("b.band_val") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .dropDuplicates("id_a", "id_b")
    val shSource =
      if (small) docs
      else base.join(broadcast(
          candidates.select(col("id_a").as("id"))
            .union(candidates.select(col("id_b").as("id"))).distinct()),
        Seq("id"), "left_semi")
    candidates
      .join(shSource.select(col("id").as("id_a"), col("sh").as("sh_a")), "id_a")
      .join(shSource.select(col("id").as("id_b"), col("sh").as("sh_b")), "id_b")
      .withColumn("sim", jaccardSorted(col("sh_a"), col("sh_b")))
      .filter(col("sim") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("sim"), 6).as("sim"))
  }

  /** 60-bit SimHash over [[md5Hash60]] token hashes: bit j of the result is
    * set iff more tokens have bit j set than clear. Cross-engine mirrorable
    * (the oracle replays it from md5 hex), served by the native codegen'd
    * kernel [[graft.functions.Md5Simhash60]] — a higher-order-function
    * formulation of the same math benched 8× slower from per-token array
    * allocation. [[graft.functions.SimHash64]]'s murmur3 kernel stays the
    * engine-private variant. */
  def md5Simhash(tokens: Column): Column =
    graft.functions.GraftFunctions.md5_simhash60(tokens)

  /** [[simhashPairs]] with the md5 hash family: 60-bit fingerprints, 15-bit
    * chunk banding (4 chunks — exact retrieval for hamming ≤ 3, candidate
    * banding above that), hamming filter. Fully oracle-mirrorable. */
  def md5SimhashPairs(
      df: DataFrame,
      textCol: String,
      idCol: String,
      maxDistance: Int = 3,
      materializeMaxRows: Long = 2000000L): DataFrame = {
    // Materialize fingerprints ONCE (16 bytes/doc — trivially small even at
    // 100 TB). Without this the self-join computes the tokenize+md5-per-token
    // pipeline on BOTH sides, and constraint-inferred filters re-derive it
    // again below the banding projections (same pathology as the
    // exactJaccardPairs NOTE) — measured 7× the single-pass cost at sf0.1.
    // Size-gated: localCheckpoint below the cap; above it `persist` — the
    // blocks are equally tiny, but lineage is KEPT, so losing an executor
    // recomputes its fingerprints instead of failing the job (a
    // checkpoint-truncated RDD cannot be rebuilt).
    val baseFps = df.select(col(idCol).as("id"),
      md5Simhash(TextAnalysis.tokens(col(textCol))).as("simhash"))
    val fps = graft.Materialize.pinBySize(baseFps, df, materializeMaxRows)
    // One join key: band index folded into the high bits of the 15-bit
    // chunk value. Hamming is computed and filtered BEFORE the distinct so
    // the aggregate sees only true near-dup rows (candidates collapse ~10×
    // here) and carries no fingerprint columns.
    val chunks = (0 until 4).map(c =>
      shiftright(col("simhash"), c * 15).bitwiseAND(lit(0x7fffL)) + lit(c.toLong << 15))
    val chunked = fps.select(col("id"), col("simhash"),
      explode(array(chunks: _*)).as("band"))
    chunked.as("a").join(chunked.as("b"),
        col("a.band") === col("b.band") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        bit_count(col("a.simhash").bitwiseXOR(col("b.simhash"))).as("hamming"))
      .filter(col("hamming") <= maxDistance)
      .dropDuplicates("id_a", "id_b")
  }

  /** Exact n-gram Jaccard pairs (quadratic — candidate set must be small;
    * the scalable path is [[minhashLshPairs]]). */
  def exactJaccardPairs(
      df: DataFrame,
      textCol: String,
      idCol: String,
      shingleK: Int = 3,
      threshold: Double = 0.6): DataFrame = {
    val docs = df.select(col(idCol).as("id"), shingles(col(textCol), shingleK).as("sh"))
    // NOTE: a size-ratio prefilter in the join condition (jaccard >= t ⇒
    // t·max(|a|,|b|) ≤ min(|a|,|b|)) benched 4× SLOWER here: the inferred
    // IsNotNull constraints get pushed below the projection and re-derive
    // the whole shingle pipeline inside the scan filters. The scalable
    // candidate prune is [[minhashLshPairs]]; this quadratic path stays the
    // simplest-possible verification baseline.
    docs.as("a").join(docs.as("b"), col("a.id") < col("b.id"))
      .withColumn("sim", jaccardSorted(col("a.sh"), col("b.sh")))
      .filter(col("sim") >= threshold)
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        round(col("sim"), 6).as("sim"))
  }

  /**
   * Sorted-neighborhood method (Hernández & Stolfo, SIGMOD'95): sort the
   * corpus by a blocking key — here a whitespace-normalized lowercase
   * prefix — and compare each record only with its `window` successors in
   * that order, confirming candidates with exact word-shingle Jaccard.
   * The classic entity-resolution complement to LSH banding: candidates
   * come from ORDER LOCALITY (near-identical prefixes sort adjacent)
   * rather than hash collisions, so it catches prefix-stable edits that
   * fall outside a band collision and costs exactly `window · n` pairs by
   * construction, independent of the similarity distribution.
   *
   * Scale shape: one distributed total sort (`repartitionByRange` +
   * partition-local sort — no single-task global ordering), positions by
   * partition prefix sums (`zipWithIndex`: one lightweight count job),
   * then ONE equi-join on the neighbor position — each row joins exactly
   * its `window` successors, skew-free regardless of key distribution
   * (dense blocks of an identical prefix still produce only `window`
   * comparisons per row — the property that makes SNM predictable where
   * naive blocking explodes on hot blocks). Positions are a pure function
   * of the (key, id) total order, so the output is partition-layout
   * independent and the oracle replays it with one `row_number` window.
   */
  def sortedNeighborPairs(
      df: DataFrame,
      textCol: String,
      idCol: String,
      window: Int = 5,
      prefixLen: Int = 24,
      shingleK: Int = 1,
      threshold: Double = 0.8): DataFrame = {
    val spark = df.sparkSession
    val bk = substring(
      trim(regexp_replace(lower(col(textCol)), "\\s+", " ")), 1, prefixLen)
    val docs = df.select(col(idCol).cast("long").as("id"), bk.as("bk"),
      shingles(col(textCol), shingleK).as("sh"))
    val n = spark.sessionState.conf.numShufflePartitions
    val sorted = docs
      .repartitionByRange(n, col("bk"), col("id"))
      .sortWithinPartitions(col("bk"), col("id"))
    val outSchema = sorted.schema.add("pos",
      org.apache.spark.sql.types.LongType, nullable = false)
    val ranked = spark.createDataFrame(
      sorted.rdd.zipWithIndex().map { case (r, i) =>
        org.apache.spark.sql.Row.fromSeq(r.toSeq :+ i)
      }, outSchema)
    val lhs = ranked.select(col("id").as("id_l"), col("sh").as("sh_l"),
        col("pos"), explode(sequence(lit(1), lit(window))).as("d"))
      .select(col("id_l"), col("sh_l"), (col("pos") + col("d")).as("pos_b"))
    val rhs = ranked.select(col("id").as("id_r"), col("sh").as("sh_r"),
      col("pos").as("pos_b"))
    lhs.join(rhs, "pos_b")
      .withColumn("sim", jaccardSorted(col("sh_l"), col("sh_r")))
      .filter(col("sim") >= threshold)
      .select(least(col("id_l"), col("id_r")).as("id_a"),
        greatest(col("id_l"), col("id_r")).as("id_b"),
        round(col("sim"), 6).as("sim"))
  }

  /**
   * Connected components over a near-duplicate pair set: the step that
   * turns pairwise edges into dedup GROUPS (every member of a component is
   * a duplicate of the same cluster; keep `cluster_id`, drop the rest).
   *
   * Distributed path: alternating large-star/small-star contraction
   * (Kiveris et al., "Connected Components in MapReduce and Beyond",
   * SoCC'14). Each pass recomputes every node's closed-neighborhood
   * minimum and rewires edges toward it — large-star rewires the
   * higher-id side, small-star the lower — so components collapse into
   * stars rooted at their minimum id in O(log²) passes on ANY graph
   * shape. Unlike plain min-label propagation (rounds = graph diameter),
   * an adversarially long chain costs logarithmic rounds, so there is no
   * diameter-bounded failure mode at 100 TB. One pass is one
   * min-aggregate plus one join, both behind explicit width-sized
   * repartitions.
   *
   * Lineage is truncated each round (`localCheckpoint`) so the plan does
   * not grow with iterations — on a cluster this would be a reliable
   * checkpoint. Convergence is EXACT: a pass that leaves the canonical
   * edge set unchanged (same count, empty `except`) is the fixpoint.
   *
   * Returns (id, cluster_id) for every node that appears in `pairs`;
   * cluster_id is the component's minimum id (the member to keep).
   */
  def connectedComponents(
      pairs: DataFrame,
      aCol: String,
      bCol: String,
      maxIter: Int = 25,
      smallGraphMaxPairs: Long = 4000000L,
      skewSaltFactor: Int = 8): DataFrame = {
    val spark = pairs.sparkSession
    val e0 = graft.Materialize.localCheckpoint(
      pairs.select(col(aCol).cast("long").as("src"), col(bCol).cast("long").as("dst")))
    val nPairs = e0.count()
    // Near-dup pair graphs are a tiny fraction of the corpus even at 100 TB.
    // Below the cap (≤64 MB of edge longs — the same bounded-driver-pull
    // rationale as a broadcast join's small side) union-find on the driver
    // beats any distributed loop: the iterative path pays ~0.3s of job
    // scheduling PER ROUND regardless of data size. Above the cap, the
    // MapReduce label-propagation loop runs with shuffle width sized from
    // the measured edge count.
    if (nPairs <= smallGraphMaxPairs) driverUnionFind(spark, e0)
    else {
      // Shuffle width sized from the measured edge count via EXPLICIT
      // repartition on the loop's frames — never session conf, so a
      // concurrent query on the same session plans with its own width.
      val sessionWidth = spark.conf.get("spark.sql.shuffle.partitions").toInt
      val width = math.max(1L, math.min(2 * nPairs / 2000000L + 1, sessionWidth.toLong)).toInt
      starComponents(e0, width, maxIter, skewSaltFactor)
    }
  }

  /** Alternating large-star/small-star CC over canonical (u > v) edges —
    * see [[connectedComponents]]. Returns (id, cluster_id) for every node
    * of `e0`, including nodes isolated by self-loop removal. */
  private def starComponents(
      e0: DataFrame, width: Int, maxIter: Int, saltFactor: Int = 8): DataFrame = {
    val nodes = graft.Materialize.localCheckpoint(e0.na.drop()
      .select(col("src").as("id")).union(e0.na.drop().select(col("dst").as("id")))
      .distinct())
    def canon(df: DataFrame): DataFrame =
      df.filter(col("u") =!= col("v"))
        .select(greatest(col("u"), col("v")).as("u"), least(col("u"), col("v")).as("v"))
        .distinct()
    def directed(e: DataFrame): DataFrame =
      e.union(e.select(col("v").as("u"), col("u").as("v")))
    // per-node minimum over the CLOSED neighborhood (self included).
    // Skew note: the groupBy itself is safe under a mega-component —
    // Spark's hash aggregate combines min MAP-SIDE, so each task emits at
    // most one row per key into the shuffle (the "salted min then re-min"
    // fanout is built into partial aggregation).
    def mins(n: DataFrame): DataFrame =
      n.repartition(width, col("u")).groupBy("u").agg(min(col("v")).as("mv"))
        .select(col("u"), least(col("u"), col("mv")).as("m"))
    // The residual hot spot is the (edges ⋈ mins) JOIN: once a
    // mega-component collapses toward its root, nearly every directed
    // edge carries the root's u and lands in ONE task. Salting spreads
    // each key over `saltFactor` tasks (mins is one row per node, so the
    // ×salt explode on that side is cheap); exact same rows as the plain
    // join, verified by the power-law property test.
    def joinMins(n: DataFrame, m: DataFrame): DataFrame =
      if (saltFactor <= 1) n.join(m, "u")
      else SkewJoin.saltedInnerJoin(n, m, "u", saltFactor)
    // large-star: each node's HIGHER-id neighbors rewire to its min
    def largeStar(e: DataFrame): DataFrame = {
      val n = directed(e)
      canon(joinMins(n, mins(n)).filter(col("v") > col("u"))
        .select(col("v").as("u"), col("m").as("v")))
    }
    // small-star: each node and its LOWER-id neighbors rewire to its min
    def smallStar(e: DataFrame): DataFrame = {
      val n = directed(e)
      val m = mins(n)
      canon(joinMins(n, m).filter(col("v") < col("u"))
        .select(col("v").as("u"), col("m").as("v"))
        .union(m.select(col("u"), col("m").as("v"))))
    }
    var edges = graft.Materialize.localCheckpoint(canon(e0.na.drop()
      .select(col("src").as("u"), col("dst").as("v")))
      .repartition(width, col("u")))
    var prevCount = edges.count()
    var converged = prevCount == 0L
    var i = 0
    while (i < maxIter && !converged) {
      val next = graft.Materialize.localCheckpoint(smallStar(largeStar(edges))
        .repartition(width, col("u")))
      val nextCount = next.count()
      // exact fixpoint test: canonical sets are equal iff same size and
      // empty difference (one bounded anti-join per round)
      converged = nextCount == prevCount &&
        next.except(edges).limit(1).count() == 0L
      // the superseded round's blocks are never read again — reclaim now
      // instead of letting them stack across O(log²) rounds
      graft.Materialize.drop(edges)
      edges = next
      prevCount = nextCount
      if (!converged) i += 1
    }
    // A non-fixpoint edge set would hand keepRepresentatives WRONG cluster
    // ids; fail loudly. O(log²) convergence makes this unreachable for any
    // realistic graph at default maxIter.
    if (!converged)
      throw new IllegalStateException(
        s"connectedComponents did not converge in $maxIter rounds; raise maxIter")
    // fixpoint = stars: every edge is (member, root). Nodes absent from the
    // final edge set (isolated / self-paired) are their own cluster.
    val labels = edges.select(col("u").as("id"), col("v").as("cluster_id"))
      .union(edges.select(col("v").as("id"), col("v").as("cluster_id")))
      .distinct()
    nodes.join(labels, Seq("id"), "left")
      .select(col("id"), coalesce(col("cluster_id"), col("id")).as("cluster_id"))
  }

  /** Small-graph CC: collect the (bounded) edge list and run union-by-min
    * with path compression — the root of every set is its minimum id, so
    * cluster_id = find(id) directly. */
  private def driverUnionFind(spark: SparkSession, e0: DataFrame): DataFrame = {
    import spark.implicits._
    val parent = scala.collection.mutable.LongMap.empty[Long]
    def find(x0: Long): Long = {
      var x = x0
      while (parent.getOrElse(x, x) != x) x = parent(x)
      var y = x0
      while (parent.getOrElse(y, y) != y) { val n = parent(y); parent(y) = x; y = n }
      x
    }
    val nodes = scala.collection.mutable.LongMap.empty[Unit]
    // Primitive-tuple collect: Tuple2 is @specialized on Long, so the 4M-pair
    // cap really is ~64 MB of longs on the driver, not boxed Row overhead.
    e0.na.drop().as[(Long, Long)].collect().foreach { case (a, b) =>
      nodes(a) = (); nodes(b) = ()
      val ra = find(a); val rb = find(b)
      if (ra < rb) parent(rb) = ra else if (rb < ra) parent(ra) = rb
    }
    nodes.keys.toSeq.map(n => (n, find(n))).toDF("id", "cluster_id")
  }

  /** Drop every cluster member except its representative (min id): the
    * terminal step of a near-dup pipeline. `clusters` is
    * [[connectedComponents]] output; rows of `df` absent from it are
    * unique documents and pass through. */
  def keepRepresentatives(df: DataFrame, idCol: String, clusters: DataFrame): DataFrame =
    df.join(
      clusters.filter(col("id") =!= col("cluster_id")).select(col("id").as("__dup_id")),
      df(idCol) === col("__dup_id"), "left_anti")

  /**
   * Incremental exact dedup — the production shape: dedup a NEW batch
   * against the EXISTING corpus without reprocessing the corpus. Returns
   * the increment rows that survive: not present in the corpus (by
   * normalized content) and first occurrence within the increment
   * itself. The corpus contributes only its distinct key set (one
   * projection + distinct — at 100 TB you'd persist that key set and
   * anti-join against it per increment; the increment side is one
   * left-anti join + one min_by aggregate, both keyed on the content).
   */
  def exactIncrement(
      corpus: DataFrame,
      increment: DataFrame,
      textCol: String,
      idCol: String): DataFrame = {
    val seen = corpus.select(normalizedContent(col(textCol)).as("k")).distinct()
    increment
      .select(col(idCol).as("keep_id"), normalizedContent(col(textCol)).as("k"))
      .join(seen, Seq("k"), "left_anti")
      .groupBy(col("k"))
      .agg(min(col("keep_id")).as("keep_id"), count(lit(1)).as("n_copies"))
      .select(col("keep_id"), col("n_copies"))
  }

  /**
   * Incremental near-dup pairs: MinHash+LSH banding of the INCREMENT
   * joined against the banding of the CORPUS — every (new, old) pair
   * above `threshold`, without re-pairing the corpus against itself.
   * Returns (id_new, id_old, sim). Same md5 hash family and band-value
   * bucketing as [[md5MinhashLshPairs]] (a corpus's banded signature set
   * is exactly what a production dedup INDEX persists between
   * increments; the increment never sees corpus text — only matching
   * band buckets, then the shingle verify on the candidate ids).
   */
  def md5MinhashIncrementPairs(
      corpus: DataFrame,
      increment: DataFrame,
      textCol: String,
      idCol: String,
      shingleK: Int = 3,
      numHashes: Int = 64,
      bands: Int = 16,
      threshold: Double = 0.6): DataFrame = {
    val rows = numHashes / bands
    val seeds = xorSeeds(numHashes)
    def prep(df: DataFrame): DataFrame =
      graft.Materialize.localCheckpoint(
        df.select(col(idCol).as("id"), shingles(col(textCol), shingleK).as("sh"))
          .withColumn("sig", graft.functions.GraftFunctions.xor_minhash(
            transform(col("sh"), x => md5Hash60(x)), seeds)))
    def band(df: DataFrame): DataFrame =
      df.select(col("id"), col("sig")).withColumn("band",
          explode(transform(sequence(lit(0), lit(bands - 1)),
            b => struct(b.as("band_idx"),
              slice(col("sig"), b * rows + 1, lit(rows)).as("band_val")))))
        .select(col("id"), col("band.band_idx"), col("band.band_val"))
    val inc = prep(increment)
    val cor = prep(corpus)
    val candidates = band(inc).as("a").join(band(cor).as("b"),
        col("a.band_idx") === col("b.band_idx") &&
          col("a.band_val") === col("b.band_val"))
      .select(col("a.id").as("id_new"), col("b.id").as("id_old"))
      .dropDuplicates("id_new", "id_old")
    candidates
      .join(inc.select(col("id").as("id_new"), col("sh").as("sh_a")), "id_new")
      .join(cor.select(col("id").as("id_old"), col("sh").as("sh_b")), "id_old")
      .withColumn("sim", jaccardSorted(col("sh_a"), col("sh_b")))
      .filter(col("sim") >= threshold)
      .select(col("id_new"), col("id_old"), round(col("sim"), 6).as("sim"))
  }

  /**
   * Paragraph explode: one row per (doc, paragraph) with the paragraph's
   * 0-based position, split on the literal `delim` (CCNet/Gopher pipelines
   * split on newline). Paragraphs that normalize to empty (runs of
   * delimiters, whitespace-only) are dropped. A pure generator projection —
   * no shuffle; the row multiplier is the per-doc paragraph count.
   */
  def paragraphs(
      df: DataFrame,
      textCol: String,
      idCol: String,
      delim: String = "\n"): DataFrame =
    df.select(col(idCol).as("doc_id"),
        posexplode(split(col(textCol), java.util.regex.Pattern.quote(delim)))
          .as(Seq("para_idx", "para")))
      .select(col("doc_id"), col("para_idx").cast("long").as("para_idx"), col("para"))
      .filter(normalizedContent(col("para")) =!= "")

  /**
   * Corpus-wide paragraph dedup (CCNet/Gopher style): every paragraph
   * keyed by its normalized content; the FIRST occurrence — minimum
   * (doc_id, para_idx) — survives, all later occurrences (cross- and
   * within-document) are dropped. Returns the surviving rows
   * (doc_id, para_idx, para, n_copies).
   *
   * ONE hash-aggregate: `min_by` over the (doc_id, para_idx) order carries
   * the winner's payload through the partial/final combine, so no
   * winner-join is needed and only (key, winner row, count) crosses the
   * shuffle — the same single-exchange shape as [[exact]] at any scale.
   */
  def dedupParagraphs(
      df: DataFrame,
      textCol: String,
      idCol: String,
      delim: String = "\n"): DataFrame =
    paragraphs(df, textCol, idCol, delim)
      .groupBy(normalizedContent(col("para")).as("k"))
      .agg(
        min_by(struct(col("doc_id"), col("para_idx"), col("para")),
          struct(col("doc_id"), col("para_idx"))).as("w"),
        count(lit(1)).as("n_copies"))
      .select(col("w.doc_id").as("doc_id"), col("w.para_idx").as("para_idx"),
        col("w.para").as("para"), col("n_copies"))

  /**
   * End-to-end paragraph-granularity dedup: [[dedupParagraphs]] then
   * reassemble each document's SURVIVING paragraphs in original order,
   * re-joined with `delim`. Documents whose every paragraph was dropped
   * are absent (nothing left to keep). Returns
   * (doc_id, text, n_kept, n_dropped).
   *
   * The per-doc `collect_list` is bounded by a single document's paragraph
   * count — never corpus-sized — and the totals side is a second aggregate
   * over the same generator scan; both shuffles carry only (doc_id, para)
   * rows.
   */
  def paragraphDedupRebuild(
      df: DataFrame,
      textCol: String,
      idCol: String,
      delim: String = "\n"): DataFrame = {
    val totals = paragraphs(df, textCol, idCol, delim)
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_paras"))
    dedupParagraphs(df, textCol, idCol, delim)
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_kept"),
        array_join(
          transform(sort_array(collect_list(struct(col("para_idx"), col("para")))),
            s => s.getField("para")), delim).as("text"))
      .join(totals, "doc_id")
      .select(col("doc_id"), col("text"), col("n_kept"),
        (col("n_paras") - col("n_kept")).as("n_dropped"))
  }

  /**
   * Edit-distance near-dup pairs with blocking — the entity-resolution
   * dedup shape (OCR noise, typo variants) that token-set methods miss.
   * Semantics: pairs in the SAME block with `levenshtein ≤ maxDistance`
   * over the normalized text; the default block key is the normalized
   * length bucket (levenshtein ≥ |len_a − len_b|, so same-bucket blocking
   * with bucket ≥ maxDistance misses only bucket-boundary straddlers —
   * the standard ER recall/cost trade, stated in the contract rather than
   * hidden). Returns (id_a, id_b, dist), id_a < id_b.
   *
   * Scale shape: ONE equi-join on the block key — never all-pairs; the
   * quadratic term is bounded per block, and levenshtein runs codegen'd
   * inside the join. At 100 TB you'd tighten blocks (e.g. length bucket ×
   * simhash chunk) via `blockKey`.
   */
  def editDistancePairs(
      df: DataFrame,
      textCol: String,
      idCol: String,
      maxDistance: Int,
      blockKey: Column => Column = c => floor(length(c) / lit(32)).cast("long")): DataFrame = {
    // Two provable prunes run INSIDE the block join, BEFORE any
    // levenshtein (each can never drop a pair with true distance ≤ max,
    // so the result set is bit-identical):
    //   1. |len(a) − len(b)| ≤ max  (every edit changes length by ≤ 1);
    //   2. the q-gram COUNT FILTER (Gravano et al.): ed ≤ d implies the
    //      docs share ≥ max(len) − q + 1 − q·d q-grams, and the hashed-
    //      histogram min-sum (native `qgram_common_upper` kernel) only
    //      OVERestimates the common count — see QGramFilter's scaladoc.
    // The count filter is sequence-sensitive where a character-histogram
    // bound is not: on a small-vocabulary corpus every same-length pair
    // has near-identical char counts (a bag prune left 243k of 244k
    // block pairs standing at sf0.1), but near-dup-level q-gram sharing
    // is rare. q is a measured choice: the floor max(len)−(q−1)−q·d
    // tightens as q SHRINKS for short docs (median 295 chars here), and
    // at q=3 the exact filter passes 23% of block pairs vs 43% at q=8
    // (larger q also adds nothing on top: q3∧q8 = q3). 4096 buckets +
    // avalanche mixing keep the hashed min-sum within ~1% of the exact
    // count. Survivors then run the BANDED O(L·maxDistance) levenshtein
    // (threshold form, −1 above the cap); full O(L²) levenshtein on
    // unpruned blocks measured 1487 s at sf0.1.
    val q = 3
    val width = df.sparkSession.sessionState.conf.numShufflePartitions
    // Sparse sorted sketches, not the dense 4096-int histogram: ~L packed
    // longs per doc (13× thinner join rows at the gate's median length),
    // O(|a|+|b|) sorted-merge bound per pair, and full 32-bit hashing
    // collides less than 12-bit bucketing, so the bound is TIGHTER.
    val docs = df.select(col(idCol).as("id"),
      normalizedContent(col(textCol)).as("t"))
      .withColumn("blk", blockKey(col("t")))
      .withColumn("len", length(col("t")))
      .withColumn("qh", graft.functions.GraftFunctions
        .char_qgram_sketch(col("t"), q))
    val commonFloor =
      greatest(col("a.len"), col("b.len")) - lit(q - 1 + q * maxDistance)
    // The block key has FEW distinct values (a handful of length buckets),
    // so a plain equi-join lands each block's O(c²) work on ONE task —
    // measured as the whole query's bottleneck, not the DP. Skew
    // fragmentation via the √w×√w OUTER-PRODUCT GRID (r16; guide §2.3
    // "shuffle fewer bytes"): side A replicates to its row-stripe
    // (ga(a), *) and side B to its column-stripe (*, gb(b)), so a pair
    // meets exactly once — in cell (ga(a), gb(b)) — and each block's
    // quadratic work spreads over r² ≥ width cells by construction. The
    // previous one-sided scheme replicated A's payload rows (text +
    // q-gram sketch) ×width; the grid replicates EACH side only ×r=√w —
    // at width 32 that is ~5× fewer shuffled payload bytes for the same
    // parallelism, and the gap widens with width (×√w vs ×w). The
    // explicit repartition on the full cell key still guarantees the
    // quadratic stage is cell-parallel even when AQE turns the other
    // side into a broadcast.
    val r = math.max(1, math.ceil(math.sqrt(width.toDouble)).toInt)
    val aSide = docs
      .withColumn("ga", pmod(hash(col("id")), lit(r)))
      .withColumn("gb", explode(lit((0 until r).toArray)))
      .repartition(width, col("blk"), col("ga"), col("gb"))
    val bSide = docs
      .withColumn("gb", pmod(hash(col("id")), lit(r)))
      .withColumn("ga", explode(lit((0 until r).toArray)))
    aSide.as("a").join(bSide.as("b"),
        col("a.blk") === col("b.blk") && col("a.ga") === col("b.ga") &&
          col("a.gb") === col("b.gb") &&
          col("a.id") < col("b.id") &&
          abs(col("a.len") - col("b.len")) <= maxDistance &&
          graft.functions.GraftFunctions
            .qgram_common_upper_sorted(col("a.qh"), col("b.qh")) >= commonFloor)
      // explode(array(_)) is a deliberate OPTIMIZER FENCE: a plain
      // select+filter on the DP result gets rewritten by
      // PushPredicateThroughJoin into a join-condition conjunct AHEAD of
      // the cheap prunes (measured: the DP ran on every block pair and
      // the q-gram filter never fired). A filter on a generator output
      // cannot be pushed below the Generate, so the survivors-only DP
      // order is guaranteed, and the generated attribute is evaluated
      // exactly once (filter + output read the attribute, not the kernel).
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        explode(array(graft.functions.GraftFunctions
          .levenshtein_bounded(col("a.t"), col("b.t"), maxDistance))).as("dist"))
      .filter(col("dist") >= 0)
  }

  /** Word k-gram instances of every document with their 0-based start
    * positions: (doc_id, start_idx, gram) over lowercased tokens. Docs
    * shorter than k words emit nothing. A pure generator projection over
    * the native one-pass `word_ngrams` kernel — the equivalent
    * transform(sequence, slice, concat_ws) HOF chain is interpreted AND
    * re-evaluates the inlined tokenization per lambda element after
    * projection collapse (measured 5.4 s vs 0.5 s for the instance
    * explode alone at sf0.1). */
  def ngramInstances(
      df: DataFrame, textCol: String, idCol: String, k: Int): DataFrame =
    df.select(col(idCol).as("doc_id"),
        posexplode(graft.functions.GraftFunctions.word_ngrams(col(textCol), k))
          .as(Seq("start_idx", "gram")))
      .select(col("doc_id"), col("start_idx").cast("long").as("start_idx"), col("gram"))

  /**
   * Content-defined chunks of every document: (doc_id, chunk_idx, fp,
   * len) where cuts follow the local rolling-hash rule (see
   * [[graft.functions.Cdc]]) — the chunk-granularity dedup unit that
   * stays stable under insertions, unlike fixed-width blocks. Expected
   * chunk size ≈ `divisor` bytes past the window.
   *
   * Scale shape: two codegen'd passes over each doc (fps + lens), one
   * generator explode — zero shuffle until a consumer aggregates.
   */
  def cdcChunks(
      df: DataFrame, textCol: String, idCol: String,
      window: Int = 16, divisor: Int = 64): DataFrame =
    df.select(col(idCol).as("doc_id"),
        graft.functions.GraftFunctions
          .cdc_chunk_fps(col(textCol), window, divisor).as("fps"),
        graft.functions.GraftFunctions
          .cdc_chunk_lens(col(textCol), window, divisor).as("lens"))
      .select(col("doc_id"),
        posexplode(arrays_zip(col("fps"), col("lens"))).as(Seq("chunk_idx", "z")))
      .select(col("doc_id"), col("chunk_idx").cast("long").as("chunk_idx"),
        col("z.fps").as("fp"), col("z.lens").as("len"))

  /** Chunk-level dedup stats: every chunk identity (fp, len) occurring
    * more than once corpus-wide, with occurrence and document counts —
    * ONE hash-aggregate over the chunk stream. */
  def cdcDuplicatedChunks(
      df: DataFrame, textCol: String, idCol: String,
      window: Int = 16, divisor: Int = 64): DataFrame =
    cdcChunks(df, textCol, idCol, window, divisor)
      .groupBy(col("fp"), col("len"))
      .agg(count(lit(1)).as("occ"), countDistinct(col("doc_id")).as("n_docs"))
      .filter(col("occ") > 1)

  /**
   * Incremental chunk-level dedup — dedup the DELTA against the standing
   * corpus's chunk identity set, never re-chunking the corpus into pairs:
   * per increment document, how many of its content-defined chunks (and
   * bytes) are NOVEL vs already present anywhere in the corpus. This is
   * the production ingest shape: the corpus contributes only its distinct
   * (fp, len) set (8+8 bytes per unique chunk — the persistable "chunk
   * index"), the increment pays one anti-join + one aggregate.
   * Returns (doc_id, n_chunks, total_bytes, n_novel, novel_bytes) for
   * every increment document that produced at least one chunk.
   */
  def cdcIncrement(
      corpus: DataFrame, increment: DataFrame, textCol: String, idCol: String,
      window: Int = 16, divisor: Int = 64): DataFrame = {
    val seen = cdcChunks(corpus, textCol, idCol, window, divisor)
      .select(col("fp"), col("len")).distinct()
    val inc = cdcChunks(increment, textCol, idCol, window, divisor)
    val novel = inc.join(seen, Seq("fp", "len"), "left_anti")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_novel"), sum(col("len")).as("novel_bytes"))
    inc.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_chunks"), sum(col("len")).as("total_bytes"))
      .join(novel, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_chunks"), col("total_bytes"),
        coalesce(col("n_novel"), lit(0L)).as("n_novel"),
        coalesce(col("novel_bytes"), lit(0L)).as("novel_bytes"))
  }

  /**
   * Directed containment pairs: (id_a, id_b, containment) where
   * containment = |shingles(A) ∩ shingles(B)| / |shingles(A)| ≥ threshold
   * and A ≠ B — the asymmetric cousin of Jaccard that catches a document
   * CONTAINED in a larger one (quote-expansion, boilerplate wrapping,
   * near-supersets), which symmetric similarity misses when sizes differ.
   *
   * Scale shape: inverted-index equi-join on the shingle (never all
   * pairs), partial-aggregated (a, b) intersection counts, then one
   * broadcast-sized join against per-doc set sizes. Hot shingles fan out
   * like any set-similarity join; the standard prefix-filter/minhash
   * candidate prune composes in front of this when the corpus demands it.
   */
  def containmentPairs(
      df: DataFrame, textCol: String, idCol: String,
      shingleK: Int = 3, threshold: Double = 0.8): DataFrame = {
    val sets = df.select(col(idCol).as("id"),
      explode(shingles(col(textCol), shingleK)).as("sh"))
    val sizes = sets.groupBy(col("id")).agg(count(lit(1)).as("sz"))
    sets.as("a").join(sets.as("b"),
        col("a.sh") === col("b.sh") && col("a.id") =!= col("b.id"))
      .groupBy(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .agg(count(lit(1)).as("inter"))
      .join(sizes.select(col("id").as("id_a"), col("sz").as("sz_a")), "id_a")
      .withColumn("containment", col("inter") / col("sz_a"))
      .filter(col("containment") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("containment"), 6).as("containment"))
  }

  /**
   * Winnowing near-dup pairs (the MOSS decision step over
   * [[TextAnalysis.winnowingFingerprints]]): documents sharing at least
   * `minShared` distinct selected fingerprints, ranked by the share count.
   * Winnowing guarantees any common substring of length ≥ k+w−1 shares a
   * fingerprint, so this catches long verbatim overlap (quotes, mirrored
   * passages) that set-similarity misses on otherwise-different documents.
   *
   * Scale shape: inverted-index equi-join on `fp` — never all-pairs.
   * Fingerprints appearing in more than `maxDf` documents are dropped
   * before the join (the MOSS common-code rule): ubiquitous boilerplate
   * fingerprints carry no matching signal and are exactly the keys whose
   * buckets would explode quadratically. The fingerprint frame is
   * (id, fp) longs only — size-gated pin (localCheckpoint below the cap,
   * resilient persist above) since three plan legs read it.
   */
  def winnowPairs(
      df: DataFrame, textCol: String, idCol: String,
      k: Int = 8, w: Int = 4, minShared: Long = 2, maxDf: Long = 10,
      materializeMaxRows: Long = 2000000L): DataFrame = {
    val fps0 = TextAnalysis.winnowingFingerprints(df, textCol, idCol, k, w)
      .select(col(idCol).as("id"), col("fp")).distinct()
    // bounded-probe size gate: never a full corpus scan just to pick the
    // pin strategy (limit short-circuits at the cap)
    val fps = graft.Materialize.pinBySize(fps0, df, materializeMaxRows)
    val rare = fps.groupBy(col("fp")).agg(count(lit(1)).as("df"))
      .filter(col("df") <= maxDf).select(col("fp"))
    val pruned = fps.join(rare, Seq("fp"))
    pruned.as("a").join(pruned.as("b"),
        col("a.fp") === col("b.fp") && col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .agg(count(lit(1)).as("shared"))
      .filter(col("shared") >= minShared)
  }

  /**
   * Chunk-level dedup REBUILD: remove duplicated chunks keeping ONE copy
   * corpus-wide — the first occurrence by (doc_id, chunk_idx) of each
   * duplicated (fp, len) identity survives, every other occurrence is cut,
   * and each document's surviving chunks are reassembled in order (chunks
   * tile the document, so concatenation is exact byte restoration minus the
   * cuts). Returns (doc_id, text, n_kept, n_dropped); every input document
   * keeps a row even when all its chunks were cut.
   *
   * Scale shape: the drop DECISION runs on the text-free (fp, len) chunk
   * stream — winner selection is one min-struct hash-aggregate, and the
   * non-winner positions that come back are only the duplicated tail, tiny
   * next to the corpus. Chunk text moves through exactly ONE shuffle, the
   * per-document reassembly groupBy it would need under any design.
   */
  def cdcRebuild(
      df: DataFrame, textCol: String, idCol: String,
      window: Int = 16, divisor: Int = 64): DataFrame = {
    val ids = cdcChunks(df, textCol, idCol, window, divisor)
    val winners = ids.groupBy(col("fp"), col("len"))
      .agg(min(struct(col("doc_id"), col("chunk_idx"))).as("w"),
        count(lit(1)).as("occ"))
      .filter(col("occ") > 1)
    val drops = ids.join(winners, Seq("fp", "len"))
      .filter(!(col("doc_id") === col("w.doc_id") &&
        col("chunk_idx") === col("w.chunk_idx")))
      .select(col("doc_id"), col("chunk_idx"))
    val chunkText = df.select(col(idCol).as("doc_id"),
        posexplode(graft.functions.GraftFunctions
          .cdc_chunk_texts(col(textCol), window, divisor))
          .as(Seq("chunk_idx", "chunk")))
      .select(col("doc_id"), col("chunk_idx").cast("long").as("chunk_idx"),
        col("chunk"))
    chunkText.join(drops, Seq("doc_id", "chunk_idx"), "left_anti")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_kept"),
        array_join(
          transform(sort_array(collect_list(struct(col("chunk_idx"), col("chunk")))),
            s => s.getField("chunk")), "").as("text"))
      .join(chunkText.groupBy(col("doc_id")).agg(count(lit(1)).as("n_chunks")),
        Seq("doc_id"), "right")
      .join(df.select(col(idCol).as("doc_id")), Seq("doc_id"), "right")
      .select(col("doc_id"), coalesce(col("text"), lit("")).as("text"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        (coalesce(col("n_chunks"), lit(0L)) -
          coalesce(col("n_kept"), lit(0L))).as("n_dropped"))
  }

  /**
   * Exact-substring duplicate spans (Lee et al. 2022, "Deduplicating
   * Training Data Makes Language Models Better" — the suffix-array
   * ExactSubstr pass, re-expressed relationally at word-k-gram
   * granularity): every k-gram instance whose gram occurs in MORE THAN ONE
   * document. Returns (doc_id, start_idx, gram, n_docs).
   *
   * Scale shape: one explode + one hash-aggregate keyed by the gram (the
   * df count), one semi-join back — partial aggregation collapses each
   * task's gram stream before the shuffle, and the duplicated-gram set is
   * tiny next to the corpus, so the join back broadcasts.
   */
  def duplicatedSpans(
      df: DataFrame, textCol: String, idCol: String, k: Int): DataFrame = {
    val inst = ngramInstances(df, textCol, idCol, k)
    val dup = inst.groupBy(col("gram"))
      .agg(countDistinct(col("doc_id")).as("n_docs"))
      .filter(col("n_docs") > 1)
    inst.join(broadcast(dup), "gram")
      .select(col("doc_id"), col("start_idx"), col("gram"), col("n_docs"))
  }

  /**
   * Remove duplicated spans, keeping ONE copy corpus-wide: the FIRST
   * instance of each duplicated gram — minimum (doc_id, start_idx) —
   * survives; every word covered by any OTHER duplicated-gram instance is
   * dropped, and each document's surviving words are reassembled in
   * order. Returns (doc_id, text, n_kept, n_dropped); documents keep a row
   * even when everything was cut (text = '').
   *
   * Covered positions are a bounded explode of the non-winner instances
   * (×k rows on the duplicated spans only — never the corpus), distinct'd,
   * then one anti-join against the word stream; the rebuild is the same
   * per-doc bounded collect_list as [[paragraphDedupRebuild]].
   */
  def removeDuplicatedSpans(
      df: DataFrame, textCol: String, idCol: String, k: Int): DataFrame = {
    val words = df.select(col(idCol).as("doc_id"),
        posexplode(TextAnalysis.tokens(col(textCol))).as(Seq("pos", "word")))
      .select(col("doc_id"), col("pos").cast("long").as("pos"), col("word"))
    val spans = duplicatedSpans(df, textCol, idCol, k)
    val winners = spans.groupBy(col("gram"))
      .agg(min(struct(col("doc_id"), col("start_idx"))).as("w"))
      .select(col("gram"), col("w.doc_id").as("w_doc"), col("w.start_idx").as("w_start"))
    val covered = spans.join(winners, Seq("gram"))
      .filter(!(col("doc_id") === col("w_doc") && col("start_idx") === col("w_start")))
      .select(col("doc_id"),
        explode(sequence(col("start_idx"), col("start_idx") + (k - 1))).as("pos"))
      .distinct()
    words.join(covered, Seq("doc_id", "pos"), "left_anti")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_kept"),
        array_join(
          transform(sort_array(collect_list(struct(col("pos"), col("word")))),
            s => s.getField("word")), " ").as("text"))
      .join(words.groupBy(col("doc_id")).agg(count(lit(1)).as("n_words")),
        Seq("doc_id"), "right")
      .select(col("doc_id"), coalesce(col("text"), lit("")).as("text"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        (col("n_words") - coalesce(col("n_kept"), lit(0L))).as("n_dropped"))
  }

  /** SimHash fingerprints of documents. */
  def simhashes(df: DataFrame, textCol: String, idCol: String): DataFrame =
    df.select(col(idCol).as("id"),
      simhash64(TextAnalysis.tokens(col(textCol))).as("simhash"))

  /** Near-dup pairs by SimHash hamming distance ≤ maxDistance, found by
    * 16-bit chunk banding (exact for maxDistance ≤ 3). */
  def simhashPairs(
      df: DataFrame,
      textCol: String,
      idCol: String,
      maxDistance: Int = 3): DataFrame = {
    val fps = simhashes(df, textCol, idCol)
    val chunks = (0 until 4).map(c => struct(lit(c).as("chunk_idx"),
      shiftright(col("simhash"), c * 16).bitwiseAND(lit(0xffffL)).as("chunk_val")))
    val chunked = fps.withColumn("chunk", explode(array(chunks: _*)))
      .select(col("id"), col("simhash"), col("chunk.chunk_idx"), col("chunk.chunk_val"))
    chunked.as("a").join(chunked.as("b"),
        col("a.chunk_idx") === col("b.chunk_idx") &&
          col("a.chunk_val") === col("b.chunk_val") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        col("a.simhash").as("h_a"), col("b.simhash").as("h_b"))
      .dropDuplicates("id_a", "id_b")
      .withColumn("hamming", bit_count(col("h_a").bitwiseXOR(col("h_b"))))
      .filter(col("hamming") <= maxDistance)
      .select(col("id_a"), col("id_b"), col("hamming"))
  }
}
