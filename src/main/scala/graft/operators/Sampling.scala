package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/**
 * Reproducible sampling for training-data curation: membership is a pure
 * function of a key's content hash, never of an RNG stream — so samples
 * are stable across runs, engines, partitionings and cluster sizes (the
 * property `df.sample()` cannot give), and a document's whole group
 * follows it into the same split.
 *
 * Buckets come from the engine-neutral [[Dedup.md5Hash60]], so any
 * external system (or the DuckDB oracle) reproduces the exact membership.
 */
object Sampling {

  /** Stable bucket in [0, buckets) for a key column. */
  def hashBucket(key: Column, buckets: Int = 100): Column =
    pmod(Dedup.md5Hash60(key.cast("string")), lit(buckets.toLong))

  /** Keep rows whose key hashes into the first `pct` of 100 buckets. */
  def hashSample(df: DataFrame, keyCol: String, pct: Int): DataFrame =
    df.filter(hashBucket(col(keyCol)) < pct)

  /** Deterministic train/val/test split tag for a key: the standard
    * reproducible corpus split (e.g. 90/5/5 = boundaries (90, 95)). */
  def splitTag(key: Column, trainPct: Int, valPct: Int): Column = {
    val b = hashBucket(key)
    when(b < trainPct, lit("train"))
      .when(b < trainPct + valPct, lit("val"))
      .otherwise(lit("test"))
  }

  /**
   * LEAKAGE-SAFE corpus split: assign train/val/test so that documents
   * connected by duplicate / near-duplicate edges NEVER span splits —
   * the split discipline behind every serious eval (a test document
   * whose near-dup sits in train is contamination by construction;
   * splitting i.i.d. by document hash leaks exactly those pairs). The
   * unit of assignment is the duplicate CLUSTER: every doc maps to its
   * cluster representative (component-minimum id via
   * [[Dedup.connectedComponents]] over `pairs` — any of the dedup
   * family's pair outputs plugs in), the representative's content hash
   * draws the split, and every member inherits it. Docs in no pair are
   * their own singleton representative, so clean docs split exactly as
   * [[splitTag]] on their representative id.
   *
   * Scale shape: the pair graph is a tiny fraction of the corpus even at
   * 100 TB, and CC over it is the salted star contraction (O(log²)
   * rounds); attaching representatives is ONE left join of the ≤|pairs|
   * mapping onto the corpus (broadcast when small, shuffle otherwise);
   * the split itself is a pure column expression of the representative.
   * Returns `df` plus (`cluster_rep`, `split`).
   */
  def leakageSafeSplit(
      df: DataFrame,
      idCol: String,
      pairs: DataFrame,
      aCol: String = "id_a",
      bCol: String = "id_b",
      trainPct: Int = 90,
      valPct: Int = 5): DataFrame = {
    val rep = Dedup.connectedComponents(pairs, aCol, bCol)
      .select(col("id").as(idCol), col("cluster_id"))
    df.join(rep, Seq(idCol), "left")
      .withColumn("cluster_rep",
        coalesce(col("cluster_id"), col(idCol).cast("long")))
      .drop("cluster_id")
      .withColumn("split", splitTag(col("cluster_rep"), trainPct, valPct))
  }

  /** Stratified reproducible sampling: each stratum keeps its own
    * percentage of rows (the data-mixture knob when strata are
    * languages/domains/sources). The per-stratum rate resolves to a pure
    * CASE expression — no join, no shuffle, membership still a pure
    * function of the key hash, so resampling at a new mixture touches
    * nothing but the filter. Strata absent from `pcts` keep `defaultPct`. */
  def stratifiedSample(
      df: DataFrame,
      keyCol: String,
      stratumCol: String,
      pcts: Map[String, Int],
      defaultPct: Int = 0): DataFrame = {
    val rate = pcts.toSeq.sortBy(_._1).foldLeft(lit(defaultPct)) {
      case (acc, (stratum, pct)) =>
        when(col(stratumCol) === stratum, lit(pct)).otherwise(acc)
    }
    df.filter(hashBucket(col(keyCol)) < rate)
  }

  /** Deterministic global shuffle for training order: every row gets a
    * stable `pos` by rank in content-hash order of its key — the standard
    * pre-training corpus shuffle, reproducible across runs/engines/cluster
    * sizes because the order is a pure function of (seed, key), not of an
    * RNG stream or partition layout.
    *
    * Scale shape: range-partition on the hash key + sort WITHIN partitions
    * (a distributed total sort — no single-task global sort), then assign
    * positions by partition-prefix sums (`zipWithIndex`: one lightweight
    * count job + one pass). At 100 TB this is exactly how you'd shard a
    * shuffled corpus; the sort key is 8 bytes per row regardless of row
    * width. Range boundaries come from sampling and may vary run to run,
    * but `pos` does not: the (hash, key) order is total, so positions are
    * independent of where the partition cuts land. */
  def globalShuffle(
      df: DataFrame,
      keyCol: String,
      seed: Long = 0L,
      partitions: Int = 0): DataFrame = {
    val spark = df.sparkSession
    val n =
      if (partitions > 0) partitions
      else spark.sessionState.conf.numShufflePartitions
    val key = Dedup.md5Hash60(
      concat(lit(seed.toString), lit(":"), col(keyCol).cast("string")))
    val sorted = df
      .withColumn("__shuffle_key", key)
      .repartitionByRange(n, col("__shuffle_key"), col(keyCol))
      .sortWithinPartitions(col("__shuffle_key"), col(keyCol))
      .drop("__shuffle_key")
    val out = sorted.schema.add("pos", LongType, nullable = false)
    val rdd = sorted.rdd.zipWithIndex().map { case (r, i) =>
      Row.fromSeq(r.toSeq :+ i)
    }
    spark.createDataFrame(rdd, out)
  }

  /**
   * Weighted sampling without replacement (Efraimidis–Spirakis A-ES): each
   * row draws a deterministic uniform u from its key's content hash and
   * gets priority ln(u)/w — taking the top-k by priority IS a weighted
   * sample without replacement. Because u is a pure function of the key,
   * the sample is reproducible across runs/engines/partitionings, like
   * everything else in this object.
   *
   * Plan shape: one codegen'd projection + TakeOrderedAndProject — each
   * partition keeps its local top-k and only k rows reach the driver-side
   * merge; no global sort, no shuffle of the corpus. Selection orders by
   * the priority ROUNDED to 9 digits with the key as tiebreaker so the
   * cross-engine float gap (JVM vs libm `ln`, ≤1 ulp) cannot flip an
   * ordering decision.
   */
  def weightedSample(
      df: DataFrame,
      keyCol: String,
      weightCol: String,
      k: Int): DataFrame = {
    val u = (Dedup.md5Hash60(col(keyCol).cast("string")) + lit(1L)).cast("double") /
      lit(math.pow(2, 60))
    df.withColumn("__pri", round(log(u) / col(weightCol), 9))
      .orderBy(col("__pri").desc, col(keyCol))
      .limit(k)
      .select(col(keyCol), col(weightCol),
        // + 0.0 folds a rounded −0.0 to 0.0 (cross-engine repr parity)
        (round(col("__pri"), 6) + lit(0.0)).as("priority"))
  }
}
