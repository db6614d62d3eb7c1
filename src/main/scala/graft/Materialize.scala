package graft

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.LogicalRDD
import org.apache.spark.storage.StorageLevel

/**
 * Ownership registry for operator-internal materializations.
 *
 * Operators materialize intermediates (fingerprints, unit vectors, vocab
 * tables, canonical edge sets) with `localCheckpoint` or `persist` so two
 * consumers don't recompute the producing pipeline. Each such block set
 * needs an OWNER: in a long-lived session (the driver's 156-query bench,
 * a notebook, a streaming job) unowned blocks accumulate in the
 * CacheManager / BlockManager for the life of the JVM — measured as a ~5×
 * session-level slowdown across the round-5 bench. Every operator
 * materialization goes through here, and the harness (`Bench`, `Verify`,
 * or any caller) invokes [[release]] once a query's output has been fully
 * consumed.
 *
 * `release` is safe ONLY at a consumption boundary: dropping a persisted
 * dataset's blocks merely forces recompute, but a `localCheckpoint`
 * truncates lineage, so its blocks are unrecoverable once dropped — the
 * same contract as Spark's own `ContextCleaner`, made deterministic
 * instead of GC-timed.
 */
object Materialize {

  private val ownedDs = new java.util.concurrent.ConcurrentLinkedQueue[DataFrame]()
  private val ownedRdds = new java.util.concurrent.ConcurrentLinkedQueue[RDD[_]]()

  /** Persist with registry ownership. Lineage is KEPT: losing an executor
    * recomputes blocks instead of failing, and an early [[release]] only
    * costs recompute. */
  def persist(df: DataFrame,
      level: StorageLevel = StorageLevel.MEMORY_AND_DISK): DataFrame = {
    val p = df.persist(level)
    ownedDs.add(p)
    p
  }

  /** Eager localCheckpoint with registry ownership: the checkpointed
    * internal RDD (the actual block holder — `Dataset.unpersist` never
    * sees it) is captured for deterministic reclamation. */
  def localCheckpoint(df: DataFrame): DataFrame = {
    val cp = df.localCheckpoint()
    cp.queryExecution.analyzed.collect {
      case lr: LogicalRDD => lr.rdd
    }.foreach(ownedRdds.add)
    cp
  }

  /** Eager localCheckpoint + count, registry-owned: the standard BSP
    * round materialization (truncated plan — `persist` alone is NOT a
    * substitute: it keeps the full logical tree, and an iterative
    * operator's plan then embeds every prior round's tree, growing
    * exponentially; measured as minutes of driver time stringifying/
    * canonicalizing plans when tried). Callers use the count for
    * convergence checks and for driver-side size-gated broadcast hints
    * (the checkpointed LogicalRDD carries no stats, so the count IS the
    * statistic the planner is missing).
    *
    * The count is FUSED into the materialization job: one `runJob` over
    * the checkpoint-marked internal RDD both caches every partition
    * (local checkpointing persists on first compute) and tallies its
    * rows. The previous shape — eager `Dataset.localCheckpoint` followed
    * by `cp.count()` — paid a second job with two stages that re-read
    * every materialized block; per BSP round × per gate that was pure
    * scheduling overhead at bench scale and a full second pass over the
    * round frame at 100 TB. Same `toRdd.map(_.copy())` + `fromDataset`
    * construction as `Dataset.localCheckpoint` itself, so the resulting
    * plan (partitioning, ordering, constraints) is identical. */
  def checkpointCounted(df: DataFrame): (DataFrame, Long) = {
    val spark = df.sparkSession
    val classicDs = df.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]]
    val internal = classicDs.queryExecution.toRdd.map(_.copy())
    internal.localCheckpoint()
    val counts = spark.sparkContext.runJob(internal,
      (it: Iterator[org.apache.spark.sql.catalyst.InternalRow]) => {
        var n = 0L
        while (it.hasNext) { it.next(); n += 1 }
        n
      })
    ownedRdds.add(internal)
    val cp = org.apache.spark.sql.graftshims.GraftShims
      .checkpointedFrom(df, internal)
    (cp, counts.sum)
  }

  /** Size-gated pin for multi-consumer intermediates: `localCheckpoint`
    * (lineage cut, memory blocks) when a BOUNDED probe of `gate` finds at
    * most `maxRows` rows, resilient `persist` otherwise. The probe is
    * `limit(maxRows+1).count()` — `LocalLimit` short-circuits every task
    * at the cap, so the gate costs O(maxRows) rows scanned even on a
    * 100 TB frame, where a full `count()` gate re-scans the entire input
    * once per operator call. */
  def pinBySize(toPin: DataFrame, gate: DataFrame, maxRows: Long): DataFrame =
    if (atMostRows(gate, maxRows)) localCheckpoint(toPin) else persist(toPin)

  /** Bounded row-count probe: true iff `df` holds at most `maxRows` rows,
    * scanning at most `maxRows + 1` of them (the [[pinBySize]] gate, also
    * used directly by the dual-path dedup operators whose plan SHAPE
    * changes with corpus size). */
  def atMostRows(df: DataFrame, maxRows: Long): Boolean = {
    val cap = math.min(maxRows, Int.MaxValue - 2L).toInt
    df.limit(cap + 1).count() <= maxRows
  }

  /** Immediately drop a frame's blocks — for intermediates an operator
    * itself owns and has finished with (e.g. the previous iteration of a
    * contraction loop). The frame must not be read again if it was
    * checkpointed. */
  def drop(df: DataFrame): Unit = {
    df.queryExecution.analyzed.collect {
      case lr: LogicalRDD => lr.rdd
    }.foreach { r => try r.unpersist(blocking = false) catch { case _: Throwable => () } }
    try df.unpersist(blocking = false) catch { case _: Throwable => () }
  }

  /** Drop every owned block. Call once per query, after its result has
    * been fully consumed (counted, written, collected). */
  def release(): Unit = {
    var ds = ownedDs.poll()
    while (ds != null) {
      try ds.unpersist(blocking = false) catch { case _: Throwable => () }
      ds = ownedDs.poll()
    }
    var r = ownedRdds.poll()
    while (r != null) {
      try r.unpersist(blocking = false) catch { case _: Throwable => () }
      r = ownedRdds.poll()
    }
  }

  /** Outstanding owned materializations (spec hook). */
  def ownedCount: Int = ownedDs.size() + ownedRdds.size()

  /** Harness-side session sweep: owned blocks, stray SQL-cache entries,
    * finished memory-sink tables, and lingering streams. One call per
    * query keeps a multi-hundred-query session at fresh-JVM speed. */
  def sweep(spark: SparkSession): Unit = {
    release()
    try spark.streams.active.foreach(_.stop()) catch { case _: Throwable => () }
    try spark.catalog.clearCache() catch { case _: Throwable => () }
    try {
      spark.catalog.listTables().collect()
        .filter(t => t.isTemporary && t.name.startsWith("gate_"))
        .foreach(t => spark.catalog.dropTempView(t.name))
    } catch { case _: Throwable => () }
  }
}
