package graft.sources

import graft.log.{FileEntry, HadoopConf, LogMetadata, PolarLog, TopicConfig}
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/**
 * The log cleaner (Kafka's `cleanup.policy=compact` physical cleaner,
 * `kafka.log.LogCleaner` semantics re-expressed Spark-first): rewrite each
 * partition's CLEAN region — every segment below the active head segment —
 * keeping only the records that are still the LATEST for their key
 * partition-wide, preserving the survivors' original offsets. The
 * compacted (KTable) view is unchanged by construction; the raw log keeps
 * only what that view can still reach, which is what bounds a compacted
 * topic's storage at 100 TB of churn.
 *
 * Semantics, all matching Kafka:
 *  - the HEAD segment (last per partition) is never cleaned — it is the
 *    active region, and new appends supersede lazily at the next pass;
 *  - a record survives iff its offset equals the partition-wide max
 *    offset for its key (a newer record anywhere, including the head,
 *    supersedes clean-region predecessors);
 *  - latest-per-key TOMBSTONES survive by default (the delete fact must
 *    propagate to late readers); `dropTombstones = true` is the
 *    delete-retention expiry;
 *  - null-key records are not compactable and always survive;
 *  - survivors keep their offsets, so cleaned segments are offset-SPARSE
 *    (`FileEntry.dense` = false): consumer positions, windows and replay
 *    stay valid, and the planner's row-count arithmetic (LIMIT caps,
 *    offset top-N) detects sparsity and falls back to uncapped windows.
 *
 * Mechanics mirror [[PolarCompaction]]: survivors are written FIRST
 * (invisible), then ONE metadata CAS swaps each partition's clean-region
 * files for its cleaned segment (skipped if membership changed —
 * retention raced it), then superseded files are deleted. The winner
 * computation is one map-side-combinable aggregate plus one semi-join,
 * both keyed (part, key) — keys are partition-local, so at scale this
 * shuffles each key group once and nothing else.
 */
object PolarLogCleaner {

  /** Clean every partition whose clean region holds superseded records.
    * Returns the number of records physically removed.
    *
    * `deleteOriginals = false` leaves superseded segments on disk as
    * UNREGISTERED orphans — invisible to new planners but still readable
    * by long-running queries that planned pre-clean; a later
    * `PolarLog.vacuum(cfg, dataGraceMs = maxQueryDuration)` reclaims them
    * (the scheduler path uses this, same grace discipline as segment
    * compaction). The default deletes immediately. */
  def cleanKeys(
      spark: SparkSession,
      cfg: TopicConfig,
      dropTombstones: Boolean = false,
      deleteOriginals: Boolean = true): Long = {
    val meta = LogMetadata.read(cfg)
    // clean region per partition: all files below the head (last) segment
    val regions: Map[Int, Vector[FileEntry]] = meta.filesByPart.collect {
      case (p, files) if files.size >= 2 => p -> files.sortBy(_.minOffset).init
    }
    if (regions.isEmpty) return 0L
    val headMin: Map[Int, Long] = meta.filesByPart.collect {
      case (p, files) if files.size >= 2 =>
        p -> files.sortBy(_.minOffset).last.minOffset
    }

    val full = PolarLog.consumeAt(spark, cfg, meta)
    // per-partition clean-region bound as a literal map — no UDF, codegen'd
    val boundExpr = element_at(
      map(headMin.toSeq.sortBy(_._1).flatMap { case (p, b) =>
        Seq(lit(p), lit(b)) }: _*), col("part"))
    val cleanRows = full.filter(boundExpr.isNotNull && col("offset") < boundExpr)
    val winners = full.filter(col("partitionKey").isNotNull)
      .groupBy(col("part").as("wp"), col("partitionKey").as("wk"))
      .agg(max(col("offset")).as("wo"))
    var survivors = cleanRows.join(winners,
      cleanRows("part") === col("wp") &&
        cleanRows("partitionKey") === col("wk") &&
        cleanRows("offset") === col("wo"),
      "leftsemi")
      .unionAll(cleanRows.filter(col("partitionKey").isNull))
    if (dropTombstones)
      survivors = survivors.filter(
        col("value").isNotNull || col("partitionKey").isNull)

    // only partitions that actually drop records get rewritten
    val survivorCounts = survivors.groupBy(col("part")).count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val needy = regions.filter { case (p, files) =>
      survivorCounts.getOrElse(p, 0L) < files.map(_.count).sum
    }
    if (needy.isEmpty) return 0L
    val removed = needy.map { case (p, files) =>
      files.map(_.count).sum - survivorCounts.getOrElse(p, 0L) }.sum

    // 1) write one cleaned segment per needy partition (invisible until
    //    the CAS); survivors keep their offsets — the task writes rows in
    //    (part, offset) order, rolling to a new writer at part boundaries
    val needySet = needy.keySet
    val dir = cfg.dir
    val entries: Map[Int, FileEntry] = survivors
      .filter(col("part").isInCollection(needySet.map(Integer.valueOf)))
      .select(col("partitionKey"), col("token"), col("offset"),
        col("timestamp"), col("value"), col("part"))
      .repartition(col("part"))
      .sortWithinPartitions(col("part"), col("offset"))
      .queryExecution.toRdd.mapPartitions { it =>
        val conf = PolarDataWriter.writeConf()
        val out = scala.collection.mutable.ArrayBuffer
          .empty[(Int, String, Long, Long, Long, Long, Long, Long)]
        var part = -1
        var writer: org.apache.parquet.hadoop.ParquetWriter[
          org.apache.spark.sql.catalyst.InternalRow] = null
        var name: String = null
        var lo = 0L; var hi = 0L; var n = 0L
        var tsMin = Long.MaxValue; var tsMax = Long.MinValue; var tsNulls = 0L
        val buf = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(5)
        def seal(): Unit = if (writer != null) {
          writer.close()
          out += ((part, name, lo, hi, n, tsMin, tsMax, tsNulls))
          writer = null
        }
        it.foreach { row =>
          val p = row.getInt(5)
          if (p != part) {
            seal()
            part = p
            name = f"kc${row.getLong(2)}%011d-" +
              s"${java.util.UUID.randomUUID().toString.take(8)}.parquet"
            writer = PolarDataWriter.open(new Path(s"$dir/part=$p/$name"), conf)
            lo = row.getLong(2); n = 0L
            tsMin = Long.MaxValue; tsMax = Long.MinValue; tsNulls = 0L
          }
          buf.update(0, if (row.isNullAt(0)) null else row.getUTF8String(0))
          buf.update(1, if (row.isNullAt(1)) null else row.getLong(1))
          buf.update(2, row.getLong(2))
          if (row.isNullAt(3)) { tsNulls += 1; buf.update(3, null) }
          else {
            val ts = row.getLong(3)
            if (ts < tsMin) tsMin = ts
            if (ts > tsMax) tsMax = ts
            buf.update(3, ts)
          }
          buf.update(4, if (row.isNullAt(4)) null else row.getBinary(4))
          writer.write(buf)
          hi = row.getLong(2); n += 1
        }
        seal()
        out.iterator
      }.collect().map { case (p, name, lo, hi, n, tsMin, tsMax, tsNulls) =>
        val path = new Path(s"$dir/part=$p/$name")
        val bytes = path.getFileSystem(HadoopConf.shared)
          .getFileStatus(path).getLen
        val (tLo, tHi) =
          if (tsMin > tsMax) (Long.MinValue, Long.MaxValue) else (tsMin, tsMax)
        p -> FileEntry(p, name, lo, hi, n, bytes,
          System.currentTimeMillis(), tLo, tHi, tsNulls)
      }.toMap

    // 2) swap each partition's clean region for its cleaned segment — only
    //    where every member is still registered (retention may race); an
    //    all-superseded region swaps to NOTHING. Version churn from
    //    concurrent produces is expected: re-read and replay.
    var attempts = 0
    var swapped = false
    while (!swapped && attempts < 5) {
      val base = LogMetadata.read(cfg)
      try {
        LogMetadata.compareAndSet(cfg, base) { cur =>
          // MATERIALIZE the log starts BEFORE the swap: compaction must
          // never advance them (survivors may start above the first
          // file's old minOffset without anything having been lost), and
          // the legacy derive-from-files fallback would do exactly that
          val starts = cur.materializedLogStarts
          cur.copy(
            filesByPart = cur.filesByPart.map { case (p, v) =>
              needy.get(p) match {
                case Some(run) if run.map(_.name).forall(n => v.exists(_.name == n)) =>
                  val names = run.map(_.name).toSet
                  val kept = v.filterNot(f => names(f.name))
                  p -> (entries.get(p).map(kept :+ _).getOrElse(kept)
                    .sortBy(_.minOffset))
                case _ => p -> v
              }
            },
            logStarts = starts)
        }
        swapped = true
      } catch { case _: graft.log.ConcurrentMetadataException => attempts += 1 }
    }

    // 3) delete superseded originals; reclaim cleaned files whose swap
    //    lost the race
    val after = LogMetadata.read(cfg)
    def rm(path: String): Unit =
      try {
        val p = new Path(path)
        val fs = p.getFileSystem(HadoopConf.shared)
        if (fs.exists(p)) fs.delete(p, false)
      } catch { case _: java.io.IOException => () }
    var removedApplied = 0L
    needy.foreach { case (p, run) =>
      val landed = entries.get(p) match {
        case Some(e) => after.filesOf(p).exists(_.name == e.name)
        case None => run.forall(f => !after.filesOf(p).exists(_.name == f.name))
      }
      if (landed) {
        removedApplied += run.map(_.count).sum - survivorCounts.getOrElse(p, 0L)
        if (deleteOriginals) run.foreach(f => rm(f.path(cfg)))
      } else entries.get(p).foreach(e => rm(e.path(cfg)))
    }
    removedApplied min removed
  }
}
