package graft.queries

import graft.Tables
import graft.log.{PolarLog, TopicConfig}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import java.nio.file.Files

/**
 * One produced `(partitionKey=user_id, timestamp=ts, value=props)` topic per
 * (session, sfDir), shared by every gate query that only READS the log —
 * the reference's own model: one log, many consumer groups, each with its
 * own offsets (named groups land in the topic's `_groups/`, streaming
 * queries in their checkpoints; neither perturbs the log itself). Mutating
 * queries (double-produce, NDJSON ingest, ring rewrite) build their own.
 */
object SharedTopics {

  private val map =
    scala.collection.concurrent.TrieMap.empty[(String, String), (TopicConfig, Long)]

  private val segMap =
    scala.collection.concurrent.TrieMap.empty[(String, String), (TopicConfig, Seq[Long])]

  /** The shared props-valued events topic, produced on first use. */
  def eventsProps(s: SparkSession, dir: String): (TopicConfig, Long) =
    map.getOrElseUpdate((s.sparkContext.applicationId, dir), {
      val root = Files.createTempDirectory("graft_shared_topic").toString
      val cfg = TopicConfig(root, "events")
      val records = Tables.events(s, dir).select(
        col("user_id").cast("string").as("partitionKey"),
        col("ts").as("timestamp"),
        col("props").as("value"))
      // (timestamp, value) order instead of the default engine-private
      // xxhash64 tiebreak: per-partition timestamp order (the consumed
      // invariant) is identical, and offsets become oracle-replayable
      // (polar_poll_json reconstructs the poll items byte-for-byte)
      val res = PolarLog.produce(records, cfg,
        orderBy = Seq(col("timestamp"), col("value")))
      (cfg, res.recordsWritten)
    })

  /** The shared SEGMENTED fixture: the events table sliced by
    * `event_id % 4`, each slice its own commit (versions 1..4, distinct
    * createdMs — a short sleep separates commits so retention cutoffs are
    * unambiguous), ordered by (timestamp, value) within each commit.
    * Read-only gates (change feeds, history, time travel, TVFs) read it IN
    * PLACE — many consumers of one log is the reference's own model;
    * mutating gates (retention / compaction / vacuum) [[cloneTopic]] it
    * first. Returns (cfg, commit versions). Produced once per (session,
    * sfDir): one produce + three clones replace ~26 per-gate produce jobs
    * across the battery. */
  def segmentedEvents(s: SparkSession, dir: String): (TopicConfig, Seq[Long]) =
    segMap.getOrElseUpdate((s.sparkContext.applicationId, dir), {
      val root = Files.createTempDirectory("graft_shared_seg").toString
      val cfg = TopicConfig(root, "segev")
      val versions = (0 until 4).map { r =>
        if (r > 0) Thread.sleep(150)
        PolarLog.produce(Tables.events(s, dir)
          .filter(pmod(col("event_id"), lit(4)) === r)
          .select(col("user_id").cast("string").as("partitionKey"),
            col("ts").as("timestamp"), col("props").as("value")),
          cfg, orderBy = Seq(col("timestamp"), col("value")))
        graft.log.LogMetadata.read(cfg).version
      }
      (cfg, versions.toSeq)
    })

  /** Copy a topic's directory tree (data + manifests + root doc — the
    * layout is location-independent, file registries carry relative
    * names) into a fresh temp root: the cheap way for a MUTATING gate to
    * get a private fixture instead of re-producing one. */
  def cloneTopic(cfg: TopicConfig): TopicConfig = {
    val root2 = Files.createTempDirectory("graft_clone").toString
    val src = new org.apache.hadoop.fs.Path(cfg.dir)
    val dst = new org.apache.hadoop.fs.Path(s"$root2/${cfg.topic}")
    val fs = src.getFileSystem(graft.log.HadoopConf.shared)
    org.apache.hadoop.fs.FileUtil.copy(fs, src, fs, dst, false, fs.getConf)
    TopicConfig(root2, cfg.topic, cfg.clusterSize, cfg.rangesPerToken)
  }
}
