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
}
