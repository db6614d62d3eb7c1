package graft.queries

import graft.Tables
import graft.log.{PolarLog, TopicConfig}
import graft.streaming.PolarStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import java.nio.file.Files

/**
 * Streaming consume exercised through the correctness gate: events are
 * produced into a topic, streamed back through the `polar` DSv2
 * `MicroBatchStream` (paced into many micro-batches by admission control),
 * and aggregated — the oracle checks the stream delivered exactly the log,
 * no loss or duplication across batch boundaries.
 */
object StreamingQueries extends QueryRegistry {

  override def all: Seq[QueryDef] = Seq(

    QueryDef(
      "stream_consume",
      (s, dir) => {
        val root = Files.createTempDirectory("graft_stream_q").toString
        val cfg = TopicConfig(root, "events")
        val records = Tables.events(s, dir).select(
          col("user_id").cast("string").as("partitionKey"),
          col("ts").as("timestamp"),
          col("props").as("value"))
        PolarLog.produce(records, cfg)
        val n = records.count()
        val q = PolarStream.read(s, cfg, startingOffsets = "earliest",
            maxRecordsPerTrigger = Some(math.max(n / 3, 1)))
          .writeStream
          .trigger(Trigger.AvailableNow())
          .option("checkpointLocation", s"$root/ckpt")
          .format("memory").queryName("gate_stream_consume").start()
        q.awaitTermination(300000)
        s.table("gate_stream_consume")
          .groupBy(col("partitionKey"))
          .agg(count(lit(1)).as("n"),
            countDistinct(col("offset"), col("part")).as("n_unique"))
      },
      Some("""
        SELECT CAST(user_id AS VARCHAR) AS partitionKey,
               COUNT(*) AS n, COUNT(*) AS n_unique
        FROM events GROUP BY user_id""")),

    QueryDef(
      "stream_pipe",
      (s, dir) => {
        // stream-consume from one topic, stream-produce into another
        // (the reference's broker-to-broker dataflow as a Spark pipe),
        // then check the destination log against the source table
        val root = Files.createTempDirectory("graft_stream_p").toString
        val src = TopicConfig(root, "src")
        val dst = TopicConfig(root, "dst")
        val records = Tables.events(s, dir).select(
          col("user_id").cast("string").as("partitionKey"),
          col("ts").as("timestamp"),
          col("props").as("value"))
        PolarLog.produce(records, src)
        val n = records.count()
        val pipe = PolarStream.read(s, src, startingOffsets = "earliest",
            maxRecordsPerTrigger = Some(math.max(n / 3, 1)))
          .select(col("partitionKey"), col("timestamp"), col("value"))
        val q = PolarStream.write(pipe, dst, s"$root/ckpt_pipe")
        q.awaitTermination(300000)
        PolarLog.consume(s, dst)
          .groupBy(col("partitionKey"))
          .agg(count(lit(1)).as("n"))
      },
      Some("""
        SELECT CAST(user_id AS VARCHAR) AS partitionKey, COUNT(*) AS n
        FROM events GROUP BY user_id""")))
}
