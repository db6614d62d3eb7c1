package graft.tools

import graft.log._
import graft.streaming.PolarStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Drives spark.readStream.format("polar") and prints per-batch progress. */
object StreamProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.get()
    val root = java.nio.file.Files.createTempDirectory("stream_probe").toString
    val cfg = TopicConfig(root, "events")
    val rec = graft.Tables.events(spark, "/root/testdata/sf0.001").select(
      col("user_id").cast("string").as("partitionKey"),
      col("ts").as("timestamp"), col("props").as("value"))
    PolarLog.produce(rec, cfg)

    val q = PolarStream.read(spark, cfg, startingOffsets = "earliest",
        maxRecordsPerTrigger = Some(150L))
      .writeStream.trigger(Trigger.AvailableNow())
      .option("checkpointLocation", s"$root/ckpt")
      .format("memory").queryName("probe").start()
    q.awaitTermination(120000)
    q.recentProgress.foreach(p =>
      println(s"BATCH ${p.batchId}: rows=${p.numInputRows} endOffset=${p.sources.head.endOffset}"))
    println(s"TOTAL ${spark.table("probe").count()}")

    // probe: missing topic option
    try {
      spark.readStream.format("polar").option("root", root).load()
      println("PROBE FAIL: missing topic accepted")
    } catch { case e: Exception =>
      println("PROBE OK missing-topic: " + e.getMessage.linesIterator.next()) }
    // probe: stream from empty topic with earliest
    val q2 = PolarStream.read(spark, TopicConfig(root, "empty_topic"), "earliest")
      .writeStream.trigger(Trigger.AvailableNow())
      .option("checkpointLocation", s"$root/ckpt2")
      .format("memory").queryName("probe2").start()
    q2.awaitTermination(60000)
    println(s"EMPTY TOPIC rows=${spark.table("probe2").count()}")
    spark.stop()
  }
}
