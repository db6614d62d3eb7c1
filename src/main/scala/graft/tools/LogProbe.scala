package graft.tools

import graft.log._
import org.apache.spark.sql.functions._

/** Drives the polar log surface: produce, inspect layout, pruned consume. */
object LogProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.get()
    val root = java.nio.file.Files.createTempDirectory("log_probe").toString
    val cfg = TopicConfig(root, "events")
    val rec = graft.Tables.events(spark, "/root/testdata/sf0.001").select(
      col("user_id").cast("string").as("partitionKey"),
      col("ts").as("timestamp"), col("props").as("value"))
    val r = PolarLog.produce(rec, cfg)
    println(s"PRODUCED ${r.recordsWritten} tails=${r.newTails.toSeq.sorted}")
    println("METADATA " + new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(cfg.metadataPath))))
    // pruned consume: one partition, offset range
    val slice = PolarLog.consume(spark, cfg,
      startOffsets = Map(5 -> 10L), endOffsets = Map(5 -> 20L))
      .filter(col("part") === 5)
    slice.explain("formatted")
    println(s"SLICE ${slice.count()} rows")
    // probe: consume a topic that was never created
    val ghost = PolarLog.consume(spark, TopicConfig(root, "nope"))
    println(s"GHOST ${ghost.count()} rows, schema=${ghost.schema.map(_.name).mkString(",")}")
    // probe: produce with missing value column
    try {
      PolarLog.produce(rec.drop("value"), TopicConfig(root, "bad"))
      println("PROBE FAIL: produce without value accepted")
    } catch { case e: Exception =>
      println("PROBE OK no-value rejected: " + e.getMessage.linesIterator.next()) }
    spark.stop()
  }
}
