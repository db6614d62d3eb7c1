package graft.tools

import graft.{GraftSession, Tables}
import graft.log.{PolarLog, TopicConfig}
import graft.streaming.PolarStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import java.nio.file.Files

/** Calibration probe for stream_late_drop: drains a FULLY shuffled
  * (value-ordered) single-partition topic through the watermarked hourly
  * aggregate with aggressive pacing, then dumps every emitted (window, n)
  * row INCLUDING duplicates — the discriminating observation between
  * "late input filtered" vs "merge-then-evict, late rows re-create state"
  * models of Spark's streaming-aggregation watermark semantics. */
object LateProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder(master = "local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val root = Files.createTempDirectory("late_probe").toString
    val cfg = TopicConfig(root, "late", clusterSize = 1, rangesPerToken = 1)
    val records = Tables.events(spark, sfDir).select(
      col("user_id").cast("string").as("partitionKey"),
      col("ts").as("timestamp"), col("props").as("value"))
    val res = PolarLog.produce(records, cfg,
      orderBy = Seq(col("value"), col("timestamp")))
    val pace = math.max(res.recordsWritten / 10, 1L)
    println(s"PROBE produced=${res.recordsWritten} pace=$pace root=$root")
    val agg = PolarStream.read(spark, cfg, startingOffsets = "earliest",
        maxRecordsPerTrigger = Some(pace)).toDF()
      .withWatermark("timestamp", "2 hours")
      .groupBy(window(col("timestamp"), "1 hour").as("w"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").as("ws"), col("n"))
    val q = agg.writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", s"$root/ckpt")
      .outputMode("append")
      .format("memory").queryName("late_probe").start()
    q.awaitTermination(300000)
    val out = spark.table("late_probe")
      .select(date_format(col("ws"), "yyyy-MM-dd HH:mm").as("window_start"), col("n"))
    out.coalesce(1).write.mode("overwrite").parquet("/tmp/late_probe_out")
    println(s"PROBE emitted_rows=${out.count()} distinct_windows=${out.select("window_start").distinct().count()}")
    spark.stop()
  }
}
