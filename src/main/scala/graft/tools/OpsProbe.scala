package graft.tools

import graft.log._
import graft.streaming.GraftMetrics
import org.apache.spark.sql.functions._

/** Drives frames ingestion, JSON poll, ring repartition, metrics. */
object OpsProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.get()
    val root = java.nio.file.Files.createTempDirectory("ops_probe").toString

    // frames: {u32BE len}{bytes}...
    def be(n: Int) = Array[Byte]((n>>>24).toByte,(n>>>16).toByte,(n>>>8).toByte,n.toByte)
    val body = be(5) ++ "alpha".getBytes ++ be(3) ++ "xyz".getBytes
    val cfg = TopicConfig(root, "frames")
    val df = spark.createDataFrame(Seq(Tuple1("k1"))).toDF("partitionKey")
      .withColumn("body", lit(body))
    val r = TopicOps.ingestFrames(df, cfg)
    println(s"FRAMES written=${r.recordsWritten} values=" +
      PolarLog.consume(spark, cfg).select(col("value").cast("string"))
        .collect().map(_.getString(0)).sorted.mkString(","))

    // metrics across a stream run
    val ecfg = TopicConfig(root, "events")
    PolarLog.produce(graft.Tables.events(spark, "/root/testdata/sf0.001").select(
      col("user_id").cast("string").as("partitionKey"),
      col("ts").as("timestamp"), col("props").as("value")), ecfg)
    val metrics = GraftMetrics.attach(spark)
    val q = graft.streaming.PolarStream.read(spark, ecfg, "earliest")
      .writeStream.trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .option("checkpointLocation", s"$root/ck").format("memory")
      .queryName("probe_m").start()
    q.awaitTermination(120000)
    Thread.sleep(2000)
    println("METRICS " + metrics.snapshot.toSeq.sorted.mkString(", "))
    spark.stop()
  }
}
