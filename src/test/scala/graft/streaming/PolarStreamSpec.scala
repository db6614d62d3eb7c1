package graft.streaming

import graft.GraftSession
import graft.log.{PolarLog, TopicConfig}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import java.nio.file.Files

/** Streaming consume/produce over the polar DSv2 source: reset policies,
  * checkpointed groups, admission control, end-to-end pipe. */
class PolarStreamSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private var root: String = _
  private val sfDir = "/root/testdata/sf0.001"

  override def beforeAll(): Unit = {
    spark = GraftSession.builder(master = "local[4]")
      .config("spark.sql.shuffle.partitions", "8")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    root = Files.createTempDirectory("polar_stream_spec").toString
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def records(from: Int, until: Int) = graft.Tables.events(spark, sfDir)
    .filter(col("event_id") >= from && col("event_id") < until)
    .select(col("user_id").cast("string").as("partitionKey"),
      col("ts").as("timestamp"), col("props").as("value"))

  /** Runs the stream AvailableNow into a per-run parquet dir (foreachBatch
    * supports checkpoint recovery, unlike the memory sink); returns the
    * number of rows this run emitted. */
  private def runCollect(df: org.apache.spark.sql.DataFrame,
      checkpoint: String, outDir: String): Long = {
    val q = df.writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        b.drop("value").write.mode("append").parquet(outDir): Unit
      }
      .start()
    q.awaitTermination(120000)
    try spark.read.parquet(outDir).count()
    catch { case _: Exception => 0L } // no batches emitted -> dir absent
  }

  test("earliest replays the whole log; checkpoint resumes with only new records") {
    val cfg = TopicConfig(root, "s_basic")
    PolarLog.produce(records(0, 600), cfg)
    val ckpt = s"$root/ckpt_basic"

    assert(runCollect(PolarStream.read(spark, cfg, startingOffsets = "earliest"),
      ckpt, s"$root/out_basic_1") === 600)

    // same checkpoint, new data -> delta only
    PolarLog.produce(records(600, 1000), cfg)
    assert(runCollect(PolarStream.read(spark, cfg, startingOffsets = "earliest"),
      ckpt, s"$root/out_basic_2") === 400)
  }

  test("latest sees nothing until new data arrives") {
    val cfg = TopicConfig(root, "s_latest")
    PolarLog.produce(records(0, 500), cfg)
    val ckpt = s"$root/ckpt_latest"
    assert(runCollect(PolarStream.read(spark, cfg, startingOffsets = "latest"),
      ckpt, s"$root/out_latest_1") === 0)
    PolarLog.produce(records(500, 700), cfg)
    assert(runCollect(PolarStream.read(spark, cfg, startingOffsets = "latest"),
      ckpt, s"$root/out_latest_2") === 200)
  }

  test("maxRecordsPerTrigger paces batches (admission control)") {
    val cfg = TopicConfig(root, "s_paced")
    PolarLog.produce(records(0, 1000), cfg)
    val q = PolarStream.read(spark, cfg, startingOffsets = "earliest",
        maxRecordsPerTrigger = Some(100L))
      .writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", s"$root/ckpt_paced")
      .format("memory").queryName("s_paced").start()
    q.awaitTermination(180000)
    assert(spark.table("s_paced").count() === 1000)
    val batches = q.recentProgress.filter(_.numInputRows > 0)
    assert(batches.length >= 5,
      s"expected many small batches, got ${batches.length}")
    assert(batches.forall(_.numInputRows <= 120),
      batches.map(_.numInputRows).mkString(","))
  }

  test("maxBytesPerTrigger paces batches by registry byte stats") {
    val cfg = TopicConfig(root, "s_bytes")
    PolarLog.produce(records(0, 1000), cfg)
    val totalBytes = graft.log.LogMetadata.read(cfg).files.map(_.bytes).sum
    // a cap of ~1/8 total forces several batches
    val cap = math.max(totalBytes / 8, 1L)
    val q = PolarStream.read(spark, cfg, startingOffsets = "earliest",
        maxBytesPerTrigger = Some(cap))
      .writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", s"$root/ckpt_bytes")
      .format("memory").queryName("s_bytes").start()
    q.awaitTermination(180000)
    assert(spark.table("s_bytes").count() === 1000)
    val batches = q.recentProgress.filter(_.numInputRows > 0)
    assert(batches.length >= 4,
      s"expected several byte-capped batches, got ${batches.length}: " +
        batches.map(_.numInputRows).mkString(","))
    // per-batch record count bounded by cap / min-per-record-bytes (+1 for
    // the progress guarantee)
    val meta = graft.log.LogMetadata.read(cfg)
    val minPerRecord = meta.files.map(f => math.max(1L, f.bytes / f.count)).min
    val bound = cap / minPerRecord + meta.numPartitions
    assert(batches.forall(_.numInputRows <= bound),
      batches.map(_.numInputRows).mkString(","))
  }

  test("streaming produce -> streaming consume round trip preserves records and order") {
    val srcCfg = TopicConfig(root, "s_src")
    val dstCfg = TopicConfig(root, "s_dst")
    PolarLog.produce(records(0, 800), srcCfg)

    // pipe: stream-consume src, stream-produce into dst (rate-limited so
    // multiple produce batches exercise offset continuation)
    val pipe = PolarStream.read(spark, srcCfg, startingOffsets = "earliest",
      maxRecordsPerTrigger = Some(250L))
      .select(col("partitionKey"), col("timestamp"), col("value"))
    val q = PolarStream.write(pipe, dstCfg, s"$root/ckpt_pipe")
    q.awaitTermination(180000)

    val src = PolarLog.consume(spark, srcCfg)
    val dst = PolarLog.consume(spark, dstCfg)
    assert(dst.count() === 800)
    // same multiset of values per key
    val a = src.groupBy("partitionKey")
      .agg(count(lit(1)).as("n"), sum(crc32(col("value"))).as("chk"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val b = dst.groupBy("partitionKey")
      .agg(count(lit(1)).as("n"), sum(crc32(col("value"))).as("chk"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(a === b)
    // dense offsets in destination too
    val bad = dst.groupBy("part")
      .agg(count(lit(1)).as("n"), max("offset").as("hi"))
      .filter(col("hi") =!= col("n") - 1).count()
    assert(bad === 0L)
  }

  test("batch read through the DSv2 surface matches the log") {
    val cfg = TopicConfig(root, "s_batch")
    PolarLog.produce(records(0, 300), cfg)
    val viaDsv2 = spark.read.format("polar")
      .option("root", cfg.root).option("topic", cfg.topic).load()
    assert(viaDsv2.count() === 300)
    assert(viaDsv2.select("partitionKey", "offset", "part").count() === 300)
    val viaParquet = PolarLog.consume(spark, cfg)
    assert(viaDsv2.agg(sum(crc32(col("value")))).head.getLong(0) ===
      viaParquet.agg(sum(crc32(col("value")))).head.getLong(0))
  }
}
