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

  test("streaming progress reports source lag metrics (records behind tails)") {
    val cfg = TopicConfig(root, "lag_metrics")
    PolarLog.produce(records(0, 200), cfg)
    val q = spark.readStream.format("polar")
      .option("root", root).option("topic", "lag_metrics")
      .option("startingOffsets", "earliest").load()
      .writeStream.trigger(Trigger.AvailableNow())
      .option("checkpointLocation",
        Files.createTempDirectory("lag_ckpt").toString)
      .format("noop").start()
    q.awaitTermination(120000)
    val progresses = q.recentProgress
    assert(progresses.nonEmpty)
    val m = progresses.last.sources(0).metrics
    // the drain consumed everything the trigger knew about
    assert(m.get("recordsBehindLatest") === "0", m.toString)
    assert(m.get("maxRecordsBehindLatest") === "0", m.toString)
    assert(m.get("partitionsBehind") === "0", m.toString)
  }

  test("topicPattern subscription resolves matching topics at load") {
    PolarLog.produce(records(0, 100), TopicConfig(root, "pat_a1"))
    PolarLog.produce(records(100, 250), TopicConfig(root, "pat_a2"))
    PolarLog.produce(records(250, 300), TopicConfig(root, "pat_b"))
    val matched = spark.read.format("polar")
      .option("root", root).option("topicPattern", "pat_a.*").load()
    assert(matched.count() === 250)
    assert(matched.select("topic").distinct().collect().map(_.getString(0)).sorted
      === Array("pat_a1", "pat_a2"))
    // a non-topic directory (no metadata doc) never matches
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(root, "pat_a9"))
    assert(spark.read.format("polar")
      .option("root", root).option("topicPattern", "pat_a.*").load()
      .count() === 250)
    // no match is loud, and pattern is exclusive with topic/topics
    intercept[IllegalArgumentException] {
      spark.read.format("polar")
        .option("root", root).option("topicPattern", "nope_.*").load()
    }
    intercept[IllegalArgumentException] {
      spark.read.format("polar").option("root", root)
        .option("topic", "pat_a1").option("topicPattern", "pat_.*").load()
    }
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

  test("Trigger.Continuous refuses with a clear capability error") {
    // DELIBERATE refusal (documented in docs/USAGE.md §Triggers): continuous
    // processing trades exactly-once for at-least-once and pins one
    // long-running task per partition polling the registry — against an
    // object-store-backed log the poll IS a metadata read either way, so
    // micro-batches (1 GET per trigger, exactly-once sink commits) strictly
    // dominate. The capability error names the alternative.
    val cfg = TopicConfig(root, "s_cont")
    PolarLog.produce(records(0, 50), cfg)
    val e = intercept[Exception] {
      val q = spark.readStream.format("polar")
        .option("root", cfg.root).option("topic", cfg.topic).load()
        .writeStream.format("console")
        .trigger(Trigger.Continuous("1 second"))
        .option("checkpointLocation", s"$root/ckpt_cont")
        .start()
      q.awaitTermination(30000)
      q.stop()
    }
    assert(e.getMessage.toLowerCase.contains("continuous"), e.getMessage)
  }

  test("assign mode: only named partitions stream; checkpoint keeps the assignment") {
    val cfg = TopicConfig(root, "s_assign")
    PolarLog.produce(records(0, 600), cfg)
    val dataParts = PolarLog.tails(cfg).filter(_._2 > 0).keys.toSeq.sorted
    assert(dataParts.size >= 3, s"fixture too narrow: $dataParts")
    val mine = dataParts.take(2)
    val assignJson = s"""{"${cfg.topic}":[${mine.mkString(",")}]}"""
    def assigned = spark.readStream.format("polar")
      .option("root", cfg.root).option("assign", assignJson)
      .option("startingOffsets", "earliest").load()
    val ckpt = s"$root/ckpt_assign"
    val out = s"$root/out_assign_1"
    val expect = PolarLog.consume(spark, cfg)
      .filter(col("part").isin(mine.map(Integer.valueOf): _*)).count()
    assert(runCollect(assigned, ckpt, out) === expect)
    assert(spark.read.parquet(out).select("part").distinct()
      .collect().map(_.getInt(0)).toSet === mine.toSet)
    // checkpointed offsets carry ONLY the assignment
    val offsetFile = new java.io.File(s"$ckpt/offsets").listFiles()
      .filter(_.getName.forall(_.isDigit)).maxBy(_.getName.toInt)
    val json = new String(java.nio.file.Files.readAllBytes(offsetFile.toPath))
    dataParts.filterNot(mine.contains).foreach { p =>
      assert(!json.contains(s""""${cfg.topic}/$p""""),
        s"unassigned partition $p leaked into the checkpoint: $json")
    }
    // restart with new data: delta arrives only from assigned partitions
    PolarLog.produce(records(600, 1000), cfg)
    val expectDelta = PolarLog.consume(spark, cfg)
      .filter(col("part").isin(mine.map(Integer.valueOf): _*)).count() - expect
    assert(runCollect(assigned, ckpt, s"$root/out_assign_2") === expectDelta)
    // combining assign with a subscription refuses
    val e = intercept[Exception] {
      spark.readStream.format("polar")
        .option("root", cfg.root).option("topic", cfg.topic)
        .option("assign", assignJson).load()
    }
    assert(e.getMessage.contains("assign"), e.getMessage)
    // batch read honors the same assignment
    val batch = spark.read.format("polar")
      .option("root", cfg.root).option("assign", assignJson).load()
    assert(batch.count() === expect + expectDelta)
    // explicit starting offsets outside the assignment refuse
    val off = intercept[Exception] {
      spark.read.format("polar")
        .option("root", cfg.root).option("assign", assignJson)
        .option("startingOffsets",
          s"""{"${cfg.topic}/${dataParts.filterNot(mine.contains).head}":0}""")
        .load().count()
    }
    assert(off.getMessage.contains("assign"), off.getMessage)
  }

  test("startingOffsets JSON sentinels: -1 starts a partition at its tail, -2 at earliest") {
    val cfg = TopicConfig(root, "s_sentinel")
    PolarLog.produce(records(0, 300), cfg)
    val tails = PolarLog.tails(cfg)
    val dataParts = tails.filter(_._2 > 0).keys.toSeq.sorted
    assert(dataParts.size >= 2, "fixture must populate at least two partitions")
    val (tailPart, earliestPart) = (dataParts.head, dataParts(1))
    // tailPart pinned to its CURRENT tail (-1), earliestPart replays all
    // (-2), every unnamed partition defaults to the earliest policy
    val df = spark.readStream.format("polar")
      .option("root", root).option("topic", "s_sentinel")
      .option("startingOffsets",
        s"""{"$tailPart": -1, "$earliestPart": -2}""")
      .load()
    val got = runCollect(df,
      Files.createTempDirectory("sent_ckpt").toString, s"$root/out_sentinel")
    // unnamed partitions default to offset 0 (planInputPartitions treats
    // a missing start as the log head), so everything replays except the
    // tail-pinned partition's backlog
    val expected = tails.map { case (p, t) =>
      if (p == tailPart) 0L else t }.sum
    assert(got === expected, s"tails=$tails tailPart=$tailPart")
    // a plain negative offset that is not a sentinel refuses loudly
    val e = intercept[Exception] {
      spark.readStream.format("polar")
        .option("root", root).option("topic", "s_sentinel")
        .option("startingOffsets", """{"0": -7}""").load()
        .writeStream.trigger(Trigger.AvailableNow())
        .option("checkpointLocation",
          Files.createTempDirectory("sent_bad").toString)
        .format("noop").start().awaitTermination(60000)
    }
    def msgs(t: Throwable): String =
      if (t == null) "" else t.getMessage + " | " + msgs(t.getCause)
    assert(msgs(e).contains("sentinel"), msgs(e))
  }

  test("failOnDataLoss: trimmed-past-checkpoint fails loudly; opt-out resumes at log start") {
    val cfg = TopicConfig(root, "s_loss")
    PolarLog.produce(records(0, 200), cfg)
    val ckpt = Files.createTempDirectory("loss_ckpt").toString
    def read(opts: Map[String, String] = Map.empty) = {
      var r = spark.readStream.format("polar")
        .option("root", root).option("topic", "s_loss")
        .option("startingOffsets", "earliest")
      opts.foreach { case (k, v) => r = r.option(k, v) }
      r.load()
    }
    assert(runCollect(read(), ckpt, s"$root/out_loss_1") === 200L)
    // records produced AFTER the checkpoint drain, then trimmed away
    // before the stream sees them = genuine data loss
    PolarLog.produce(records(200, 300), cfg)
    assert(PolarLog.truncate(cfg) > 0)
    val e = intercept[Exception](
      runCollect(read(), ckpt, s"$root/out_loss_2"))
    def msgs(t: Throwable): String =
      if (t == null) "" else t.getMessage + " | " + msgs(t.getCause)
    assert(msgs(e).contains("data loss"), msgs(e))
    // opt-out: the same checkpoint resumes at the log start, skips the
    // gap, and keeps consuming new records
    PolarLog.produce(records(300, 350), cfg)
    val expected = PolarLog.consume(spark, cfg).count()
    assert(runCollect(read(Map("failOnDataLoss" -> "false")),
      ckpt, s"$root/out_loss_3") === expected)
    // a FRESH earliest stream on a trimmed topic is NOT data loss:
    // earliest resolves to the log start, not offset 0
    assert(runCollect(read(), Files.createTempDirectory("loss_ckpt2").toString,
      s"$root/out_loss_4") === expected)
  }

  test("startingTimestamp seeks to the first segment that can hold ts >= T") {
    val cfg = TopicConfig(root, "s_tseek")
    // two produces with disjoint, widely separated event-time ranges →
    // per partition, the second produce's records live in later segments
    def stamped(from: Int, until: Int, baseSec: Long) =
      graft.Tables.events(spark, sfDir)
        .filter(col("event_id") >= from && col("event_id") < until)
        .select(col("user_id").cast("string").as("partitionKey"),
          timestamp_seconds(lit(baseSec) + col("event_id")).as("timestamp"),
          col("props").as("value"))
    PolarLog.produce(stamped(0, 500, 1000000L), cfg)
    PolarLog.produce(stamped(500, 1000, 9000000L), cfg)
    // T between the two ranges (epoch seconds 8,000,000 → millis)
    val df = spark.readStream.format("polar")
      .option("root", cfg.root).option("topic", cfg.topic)
      .option("startingTimestamp", (8000000L * 1000L).toString)
      .load()
    val got = runCollect(df, s"$root/ckpt_tseek", s"$root/out_tseek")
    assert(got === 500L)
    // ISO form resolves identically
    val df2 = spark.readStream.format("polar")
      .option("root", cfg.root).option("topic", cfg.topic)
      .option("startingTimestamp",
        java.time.Instant.ofEpochSecond(8000000L).toString)
      .load()
    assert(runCollect(df2, s"$root/ckpt_tseek2", s"$root/out_tseek2") === 500L)
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

  test("minRecordsPerTrigger floor skips starved triggers until the delay elapses") {
    import graft.sources.{PolarMicroBatchStream, PolarSource, PolarOffsets}
    import org.apache.spark.sql.connector.read.streaming.ReadLimit
    val cfg = TopicConfig(root, "minrows")
    PolarLog.produce(records(0, 10), cfg)
    def stream(minRows: Long, delayMs: Long) = new PolarMicroBatchStream(
      PolarSource.configFrom(Map(
        "root" -> cfg.root, "topic" -> cfg.topic,
        "minRecordsPerTrigger" -> minRows.toString,
        "maxTriggerDelayMs" -> delayMs.toString)))
    // 10 pending < floor of 100, delay not yet elapsed -> batch SKIPPED
    val s1 = stream(100, 60 * 60 * 1000L)
    val zero = PolarOffsets.zeros(Seq(cfg))
    val lim = s1.getDefaultReadLimit
    assert(s1.latestOffset(zero, lim) === zero)
    // produce past the floor -> the batch fires with everything pending
    PolarLog.produce(records(10, 200), cfg)
    val fired = s1.latestOffset(zero, lim).asInstanceOf[PolarOffsets]
    assert(fired.totalFrom(zero) === 200L)
    // delay elapsed -> even a starved trigger fires (liveness floor)
    val s2 = stream(1000000, 0L)
    val fired2 = s2.latestOffset(zero, s2.getDefaultReadLimit)
      .asInstanceOf[PolarOffsets]
    assert(fired2.totalFrom(zero) === 200L)
    // composite: the min floor gates, then the max cap paces
    val s3 = new PolarMicroBatchStream(PolarSource.configFrom(Map(
      "root" -> cfg.root, "topic" -> cfg.topic,
      "minRecordsPerTrigger" -> "10", "maxTriggerDelayMs" -> "3600000",
      "maxRecordsPerTrigger" -> "50")))
    val capped = s3.latestOffset(zero, s3.getDefaultReadLimit)
      .asInstanceOf[PolarOffsets]
    assert(capped.totalFrom(zero) === 50L)
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

  test("multi-topic subscribe streams both logs; checkpoint resumes per (topic, part)") {
    val a = TopicConfig(root, "mt_a")
    val b = TopicConfig(root, "mt_b")
    PolarLog.produce(records(0, 300), a)
    PolarLog.produce(records(300, 500), b)
    val ckpt = s"$root/ckpt_mt"

    val out1 = s"$root/out_mt_1"
    val n1 = runCollect(
      PolarStream.readTopics(spark, Seq(a, b), startingOffsets = "earliest",
        maxRecordsPerTrigger = Some(120L)),
      ckpt, out1)
    assert(n1 === 500)
    val byTopic = spark.read.parquet(out1).groupBy("topic").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byTopic === Map("mt_a" -> 300L, "mt_b" -> 200L))

    // new data in ONE topic only -> resume delivers just that topic's delta
    PolarLog.produce(records(500, 650), b)
    val out2 = s"$root/out_mt_2"
    assert(runCollect(
      PolarStream.readTopics(spark, Seq(a, b), startingOffsets = "earliest"),
      ckpt, out2) === 150)
    val delta = spark.read.parquet(out2).groupBy("topic").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(delta === Map("mt_b" -> 150L))
  }

  test("multi-topic batch read unions the logs with per-topic attribution") {
    val a = TopicConfig(root, "mtb_a")
    val b = TopicConfig(root, "mtb_b")
    PolarLog.produce(records(0, 200), a)
    PolarLog.produce(records(200, 300), b)
    val df = spark.read.format("polar")
      .option("root", root).option("topics", "mtb_a,mtb_b").load()
    assert(df.count() === 300)
    val byTopic = df.groupBy("topic").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byTopic === Map("mtb_a" -> 200L, "mtb_b" -> 100L))
    // offsets are dense PER TOPIC: each (topic, part) starts at 0
    val bad = df.groupBy("topic", "part")
      .agg(count(lit(1)).as("n"), max("offset").as("hi"))
      .filter(col("hi") =!= col("n") - 1).count()
    assert(bad === 0L)
  }

  test("multi-topic subscription rejects writes") {
    val e = intercept[Exception] {
      spark.range(1).selectExpr("CAST(id AS STRING) AS partitionKey",
          "current_timestamp() AS timestamp", "CAST('x' AS BINARY) AS value")
        .write.format("polar").mode("append")
        .option("root", root).option("topics", "w_a,w_b").save()
    }
    def chain(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: chain(t.getCause)
    assert(chain(e).exists(_.getMessage != null) &&
      chain(e).exists(t => Option(t.getMessage).exists(_.contains("exactly one topic"))))
  }

  test("PolarOffsets json round-trips (topic, part) keys and parses legacy bare keys") {
    import graft.sources.PolarOffsets
    val o = PolarOffsets(Map(("a", 0) -> 5L, ("a", 11) -> 7L, ("b", 3) -> 0L))
    assert(PolarOffsets.parse(o.json(), "a") === o)
    // legacy single-topic checkpoint {"part":off} resolves to the default topic
    assert(PolarOffsets.parse("""{"0":5,"11":7}""", "solo") ===
      PolarOffsets(Map(("solo", 0) -> 5L, ("solo", 11) -> 7L)))
    // topic names may contain anything but '/'; lastIndexOf guards the split
    assert(PolarOffsets.parse("""{"t.x-1/4":9}""", "unused") ===
      PolarOffsets(Map(("t.x-1", 4) -> 9L)))
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
