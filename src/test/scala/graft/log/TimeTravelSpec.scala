package graft.log

import graft.GraftSession
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import java.nio.file.Files

/** Time-travel contract: versionAsOf reads the retained root snapshot,
  * unretained versions fail loudly, streams refuse the option, and vacuum
  * is the retention boundary. */
class TimeTravelSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = GraftSession.builder(master = "local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def freshTopic(): TopicConfig =
    TopicConfig(Files.createTempDirectory("graft_tt_spec").toString, "t")

  private def recordsDf(ids: Range) = {
    val sp = spark; import sp.implicits._
    ids.map(i => (i.toString, new java.sql.Timestamp(86400000L + i * 1000L),
        s"payload-$i"))
      .toDF("partitionKey", "timestamp", "value")
  }

  test("versionAsOf sees exactly the captured commit; head sees everything") {
    val cfg = freshTopic()
    PolarLog.produce(recordsDf(0 until 20), cfg)
    val v1 = LogMetadata.read(cfg).version
    PolarLog.produce(recordsDf(20 until 50), cfg)
    def rd(asOf: Option[Long]) = {
      val r = spark.read.format("polar")
        .option("root", cfg.root).option("topic", cfg.topic)
      asOf.fold(r)(v => r.option("versionAsOf", v.toString)).load()
    }
    assert(rd(Some(v1)).count() === 20)
    assert(rd(None).count() === 50)
    // as-of values are the first produce's payloads exactly
    val vals = rd(Some(v1)).select(col("value").cast("string"))
      .collect().map(_.getString(0)).toSet
    assert(vals === (0 until 20).map(i => s"payload-$i").toSet)
  }

  test("unretained version and streaming versionAsOf both fail loudly") {
    val cfg = freshTopic()
    PolarLog.produce(recordsDf(0 until 5), cfg)
    intercept[IllegalArgumentException](LogMetadata.readAt(cfg, 999L))
    val err = intercept[Exception] {
      spark.readStream.format("polar")
        .option("root", cfg.root).option("topic", cfg.topic)
        .option("versionAsOf", "1").load()
        .writeStream.format("memory").queryName("tt_should_fail")
        .option("checkpointLocation",
          Files.createTempDirectory("tt_ck").toString)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start().awaitTermination(60000)
    }
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: causes(t.getCause)
    assert(causes(err).exists(_.isInstanceOf[UnsupportedOperationException]))
  }

  test("SQL VERSION AS OF / TIMESTAMP AS OF through the catalog") {
    val root = Files.createTempDirectory("graft_tt_cat").toString
    spark.conf.set("spark.sql.catalog.tt_cat",
      classOf[graft.sources.PolarCatalog].getName)
    spark.conf.set("spark.sql.catalog.tt_cat.root", root)
    val cfg = TopicConfig(root, "ttsql")
    PolarLog.produce(recordsDf(0 until 7), cfg)
    val v1 = LogMetadata.read(cfg).version
    Thread.sleep(1100) // snapshot mtime is second-granular on some FSes
    val cutMicros = System.currentTimeMillis() * 1000L
    Thread.sleep(1100)
    PolarLog.produce(recordsDf(7 until 12), cfg)
    assert(spark.sql(s"SELECT * FROM tt_cat.ttsql VERSION AS OF $v1").count() === 7)
    assert(spark.sql("SELECT * FROM tt_cat.ttsql").count() === 12)
    // timestamp resolution lands on the commit at-or-before the cut
    assert(LogMetadata.versionAt(cfg, cutMicros) === v1)
    val lit = java.sql.Timestamp.from(
      java.time.Instant.ofEpochMilli(cutMicros / 1000L)).toString
    assert(spark.sql(
      s"SELECT * FROM tt_cat.ttsql TIMESTAMP AS OF '$lit'").count() === 7)
  }

  test("TIMESTAMP AS OF resolves from in-doc commitMs, surviving mtime rewrites") {
    val cfg = freshTopic()
    PolarLog.produce(recordsDf(0 until 6), cfg)
    val v1 = LogMetadata.read(cfg).version
    Thread.sleep(20)
    val cutMicros = System.currentTimeMillis() * 1000L
    Thread.sleep(20)
    PolarLog.produce(recordsDf(6 until 10), cfg)
    val v2 = LogMetadata.read(cfg).version
    // simulate a copy/rsync/object-store migration: every snapshot's mtime
    // rewritten to a garbage instant far in the future — resolution must
    // come from the commitMs stamped inside the docs, not the filesystem
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(cfg.dir), spark.sparkContext.hadoopConfiguration)
    val mdir = new org.apache.hadoop.fs.Path(LogMetadata.manifestDir(cfg))
    fs.listStatus(mdir).filter(_.getPath.getName.startsWith("root-v"))
      .foreach(f => fs.setTimes(f.getPath, 4102444800000L, -1))
    assert(LogMetadata.versionAt(cfg, cutMicros) === v1)
    assert(LogMetadata.versionAt(cfg,
      System.currentTimeMillis() * 1000L) === v2)
    // before the first commit: loud, not silently version 1
    intercept[IllegalArgumentException](LogMetadata.versionAt(cfg, 1000L))
  }

  test("legacy (commitMs=0) snapshots with migrated mtimes resolve linearly") {
    // the r8 ADVICE scenario: pre-commitMs snapshots whose mtimes an
    // rsync/copy rewrote to "now" put HUGE commit times at LOW versions —
    // the binary search's monotonicity premise breaks and it would throw
    // "no retained commit" for a timestamp the linear filter+max resolves
    val cfg = freshTopic()
    PolarLog.produce(recordsDf(0 until 5), cfg)
    val v1 = LogMetadata.read(cfg).version
    Thread.sleep(20)
    PolarLog.produce(recordsDf(5 until 9), cfg)
    val v2 = LogMetadata.read(cfg).version
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(cfg.dir), spark.sparkContext.hadoopConfiguration)
    val mdir = new org.apache.hadoop.fs.Path(LogMetadata.manifestDir(cfg))
    // turn v1's snapshot legacy (commitMs -> 0) and "migrate" its mtime to
    // the far future; v2 keeps its in-doc commitMs
    val snap1 = fs.listStatus(mdir)
      .filter(_.getPath.getName.startsWith(f"root-v$v1%011d-")).head.getPath
    val txt = {
      val in = fs.open(snap1)
      try new String(org.apache.hadoop.io.IOUtils.readFullyToByteArray(in),
        java.nio.charset.StandardCharsets.UTF_8)
      finally in.close()
    }
    val legacy = txt.replaceAll(""""commitMs":\d+""", """"commitMs":0""")
    val out = fs.create(snap1, true)
    try out.write(legacy.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    fs.setTimes(snap1, 4102444800000L, -1) // year 2100
    // a timestamp after v2's commit must resolve to v2, not throw
    assert(LogMetadata.versionAt(cfg,
      System.currentTimeMillis() * 1000L + 1000000L) === v2)
    // and a timestamp before every real commit still fails loudly (v1's
    // fake future mtime must not capture it)
    intercept[IllegalArgumentException](LogMetadata.versionAt(cfg, 1000L))
  }

  test("history lists exactly the retained versions, shrinking with vacuum") {
    val cfg = freshTopic()
    PolarLog.produce(recordsDf(0 until 4), cfg)
    PolarLog.produce(recordsDf(4 until 9), cfg)
    val h = LogMetadata.history(cfg)
    assert(h.map(_.version) === Seq(1L, 2L))
    assert(h.map(_.producerOffsets.sum) === Seq(4L, 9L))
    assert(h.map(_.commitMs) === h.map(_.commitMs).sorted)
    assert(h.forall(_.commitMs > 0))
    // vacuum past the grace reclaims the snapshots → history shrinks to
    // what readAt can still serve (nothing), head untouched
    PolarLog.vacuum(cfg, manifestGraceMs = -1000L)
    assert(LogMetadata.history(cfg).isEmpty)
    assert(PolarLog.consume(spark, cfg).count() === 9)
  }

  test("compaction x time travel: grace protects as-of reads; past grace fails loud") {
    val cfg = freshTopic()
    PolarLog.produce(recordsDf(0 until 6), cfg)
    val v1 = LogMetadata.read(cfg).version
    PolarLog.produce(recordsDf(6 until 10), cfg)
    val merged = graft.sources.PolarCompaction.compact(spark, cfg,
      smallBytes = 1L << 30, minRun = 2, deleteOriginals = false)
    assert(merged > 0)
    def asof = spark.read.format("polar").option("root", cfg.root)
      .option("topic", cfg.topic).option("versionAsOf", v1.toString).load()
    // originals are unregistered orphans but still on disk (the data grace
    // window): the as-of read planned from v1's registry still succeeds
    assert(asof.count() === 6)
    assert(PolarLog.vacuum(cfg, dataGraceMs = 0L) > 0)
    // head reads are untouched; an as-of read that touches DATA past the
    // grace fails LOUDLY at scan (missing file), never silently partial.
    // (A bare count(*) still succeeds — the registry's dense offset stats
    // answer it without file I/O, and they remain correct.)
    assert(PolarLog.consume(spark, cfg).count() === 10)
    assert(asof.count() === 6)
    intercept[Exception](asof.select(col("value")).collect())
  }

  test("streaming change feed: startingVersion drains the (v, head] window") {
    val cfg = freshTopic()
    PolarLog.produce(recordsDf(0 until 8), cfg)
    val v1 = LogMetadata.read(cfg).version
    PolarLog.produce(recordsDf(8 until 13), cfg)
    val ck = Files.createTempDirectory("tt_cf_ck").toString
    val q = graft.streaming.PolarStream.readChanges(spark, cfg, v1)
      .writeStream.format("memory").queryName("tt_cf")
      .option("checkpointLocation", ck)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    val vals = spark.table("tt_cf").select(col("value").cast("string"))
      .collect().map(_.getString(0)).toSet
    assert(vals === (8 until 13).map(i => s"payload-$i").toSet)
    // batch readers accept the same option (the CDF batch read): the open
    // (v, head] window is the identical record set
    assert(spark.read.format("polar")
      .option("root", cfg.root).option("topic", cfg.topic)
      .option("startingVersion", v1.toString).load().count() === 5)
  }

  test("batch change feed via startingVersion/endingVersion read options") {
    val cfg = freshTopic()
    PolarLog.produce(recordsDf(0 until 10), cfg)
    val v1 = LogMetadata.read(cfg).version
    PolarLog.produce(recordsDf(10 until 25), cfg)
    val v2 = LogMetadata.read(cfg).version
    PolarLog.produce(recordsDf(25 until 30), cfg)
    def rd(from: Long, to: Option[Long]) = {
      val r = spark.read.format("polar")
        .option("root", cfg.root).option("topic", cfg.topic)
        .option("startingVersion", from.toString)
      to.fold(r)(v => r.option("endingVersion", v.toString)).load()
    }
    // bounded window == changesBetween exactly, record for record
    val opts = rd(v1, Some(v2)).select(col("partitionKey"), col("offset"))
      .collect().map(r => (r.getString(0), r.getLong(1))).sorted
    val api = PolarLog.changesBetween(spark, cfg, v1, Some(v2))
      .select(col("partitionKey"), col("offset"))
      .collect().map(r => (r.getString(0), r.getLong(1))).sorted
    assert(opts.toSeq === api.toSeq && opts.length === 15)
    // open window follows the head
    assert(rd(v1, None).count() === 20)
    // exact stats for the window (AQE sees the delta, not the topic)
    val scan = new graft.sources.PolarScan(graft.sources.PolarSource.configFrom(
      Map("root" -> cfg.root, "topic" -> cfg.topic,
        "startingVersion" -> v1.toString, "endingVersion" -> v2.toString)))
    assert(scan.estimateStatistics().numRows().getAsLong === 15L)
    // endingVersion is batch-only: the stream fails loudly at start
    val err = intercept[Exception] {
      spark.readStream.format("polar")
        .option("root", cfg.root).option("topic", cfg.topic)
        .option("startingVersion", v1.toString)
        .option("endingVersion", v2.toString).load()
        .writeStream.format("memory").queryName("tt_cdf_should_fail")
        .option("checkpointLocation",
          Files.createTempDirectory("graft_cdf_ckpt").toString)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start().awaitTermination(60000)
    }
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: causes(t.getCause)
    assert(causes(err).exists(_.isInstanceOf[UnsupportedOperationException]))
  }

  test("SQL TVFs polar_changes / polar_compacted resolve via extensions") {
    val cfg = freshTopic()
    PolarLog.produce(recordsDf(0 until 6), cfg)
    val v1 = LogMetadata.read(cfg).version
    PolarLog.produce(recordsDf(6 until 9), cfg)
    def one(sql: String): Long = spark.sql(sql).first().getLong(0)
    assert(one(s"SELECT count(*) FROM polar_changes('${cfg.root}', 't', $v1)") === 3)
    assert(one(s"SELECT count(*) FROM polar_compacted('${cfg.root}', 't')") === 9)
    assert(one(s"SELECT count(*) FROM polar_compacted('${cfg.root}', 't', $v1)") === 6)
    // literal-argument contract is loud
    intercept[Exception] {
      spark.sql(s"SELECT * FROM polar_changes('${cfg.root}', 't')").collect()
    }
  }

  test("vacuum past the manifest grace is the retention boundary") {
    val cfg = freshTopic()
    PolarLog.produce(recordsDf(0 until 5), cfg)
    val v1 = LogMetadata.read(cfg).version
    PolarLog.produce(recordsDf(5 until 9), cfg)
    LogMetadata.readAt(cfg, v1) // retained before vacuum
    PolarLog.vacuum(cfg, manifestGraceMs = -1000L) // everything out of grace
    intercept[IllegalArgumentException](LogMetadata.readAt(cfg, v1))
    // the head is untouched
    assert(PolarLog.consume(spark, cfg).count() === 9)
  }
}
