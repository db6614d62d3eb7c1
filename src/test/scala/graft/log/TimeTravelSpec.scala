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
