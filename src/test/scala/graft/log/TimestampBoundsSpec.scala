package graft.log

import graft.GraftSession
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import java.nio.file.Files
import java.sql.Timestamp

/** KIP-937 per-topic timestamp bounds (`message.timestamp.before.max.ms` /
  * `after.max.ms`, legacy `message.timestamp.difference.max.ms`): CreateTime
  * produces reject event times too far from the append clock; LogAppendTime
  * topics skip the check (the producer timestamp is discarded, per Kafka). */
class TimestampBoundsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private var root: String = _

  override def beforeAll(): Unit = {
    spark = GraftSession.builder(master = "local[4]")
      .config("spark.sql.shuffle.partitions", "8")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    root = Files.createTempDirectory("polar_tsb_spec").toString
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def rootMsg(t: Throwable): String =
    (Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
      .map(x => Option(x.getMessage).getOrElse("")) ++ Iterator("")).mkString(" ")

  private def topic(name: String, props: (String, String)*): TopicConfig = {
    val cfg = TopicConfig(root, name)
    if (props.nonEmpty) LogMetadata.updateProps(cfg)(_ ++ props.toMap)
    cfg
  }

  private def rowsAt(tsMs: Long, n: Int = 3): DataFrame = {
    val ts = new Timestamp(tsMs)
    spark.createDataFrame((1 to n).map(i => (s"k$i", ts, s"v$i")))
      .toDF("partitionKey", "timestamp", "value")
  }

  test("timestampBounds resolution: explicit wins, legacy fills, absent = unbounded") {
    import TopicProps._
    assert(PolarLog.timestampBounds(Map.empty) === (Long.MaxValue, Long.MaxValue))
    assert(PolarLog.timestampBounds(Map(
      MessageTimestampDifferenceMaxMs -> "5000")) === (5000L, 5000L))
    // an explicit directional bound beats the legacy symmetric one
    assert(PolarLog.timestampBounds(Map(
      MessageTimestampDifferenceMaxMs -> "5000",
      MessageTimestampBeforeMaxMs -> "60000")) === (60000L, 5000L))
    assert(PolarLog.timestampBounds(Map(
      MessageTimestampAfterMaxMs -> "0")) === (Long.MaxValue, 0L))
    // malformed persisted values degrade to unbounded, never brick produce
    assert(PolarLog.timestampBounds(Map(
      MessageTimestampBeforeMaxMs -> "bogus")) === (Long.MaxValue, Long.MaxValue))
  }

  test("before.max.ms rejects stale CreateTime records; in-range lands; nothing half-registered") {
    val cfg = topic("tsb_before", TopicProps.MessageTimestampBeforeMaxMs -> "60000")
    val now = System.currentTimeMillis()
    val e = intercept[Exception] {
      PolarLog.produce(rowsAt(now - 3600L * 1000), cfg) // 1 h stale vs 1 min bound
    }
    assert(rootMsg(e).contains("out of range"), rootMsg(e))
    assert(PolarLog.consume(spark, cfg).count() === 0)
    PolarLog.produce(rowsAt(now - 1000), cfg) // 1 s stale: inside the bound
    assert(PolarLog.consume(spark, cfg).count() === 3)
  }

  test("after.max.ms rejects future CreateTime records") {
    val cfg = topic("tsb_after", TopicProps.MessageTimestampAfterMaxMs -> "60000")
    val now = System.currentTimeMillis()
    val e = intercept[Exception] {
      PolarLog.produce(rowsAt(now + 3600L * 1000), cfg)
    }
    assert(rootMsg(e).contains("out of range"), rootMsg(e))
    PolarLog.produce(rowsAt(now), cfg)
    assert(PolarLog.consume(spark, cfg).count() === 3)
  }

  test("legacy difference.max.ms bounds both directions") {
    val cfg = topic("tsb_legacy", TopicProps.MessageTimestampDifferenceMaxMs -> "60000")
    val now = System.currentTimeMillis()
    intercept[Exception] { PolarLog.produce(rowsAt(now - 3600L * 1000), cfg) }
    intercept[Exception] { PolarLog.produce(rowsAt(now + 3600L * 1000), cfg) }
    PolarLog.produce(rowsAt(now), cfg)
    assert(PolarLog.consume(spark, cfg).count() === 3)
  }

  test("LogAppendTime topics ignore the bounds (producer ts is discarded)") {
    val cfg = topic("tsb_la",
      TopicProps.MessageTimestampType -> "LogAppendTime",
      TopicProps.MessageTimestampBeforeMaxMs -> "60000",
      TopicProps.MessageTimestampAfterMaxMs -> "60000")
    val t0 = System.currentTimeMillis()
    PolarLog.produce(rowsAt(t0 - 365L * 24 * 3600 * 1000), cfg) // a year stale
    val log = PolarLog.consume(spark, cfg)
    assert(log.count() === 3)
    // and what landed is the append clock, not the stale producer time
    assert(log.filter(unix_micros(col("timestamp")) >= t0 * 1000L).count() === 3)
  }

  test("null timestamps pass validation (Kafka's NO_TIMESTAMP is never bounded)") {
    val cfg = topic("tsb_null", TopicProps.MessageTimestampBeforeMaxMs -> "60000")
    val df = spark.createDataFrame(Seq(("k1", "v1")))
      .toDF("partitionKey", "value")
      .withColumn("timestamp", lit(null).cast("timestamp"))
    PolarLog.produce(df, cfg)
    assert(PolarLog.consume(spark, cfg).count() === 1)
  }

  test("routed produce enforces bounds per destination topic") {
    val spark2 = spark; import spark2.implicits._
    val bounded = topic("tsb_route_b", TopicProps.MessageTimestampBeforeMaxMs -> "60000")
    topic("tsb_route_open") // no bounds
    val template = RingTemplate(root)
    val now = System.currentTimeMillis()
    val stale = new Timestamp(now - 3600L * 1000)
    // the stale row targeting the BOUNDED topic fails the whole produce
    val e = intercept[Exception] {
      PolarLog.produceRouted(Seq(
        ("tsb_route_b", "k1", stale, "v1"),
        ("tsb_route_open", "k2", stale, "v2"))
        .toDF("topic", "partitionKey", "timestamp", "value"), template)
    }
    assert(rootMsg(e).contains("out of range"), rootMsg(e))
    // the same stale row is fine on the unbounded destination
    PolarLog.produceRouted(Seq(("tsb_route_open", "k2", stale, "v2"))
      .toDF("topic", "partitionKey", "timestamp", "value"), template)
    assert(PolarLog.consume(spark, TopicConfig(root, "tsb_route_open")).count() === 1)
  }

  test("absurdly wide bounds clamp to unbounded instead of overflowing (ANSI)") {
    // Long.MaxValue ms is a valid config; `now ± bound` must neither throw
    // an ANSI overflow nor wrap into a spurious rejection
    val cfg = topic("tsb_huge",
      TopicProps.MessageTimestampBeforeMaxMs -> Long.MaxValue.toString,
      TopicProps.MessageTimestampAfterMaxMs -> Long.MaxValue.toString)
    val now = System.currentTimeMillis()
    PolarLog.produce(rowsAt(now - 50L * 365 * 24 * 3600 * 1000), cfg)
    assert(PolarLog.consume(spark, cfg).count() === 3)
  }

  test("validator rejects negatives; props survive the admin round-trip") {
    intercept[IllegalArgumentException] {
      TopicProps.validate(TopicProps.MessageTimestampBeforeMaxMs, "-1")
    }
    intercept[IllegalArgumentException] {
      TopicProps.validate(TopicProps.MessageTimestampDifferenceMaxMs, "x")
    }
    assert(TopicProps.validate(TopicProps.MessageTimestampAfterMaxMs, " 0 "))
    val cfg = topic("tsb_props", TopicProps.MessageTimestampBeforeMaxMs -> "1234")
    assert(LogMetadata.read(cfg).props(TopicProps.MessageTimestampBeforeMaxMs) === "1234")
  }
}
