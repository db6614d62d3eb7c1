package graft.operators

import graft.GraftSession
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Temporal joins checked against brute-force formulations. */
class TemporalJoinsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = GraftSession.builder(master = "local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def events = graft.Tables.events(spark, "/root/testdata/sf0.001")

  test("asof == brute-force latest-right-row per left row") {
    val clicks = events.filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("ts"))
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("value"), col("event_id").as("pid"))

    val got = TemporalJoins.asof(clicks, purchases,
        keys = Seq("user_id"), timeCol = "ts",
        payloadCols = Seq("value"), tiebreak = "pid")
      .select(col("event_id"), col("asof_value"))
      .collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap

    // brute force: theta join + max-by-(ts, pid)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("c.event_id"))
      .orderBy(col("p.ts").desc, col("p.pid").desc)
    val brute = clicks.as("c").join(purchases.as("p"),
        col("p.user_id") === col("c.user_id") && col("p.ts") <= col("c.ts"), "left")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("c.event_id"), col("p.value"))
      .collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap

    assert(got.size === clicks.count())
    brute.foreach { case (id, v) => assert(got(id) === v, s"event $id") }
    // left rows with no match surface null payloads
    assert(got.values.exists(_.isEmpty) === brute.values.exists(_.isEmpty))
  }

  test("asof tolerance nulls stale matches and keeps fresh ones") {
    val sp = spark; import sp.implicits._
    val toTs = (s: Long) => new java.sql.Timestamp(s * 1000)
    val left = Seq(
      (1L, 10L, toTs(10000)),   // fresh match at t-1000s
      (2L, 10L, toTs(90000)),   // only stale matches (>1h old)
      (3L, 20L, toTs(5000))).toDF("event_id", "user_id", "ts")
    val right = Seq(
      (10L, toTs(9000), 1.5, 100L),
      (10L, toTs(50000), 2.5, 101L)).toDF("user_id", "ts", "value", "pid")
    val got = TemporalJoins.asofWithin(left, right,
        keys = Seq("user_id"), timeCol = "ts",
        payloadCols = Seq("value"), tiebreak = "pid",
        toleranceMicros = 3600L * 1000000)
      .select(col("event_id"), col("asof_value"))
      .collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(got(1L) === Some(1.5))  // 1000s old, within 1h
    assert(got(2L) === None)       // latest match 40000s old -> nulled
    assert(got(3L) === None)       // no match at all
    // plain asof would have matched event 2
    val plain = TemporalJoins.asof(left, right,
        keys = Seq("user_id"), timeCol = "ts",
        payloadCols = Seq("value"), tiebreak = "pid")
      .select(col("event_id"), col("asof_value"))
      .collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(plain(2L) === Some(2.5))
  }

  test("asofWithin accepts the time column among payloads without duplication") {
    val sp = spark; import sp.implicits._
    val toTs = (s: Long) => new java.sql.Timestamp(s * 1000)
    val left = Seq(
      (1L, 10L, toTs(10000)),
      (2L, 10L, toTs(90000))).toDF("event_id", "user_id", "ts")
    val right = Seq(
      (10L, toTs(9000), 1.5, 100L),
      (10L, toTs(50000), 2.5, 101L)).toDF("user_id", "ts", "value", "pid")
    val got = TemporalJoins.asofWithin(left, right,
      keys = Seq("user_id"), timeCol = "ts",
      payloadCols = Seq("value", "ts"), tiebreak = "pid",
      toleranceMicros = 3600L * 1000000)
    // exactly one asof_ts column, kept because the caller asked for it
    assert(got.columns.count(_ == "asof_ts") === 1)
    val rows = got.select(col("event_id"), col("asof_value"), col("asof_ts"))
      .collect().map(r => r.getLong(0) -> ((Option(r.get(1)), Option(r.get(2))))).toMap
    assert(rows(1L) === ((Some(1.5), Some(toTs(9000)))))  // fresh: payload + ts kept
    assert(rows(2L) === ((None, None)))                   // stale: both nulled
  }

  test("binned range join == plain range predicate, any bin width") {
    val clicks = events.filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("ts"))
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"))
    val hour = 3600L * 1000000L

    // multiset compare: a bin-coverage bug would show as dup/missing pairs
    def pairs(df: org.apache.spark.sql.DataFrame): Seq[(Long, Long)] =
      df.select(col("l.event_id"), col("r.__rt"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted

    val expected = {
      val l = clicks.withColumn("__lt", unix_micros(col("ts")))
      val r = purchases.withColumn("__rt", unix_micros(col("ts")))
      l.as("l").join(r.as("r"),
        col("l.user_id") === col("r.user_id") &&
          col("r.__rt") >= col("l.__lt") - hour && col("r.__rt") < col("l.__lt"))
        .select(col("l.event_id"), col("r.__rt"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
    }
    // bin width smaller, equal and larger than the span must all agree
    for (bin <- Seq(hour / 3, hour, hour * 2)) {
      val got = pairs(TemporalJoins.rangeJoinBinned(clicks, purchases,
        Seq("user_id"), "ts", beforeMicros = hour, afterMicros = 0L, binMicros = bin))
      assert(got === expected, s"bin=$bin")
    }
  }
}
