package graft.streaming

import graft.GraftSession
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Fold-level invariants for the online anomaly detector (batch mode =
  * one fold with fresh state, same code path) and the interleave
  * schedule's proportionality/determinism guarantees. */
class AnomalyInterleaveSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = GraftSession.builder(master = "local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def eventsDf(rows: Seq[(String, Long, Long)]) = {
    val s = spark
    import s.implicits._
    rows.toDF("partitionKey", "us", "m")
      .select(col("partitionKey"), timestamp_micros(col("us")).as("timestamp"),
        col("m").cast("string").as("value"), col("m"))
  }

  test("anomalyStream: constant series never flags; a spike after minPrev does") {
    val calm = (1 to 10).map(i => ("u1", i.toLong * 1000, 10L))
    val spike = Seq(("u1", 11000L, 100L))
    val out = StreamAnalytics.anomalyStream(
      eventsDf(calm ++ spike), measure = col("m")).collect()
    assert(out.length === 1)
    assert(out.head.x === 100L && out.head.n_prev === 10L)
    // the spike's own history now has variance; a later on-mean value is calm
    val out2 = StreamAnalytics.anomalyStream(
      eventsDf(calm ++ spike :+ ("u1", 12000L, 18L)), measure = col("m")).collect()
    assert(out2.map(_.x).toSeq === Seq(100L))
  }

  test("anomalyStream: nothing flags before minPrev observations") {
    val wild = (1 to 8).map(i => ("u2", i.toLong * 1000, (i * i * 37 % 97).toLong))
    val out = StreamAnalytics.anomalyStream(eventsDf(wild), measure = col("m")).collect()
    assert(out.isEmpty)
  }

  test("interleaveSchedule: contiguous positions, weight-proportional prefix, deterministic") {
    val s = spark
    import s.implicits._
    val docs = ((1 to 60).map(i => (i.toLong, "A")) ++
      (101 to 160).map(i => (i.toLong, "B"))).toDF("doc_id", "source")
    val w = when(col("source") === "A", 3).otherwise(1)
    val sched = graft.operators.Curation
      .interleaveSchedule(docs, "source", "doc_id", w, take = 40)
      .collect().sortBy(_.getInt(0))
    assert(sched.map(_.getInt(0)).toSeq === (1 to 40))
    val bySrc = sched.groupBy(_.getString(1)).view.mapValues(_.length).toMap
    assert(bySrc("A") === 30 && bySrc("B") === 10)
    val again = graft.operators.Curation
      .interleaveSchedule(docs.repartition(7), "source", "doc_id", w, take = 40)
      .collect().sortBy(_.getInt(0))
    assert(sched.map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toSeq ===
      again.map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toSeq)
  }
}
