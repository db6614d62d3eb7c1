package graft.streaming

import graft.GraftSession
import graft.log.{PolarLog, TopicConfig}
import graft.operators.SkewJoin
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import java.nio.file.Files

class StreamAnalyticsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private var root: String = _
  private val sfDir = "/root/testdata/sf0.001"

  override def beforeAll(): Unit = {
    spark = GraftSession.builder(master = "local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    root = Files.createTempDirectory("stream_analytics_spec").toString
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def producedTopic(name: String): TopicConfig = {
    val cfg = TopicConfig(root, name)
    PolarLog.produce(graft.Tables.events(spark, sfDir).select(
      col("user_id").cast("string").as("partitionKey"),
      col("ts").as("timestamp"), col("props").as("value")), cfg)
    cfg
  }

  test("windowed counts over the live stream equal the batch replay") {
    val cfg = producedTopic("w_agg")
    val q = StreamAnalytics.windowedCounts(
        PolarStream.read(spark, cfg, "earliest"), "partitionKey", "1 hour", "5 minutes")
      .writeStream.trigger(Trigger.AvailableNow())
      .option("checkpointLocation", s"$root/ckpt_w")
      .outputMode("complete")
      .format("memory").queryName("w_agg_out").start()
    q.awaitTermination(120000)
    val streamed = spark.table("w_agg_out")
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet
    val batch = StreamAnalytics.windowedCounts(
        PolarLog.consume(spark, cfg), "partitionKey", "1 hour")
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet
    assert(streamed === batch)
    assert(batch.nonEmpty)
  }

  test("sessionize (batch replay): totals add up and sessions respect the gap") {
    val cfg = producedTopic("sess")
    val sessions = StreamAnalytics
      .sessionize(PolarLog.consume(spark, cfg).toDF(), gapSeconds = 3600)
      .collect()
    assert(sessions.map(_.n_events).sum === 1000)
    sessions.foreach { s =>
      assert(s.duration_secs >= 0)
      assert(s.first_ts.getTime <= s.last_ts.getTime)
    }
    // tighter gap => at least as many sessions
    val tighter = StreamAnalytics
      .sessionize(PolarLog.consume(spark, cfg).toDF(), gapSeconds = 600)
      .collect()
    assert(tighter.length >= sessions.length)
    assert(tighter.map(_.n_events).sum === 1000)
  }

  test("sessionize over a live stream accumulates state across micro-batches") {
    val cfg = producedTopic("sess_live")
    val q = StreamAnalytics.sessionize(
        PolarStream.read(spark, cfg, "earliest",
          maxRecordsPerTrigger = Some(300L)).toDF(), gapSeconds = 60)
      .writeStream.trigger(Trigger.AvailableNow())
      .option("checkpointLocation", s"$root/ckpt_sl")
      .outputMode("append")
      .format("memory").queryName("sess_live_out").start()
    q.awaitTermination(120000)
    // closed sessions only (trailing ones stay in state) — every emitted
    // session must respect the gap contract
    val emitted = spark.table("sess_live_out").collect()
    emitted.foreach { r =>
      assert(r.getAs[Long]("n_events") >= 1)
      assert(r.getAs[Long]("duration_secs") >= 0)
    }
  }

  test("stream packing carries the per-shard token cursor across micro-batches") {
    val cfg = TopicConfig(root, "pack_s")
    val docs = graft.Tables.documents(spark, sfDir).select(
      col("doc_id").cast("string").as("partitionKey"),
      timestamp_seconds(col("doc_id") + 86400).as("timestamp"),
      col("text").as("value"))
    PolarLog.produce(docs, cfg)
    val n = docs.count()
    // pace to force SEVERAL micro-batches through the stateful packer
    val streamDocs = PolarStream.read(spark, cfg, "earliest",
        maxRecordsPerTrigger = Some(math.max(n / 3, 1)))
      .select(col("partitionKey").cast("long").as("doc_id"),
        graft.operators.TextAnalysis.subwordCount(col("value").cast("string")).as("nt"))
    // capture each micro-batch's packed rows so the carry can be replayed
    val batches =
      scala.collection.mutable.ArrayBuffer.empty[(Long, Array[(Long, Long, Long, Long)])]
    val q = StreamAnalytics.packStream(streamDocs, contextLen = 512, shards = 4)
      .writeStream.trigger(Trigger.AvailableNow())
      .option("checkpointLocation", s"$root/ckpt_pk")
      .outputMode("append")
      .foreachBatch { (df: org.apache.spark.sql.Dataset[PackedDoc], id: Long) =>
        val rows = df.collect().map(p => (p.shard, p.window, p.doc_id, p.nt))
        batches.synchronized { batches += ((id, rows)) }
        ()
      }
      .start()
    q.awaitTermination(120000)
    assert(batches.size > 1, s"pacing should yield several batches, got ${batches.size}")
    val out = batches.sortBy(_._1).flatMap(_._2)
    // every doc packed exactly once
    assert(out.length === n)
    assert(out.map(_._3).distinct.length === n)
    // EXACT cross-batch semantics: replay the packer — batches in commit
    // order, each batch's shard group in (md5Hash60, id) order, ONE cursor
    // per shard carried through. A state reset or skip would diverge.
    val hOf = graft.Tables.documents(spark, sfDir)
      .select(col("doc_id"),
        graft.operators.Dedup.md5Hash60(col("doc_id").cast("string")).as("h"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val cursor = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
    val expectedWin = scala.collection.mutable.Map.empty[Long, Long]
    batches.sortBy(_._1).foreach { case (_, rows) =>
      rows.groupBy(_._1).toSeq.sortBy(_._1).foreach { case (shard, rs) =>
        rs.sortBy(r => (hOf(r._3), r._3)).foreach { case (_, _, id, nt) =>
          expectedWin(id) = cursor(shard) / 512
          cursor(shard) += nt
        }
      }
    }
    out.foreach { case (shard, win, id, nt) =>
      assert(win === expectedWin(id),
        s"doc $id in shard $shard: window $win != replay ${expectedWin(id)}")
    }
    // window ids contiguous from 0 per shard (carry signature: no reopened
    // window 0, no gaps)
    out.groupBy(_._1).foreach { case (shard, rows) =>
      val wins = rows.map(_._2).distinct.sorted
      assert(wins === (0L until wins.length).toVector,
        s"shard $shard windows not contiguous: ${wins.toSeq}")
    }
  }

  test("streaming dedup drops in-watermark duplicates across micro-batches") {
    val cfg = TopicConfig(root, "dedup_s")
    val base = graft.Tables.events(spark, sfDir).limit(200).select(
      col("user_id").cast("string").as("partitionKey"),
      col("ts").as("timestamp"), col("props").as("value"))
    // produce everything twice -> log holds 400 records, 200 distinct
    PolarLog.produce(base, cfg)
    PolarLog.produce(base, cfg)
    val q = StreamAnalytics.dedupStream(
        PolarStream.read(spark, cfg, "earliest",
          maxRecordsPerTrigger = Some(150L))
          .select(col("partitionKey"), col("timestamp"), col("value")),
        keyCols = Seq("partitionKey", "value"), watermark = "60 days")
      .writeStream.trigger(Trigger.AvailableNow())
      .option("checkpointLocation", s"$root/ckpt_d")
      .format("memory").queryName("dedup_s_out").start()
    q.awaitTermination(120000)
    assert(spark.table("dedup_s_out").count() === 200)
    assert(PolarLog.consume(spark, cfg).count() === 400)
  }

  test("salted join returns exactly the plain join's rows") {
    val li = graft.Tables.lineitem(spark, sfDir)
    val p = graft.Tables.part(spark, sfDir).withColumnRenamed("p_partkey", "l_partkey")
    val salted = SkewJoin.saltedInnerJoin(li, p, "l_partkey", saltFactor = 4)
      .groupBy("p_brand").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val plain = li.join(p, "l_partkey")
      .groupBy("p_brand").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(salted === plain)
    assert(plain.nonEmpty)
  }
}
