package graft.operators

import graft.{GraftSession, SparkEntry, Tables}
import graft.log.{PolarLog, TopicConfig}
import graft.streaming.{PolarStream, StreamAnalytics}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import java.nio.file.Files

/** Semantics of the round-6 late-batch operators: frontier BFS, streaming
  * funnel, masked packing, target encoding, preference pairs, ACF. */
class R6NewOpsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private val sfDir = "/root/testdata/sf0.001"

  override def beforeAll(): Unit = {
    spark = GraftSession.builder(master = "local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def edgesOf(pairs: Seq[(Long, Long)]) = {
    val sp = spark; import sp.implicits._
    val raw = pairs.toDF("a", "b")
    raw.select(col("a").as("src"), col("b").as("dst"))
      .unionAll(raw.select(col("b").as("src"), col("a").as("dst")))
  }

  test("bfsDistances: exact hop counts on a path graph, capped at maxHops") {
    val sp = spark; import sp.implicits._
    val edges = edgesOf(Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L)))
    val seeds = Seq(1L).toDF("node")
    val got = Analytics.bfsDistances(edges, seeds, maxHops = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 3L))
    graft.Materialize.release()
  }

  test("bfsDistances: equals a sequential BFS on a random graph, multi-source") {
    val sp = spark; import sp.implicits._
    val rnd = new scala.util.Random(7)
    val pairs = Seq.fill(120)((rnd.nextInt(40).toLong, rnd.nextInt(40).toLong))
      .filter(p => p._1 != p._2).distinct
    val seeds = Seq(0L, 17L)
    // sequential reference
    val adj = (pairs ++ pairs.map(_.swap)).groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
    var dist = seeds.map(_ -> 0L).toMap
    var frontier = seeds.toSet
    for (h <- 1 to 4) {
      val next = frontier.flatMap(n => adj.getOrElse(n, Set.empty)) -- dist.keySet
      dist = dist ++ next.map(_ -> h.toLong)
      frontier = next
    }
    val got = Analytics.bfsDistances(edgesOf(pairs), seeds.toDF("node"), maxHops = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === dist)
    graft.Materialize.release()
  }

  test("packWithLossMask: window assignment matches plain packing; mask arithmetic exact") {
    val docs = Tables.documents(spark, sfDir)
    val masked = Curation.packWithLossMask(docs, "text", "doc_id", 512,
      promptTokens = 32, shards = 4)
    assert(masked.filter(col("n_prompt") > 32).count() === 0)
    assert(masked.filter(col("n_loss") =!= col("n_tokens") - col("n_prompt")).count() === 0)
    val plain = Curation.packDocuments(docs, "text", "doc_id", 512, shards = 4)
      .select(col("doc_id"), col("window").as("w_plain"))
    val drift = masked.join(plain, "doc_id")
      .filter(col("window") =!= col("w_plain")).count()
    assert(drift === 0, "mask columns must not perturb window assignment")
  }

  test("feature_target_encode: LOO excludes the row's own value") {
    val te = SparkEntry.queries("feature_target_encode")(spark, sfDir)
    val orders = Tables.orders(spark, sfDir)
    assert(te.count() === orders.count())
    // a category's rows get DIFFERENT encodes unless their targets tie —
    // the signature of leave-one-out (plain mean encoding is constant
    // per category)
    val distinctPerCat = te.groupBy(col("o_orderpriority"))
      .agg(countDistinct(col("te")).as("d"), count(lit(1)).as("n"))
    assert(distinctPerCat.filter(col("n") > 10 && col("d") === 1).count() === 0)
    assert(te.filter(col("n") > 1 && col("te").isNull).count() === 0)
  }

  test("pipeline_pref_pairs: chosen dominates rejected and ids come from the group") {
    val pp = SparkEntry.queries("pipeline_pref_pairs")(spark, sfDir)
    assert(pp.filter(col("chosen_score") < col("rejected_score")).count() === 0)
    assert(pp.filter(col("margin") =!=
      col("chosen_score") - col("rejected_score")).count() === 0)
    assert(pp.filter(col("chosen_id") === col("rejected_id")).count() === 0)
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("source").as("doc_source"))
    val stray = pp.join(docs, col("chosen_id") === col("doc_id"))
      .filter(col("source") =!= col("doc_source")).count()
    assert(stray === 0)
  }

  test("events_acf: 12 lags, |acf| bounded by 1, shared positive denominator") {
    val acf = SparkEntry.queries("events_acf")(spark, sfDir).collect()
    assert(acf.length === 12)
    assert(acf.map(_.getAs[Long]("lag")).sorted.toSeq === (1L to 12L))
    assert(acf.forall(r => math.abs(r.getAs[Double]("acf")) <= 1.0 + 1e-9))
    assert(acf.forall(_.getAs[Long]("den") > 0))
  }

  test("partitionForToken: dev-mode single broker maps into [0, rangesPerToken)") {
    import graft.functions.TokenMath
    val rnd = new scala.util.Random(11)
    val tokens = Seq(Long.MinValue, -1L, 0L, 1L, Long.MaxValue) ++
      Seq.fill(2000)(rnd.nextLong())
    for (rpt <- Seq(1, 2, 4, 8); t <- tokens) {
      val p = TokenMath.partitionForToken(t, 1, rpt)
      assert(p >= 0 && p < rpt, s"token=$t rpt=$rpt -> $p")
      // placement agrees with the consume ranges: the token falls inside
      // the [start, end) of the range it was placed in
      val (lo, hi) = TokenMath.rangeByTokenAndClusterSize(t, p, rpt, 1)
      assert(t >= lo && (t < hi || hi == Long.MaxValue && t == Long.MaxValue))
    }
  }

  test("events_forecast_snaive: full 24-hour grid with exact absolute errors") {
    val fc = SparkEntry.queries("events_forecast_snaive")(spark, sfDir).collect()
    assert(fc.length === 24)
    assert(fc.forall(r => r.getAs[Long]("abs_err") ===
      math.abs(r.getAs[Long]("actual") - r.getAs[Long]("forecast"))))
  }

  test("sim_ann_rankeval: dense truth ranks, exact reciprocal-rank numerators") {
    val re = SparkEntry.queries("sim_ann_rankeval")(spark, "/root/testdata/sf0.01").collect()
    assert(re.map(_.getAs[Long]("rk_b")).sorted.toSeq === (1L to 10L))
    re.foreach { r =>
      val rkl = Option(r.getAs[java.lang.Long]("rk_l")).map(_.toLong)
      val rr = r.getAs[Long]("rr2520")
      rkl match {
        case Some(k) => assert(rr === 2520L / k && 2520L % k === 0L)
        case None => assert(rr === 0L)
      }
    }
  }

  test("stream_late_drop: emitted counts never exceed the batch-complete counts") {
    val late = SparkEntry.queries("stream_late_drop")(spark, sfDir)
    val full = Tables.events(spark, sfDir)
      .groupBy(date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:mm")
        .as("window_start"))
      .agg(count(lit(1)).as("n_full"))
    val joined = late.join(full, "window_start")
    assert(joined.count() === late.count(), "every emitted window exists in the log")
    assert(joined.filter(col("n") > col("n_full")).count() === 0)
    // the disordered arrival + trailing watermark must actually drop or
    // hold back SOMETHING, or the gate tests nothing
    val emitted = late.agg(sum(col("n"))).head().getLong(0)
    val total = Tables.events(spark, sfDir).count()
    assert(emitted < total)
  }

  test("stream_backfill_union: the two legs tile the log exactly") {
    val r = SparkEntry.queries("stream_backfill_union")(spark, sfDir).collect()
    assert(r.map(_.getAs[String]("segment")).toSet === Set("backfill", "tail"))
    val total = r.map(_.getAs[Long]("n")).sum
    assert(total === Tables.events(spark, sfDir).count())
    val bypart = r.map(x => x.getAs[String]("segment") -> x).toMap
    assert(bypart("backfill").getAs[String]("last_ts") < "2024-01-20 00:00:00")
    assert(bypart("tail").getAs[String]("first_ts") >= "2024-01-20 00:00:00")
  }

  test("profile_psi: terms are symmetric-positive and zero iff shares tie") {
    val psi = SparkEntry.queries("profile_psi")(spark, sfDir).collect()
    assert(psi.nonEmpty && psi.length <= 10)
    psi.foreach { r =>
      Option(r.getAs[java.lang.Double]("psi_term")).foreach { t =>
        // (p-q)ln(p/q) >= 0 always (both factors share a sign)
        assert(t >= -1e-9, s"bucket ${r.getAs[Long]("bucket")} term $t")
      }
    }
  }

  test("funnelStream: paced stream equals the batch nested-first-occurrence replay") {
    val root = Files.createTempDirectory("r6_funnel").toString
    val cfg = TopicConfig(root, "funnel")
    val records = Tables.events(spark, sfDir).select(
      col("user_id").cast("string").as("partitionKey"),
      col("ts").as("timestamp"), col("props").as("value"))
    PolarLog.produce(records, cfg,
      orderBy = Seq(col("timestamp"), col("value")))
    val conv = StreamAnalytics.funnelStream(
      PolarStream.read(spark, cfg, startingOffsets = "earliest",
        maxRecordsPerTrigger = Some(200L)).toDF(),
      stage = get_json_object(col("value").cast("string"), "$.k").cast("int") % 3,
      stages = Seq("0", "1", "2"))
    val q = conv.writeStream.trigger(Trigger.AvailableNow())
      .option("checkpointLocation", s"$root/ckpt")
      .format("memory").queryName("r6_funnel_out").start()
    q.awaitTermination(120000)
    val got = spark.table("r6_funnel_out")
      .select(col("partitionKey"), col("converted_at"))
      .collect().map(r => (r.getString(0), r.getTimestamp(1))).toSet

    // batch replay: greedy first-match over per-user (ts, props) order
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("props"))
    val e = Tables.events(spark, sfDir)
      .select(col("user_id").cast("string").as("u"), col("ts"),
        (get_json_object(col("props"), "$.k").cast("int") % 3)
          .cast("string").as("st"),
        row_number().over(
          Window.partitionBy(col("user_id")).orderBy(col("ts"), col("props")))
          .as("seq"))
    val s0 = e.filter(col("st") === "0").groupBy(col("u")).agg(min(col("seq")).as("q0"))
    val s1 = e.join(s0, "u").filter(col("st") === "1" && col("seq") > col("q0"))
      .groupBy(col("u")).agg(min(col("seq")).as("q1"))
    val s2 = e.join(s1, "u").filter(col("st") === "2" && col("seq") > col("q1"))
      .groupBy(col("u")).agg(min(col("seq")).as("q2"))
    val expect = e.join(s2, "u").filter(col("seq") === col("q2"))
      .select(col("u"), col("ts"))
      .collect().map(r => (r.getString(0), r.getTimestamp(1))).toSet
    assert(got === expect)
  }
}
