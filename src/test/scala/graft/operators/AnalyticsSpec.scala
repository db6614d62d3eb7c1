package graft.operators

import graft.GraftSession
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Invariants for the warehouse-analytics operators (cohort retention, RFM,
  * SCD2, profiler, PageRank) and the weighted sampler. */
class AnalyticsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private val sfDir = "/root/testdata/sf0.001"

  override def beforeAll(): Unit = {
    spark = GraftSession.builder(master = "local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("cohortRetention: offset-0 cell counts every cohort member exactly once") {
    val ev = graft.Tables.events(spark, sfDir)
    val m = Analytics.cohortRetention(ev, "user_id", "ts")
    val zero = m.filter(col("week_offset") === 0)
      .agg(sum(col("n_users"))).as[Long](spark.implicits.newLongEncoder).head()
    val users = ev.select(col("user_id")).distinct().count()
    // every user is active in their own first week by construction
    assert(zero === users)
    // no cell can exceed its cohort's size
    val cohortSizes = m.filter(col("week_offset") === 0)
      .select(col("cohort_week"), col("n_users").as("size"))
    val bad = m.join(cohortSizes, "cohort_week")
      .filter(col("n_users") > col("size")).count()
    assert(bad === 0)
  }

  test("rfm: scores are quartiles 1..4 and segment matches the digits") {
    val r = Analytics.rfm(graft.Tables.orders(spark, sfDir),
      "o_custkey", "o_orderdate", "o_totalprice")
    assert(r.filter(col("r_score") < 1 || col("r_score") > 4 ||
      col("f_score") < 1 || col("f_score") > 4 ||
      col("m_score") < 1 || col("m_score") > 4).count() === 0)
    assert(r.filter(col("segment") =!=
      concat(col("r_score"), col("f_score"), col("m_score"))).count() === 0)
    // quartile buckets differ by at most 1 in size
    val sizes = r.groupBy(col("m_score")).count()
      .select(col("count")).collect().map(_.getLong(0))
    assert(sizes.max - sizes.min <= 1)
  }

  test("rfmAtScale: broadcast cut-point scores agree with ntile away from boundaries") {
    val spark2 = spark; import spark2.implicits._
    // 16 customers, ranks aligned on all three axes: customer i has the
    // i-th best recency (100-i days), frequency (i+1 orders) and monetary.
    // Distinct values, n divisible by 4 -> ntile tiles are exactly the
    // rank quarters; the only fragile customers are the tile-boundary
    // elements themselves (ranks 4/5, 8/12 edges), which are excluded.
    val rows = (0 until 16).flatMap { i =>
      // last-order dates ascend with i, so the dataset max date is customer
      // 15's and recency_days(i) = 15 - i — distinct, monotone, no anchor
      val last = java.sql.Date.valueOf(
        java.time.LocalDate.of(2026, 1, 1).plusDays(i.toLong))
      // i+1 orders; the last one dated `last`, earlier ones well before;
      // amounts sum to a strictly increasing monetary
      (0 to i).map { j =>
        val d = if (j == i) last
          else java.sql.Date.valueOf("2020-01-01")
        (i.toLong, d, if (j == i) 1000.0 * (i + 1) else 10.0)
      }
    }
    val orders = rows.toDF("cust", "odate", "amount")
    def segs(df: org.apache.spark.sql.DataFrame): Map[Long, String] =
      df.select(col("cust"), col("segment")).collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
    val exact = segs(Analytics.rfm(orders, "cust", "odate", "amount"))
    val scaled = segs(Analytics.rfmAtScale(orders, "cust", "odate", "amount"))
    val boundary = Set(3L, 4L, 7L, 8L, 11L, 12L)
    (0L until 16L).filterNot(boundary).foreach { i =>
      assert(scaled(i) === exact(i), s"customer $i: ${scaled(i)} vs ${exact(i)}")
    }
    // scores are monotone in the aligned rank on every axis
    val sc = Analytics.rfmAtScale(orders, "cust", "odate", "amount")
      .filter(col("cust") < 16).orderBy(col("cust"))
      .select(col("r_score"), col("f_score"), col("m_score")).collect()
    sc.sliding(2).foreach {
      case Array(a, b) =>
        assert(a.getInt(0) <= b.getInt(0) && a.getInt(1) <= b.getInt(1) &&
          a.getInt(2) <= b.getInt(2))
      case _ => ()
    }
    // the plan has NO window exchange: nothing sorts globally
    val plan = Analytics.rfmAtScale(orders, "cust", "odate", "amount")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), "rfmAtScale must not plan a window")
  }

  test("scd2Intervals: intervals tile each user's change history") {
    val iv = Analytics.scd2Intervals(graft.Tables.events(spark, sfDir),
      "user_id", "ts", "event_type", "event_id")
    // exactly one open (current) interval per user
    val perUser = iv.groupBy(col("user_id"))
      .agg(sum(when(col("is_current"), 1).otherwise(0)).as("open"))
    assert(perUser.filter(col("open") =!= 1).count() === 0)
    // no adjacent intervals with the same attribute value (they'd be merged)
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id")).orderBy(col("valid_from"))
    val dup = iv.withColumn("prev", lag(col("event_type"), 1).over(w))
      .filter(col("prev") === col("event_type")).count()
    assert(dup === 0)
    // each closed interval's valid_to equals the next interval's valid_from
    val chain = iv.withColumn("next_from", lead(col("valid_from"), 1).over(w))
      .filter(col("next_from").isNotNull)
      .filter(col("valid_to") =!= col("next_from")).count()
    assert(chain === 0)
  }

  test("profileColumns: counts are exact and min <= max") {
    val li = graft.Tables.lineitem(spark, sfDir)
    val p = Analytics.profileColumns(li, Seq("l_orderkey", "l_quantity", "l_returnflag"))
    val rows = li.count()
    val byCol = p.collect().map(r => r.getString(0) -> r).toMap
    assert(byCol.keySet === Set("l_orderkey", "l_quantity", "l_returnflag"))
    byCol.values.foreach { r =>
      assert(r.getLong(1) === rows)           // n_rows
      assert(r.getLong(2) <= rows)            // n_nonnull
      assert(r.getLong(3) <= r.getLong(2))    // n_distinct <= n_nonnull
    }
    val flag = byCol("l_returnflag")
    assert(flag.getString(4) <= flag.getString(5)) // min_value <= max_value
    val nd = li.select(col("l_returnflag")).distinct().count()
    assert(flag.getLong(3) === nd)
  }

  test("pageRank: ranks are positive and total mass is conserved (~1)") {
    val edges = graft.Tables.supplier(spark, sfDir)
      .filter(col("s_suppkey") > 1)
      .select(col("s_suppkey").cast("long").as("src"),
        expr("CAST(s_suppkey DIV 2 AS BIGINT)").as("dst"))
    val pr = Analytics.pageRank(edges, iterations = 3)
    val ranks = pr.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(ranks.values.forall(_ > 0))
    // dangling redistribution conserves total mass up to quantization loss
    val total = ranks.values.sum
    assert(math.abs(total - 1.0) < 1e-4, s"total=$total")
    val leafMax = ranks.filter { case (k, _) => !ranks.contains(k * 2) }.values.max
    assert(ranks(1L) > leafMax)
  }

  test("pageRank result is invariant under input repartitioning") {
    val edges = graft.Tables.supplier(spark, sfDir)
      .filter(col("s_suppkey") > 1)
      .select(col("s_suppkey").cast("long").as("src"),
        expr("CAST(s_suppkey DIV 2 AS BIGINT)").as("dst"))
    val a = Analytics.pageRank(edges, iterations = 3)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).sortBy(_._1)
    val b = Analytics.pageRank(edges.repartition(7), iterations = 3)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).sortBy(_._1)
    assert(a.sameElements(b))
  }

  test("scd2Stream batch replay matches the batch change-point operator") {
    val sp = spark
    import sp.implicits._
    val df = Seq(
      ("u1", ts("2024-01-01 10:00:00"), "a"),
      ("u1", ts("2024-01-01 10:05:00"), "a"),
      ("u1", ts("2024-01-01 10:10:00"), "b"),
      ("u1", ts("2024-01-01 10:15:00"), "a"),
      ("u2", ts("2024-01-01 09:00:00"), "x"))
      .toDF("partitionKey", "timestamp", "value")
    val changes = graft.streaming.StreamAnalytics
      .scd2Stream(df, attr = col("value"))
      .collect().map(c => (c.partitionKey, c.attr)).sortBy(t => (t._1, t._2))
    // u1: a -> b -> a (3 change points), u2: x
    assert(changes.count(_._1 == "u1") === 3)
    assert(changes.count(_._1 == "u2") === 1)
  }

  test("cmsHeavyHitters: estimates dominate exact counts, top word agrees") {
    val docs = graft.Tables.documents(spark, sfDir)
    val hh = TextAnalysis.cmsHeavyHitters(docs, "text", d = 4, w = 1024, k = 20)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(hh.length === 20)
    hh.foreach { case (w, cnt, est) =>
      assert(est >= cnt, s"CMS must overestimate: $w $est < $cnt")
    }
    val top = TextAnalysis.vocabulary(docs, "text", "doc_id", 1)
      .head().getString(0)
    assert(hh.maxBy(t => (t._2, t._1))._1 === top)
  }

  private def ts(s: String): java.sql.Timestamp = java.sql.Timestamp.valueOf(s)

  test("triangleCounts matches brute-force enumeration and ignores direction/dupes") {
    val sp = spark
    import sp.implicits._
    // K4 on {1,2,3,4} (4 triangles, 3 per node) + pendant 5 + duplicate
    // and reversed edges that must not change counts
    val edges = Seq(
      (1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
      (2L, 1L), (3L, 1L), (1L, 2L), // dupes/reversals
      (4L, 5L))
      .toDF("src", "dst")
    val got = Analytics.triangleCounts(edges)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    assert(got === Array((1L, 3L), (2L, 3L), (3L, 3L), (4L, 3L)))
    // invariant under input repartitioning
    val got2 = Analytics.triangleCounts(edges.repartition(7))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    assert(got2 === got)
  }

  test("dsirLogWeights: target-domain docs score higher on average") {
    val docs = graft.Tables.documents(spark, sfDir)
    val w = Curation.dsirLogWeights(docs, "text", "doc_id", col("lang") === "en")
      .join(docs.select(col("doc_id"), col("lang")), "doc_id")
      .select(col("lang") === "en", col("qsum"))
      .collect().map(r => (r.getBoolean(0), r.getLong(1)))
    val tgtMean = w.filter(_._1).map(_._2.toDouble).sum / w.count(_._1)
    val otherMean = w.filterNot(_._1).map(_._2.toDouble).sum / w.count(!_._1)
    assert(tgtMean > otherMean,
      s"target mean $tgtMean should exceed non-target mean $otherMean")
  }

  test("weightedSample: deterministic, k rows, and biased toward weight") {
    val ord = graft.Tables.orders(spark, sfDir)
    val s1 = Sampling.weightedSample(ord, "o_orderkey", "o_totalprice", k = 50)
      .collect().map(_.getLong(0)).toSeq
    val s2 = Sampling.weightedSample(ord.repartition(13), "o_orderkey", "o_totalprice", k = 50)
      .collect().map(_.getLong(0)).toSeq
    assert(s1 === s2) // pure function of keys, not of layout
    assert(s1.size === 50)
    // weighted sample's mean weight should exceed the population mean
    val sampled = ord.filter(col("o_orderkey").isin(s1: _*))
      .agg(avg(col("o_totalprice"))).head().getDouble(0)
    val popMean = ord.agg(avg(col("o_totalprice"))).head().getDouble(0)
    assert(sampled > popMean)
  }
}
