package graft.sources

import graft.GraftSession
import graft.log.{PolarLog, TopicConfig}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import java.nio.file.Files

/** Filter pushdown on the DSv2 batch scan: offset windows and partition
  * sets prune files at plan time (the reference's sparse-index seek). */
class PolarPushdownSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private var cfg: TopicConfig = _

  override def beforeAll(): Unit = {
    spark = GraftSession.builder(master = "local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val root = Files.createTempDirectory("polar_pushdown").toString
    cfg = TopicConfig(root, "events")
    PolarLog.produce(graft.Tables.events(spark, "/root/testdata/sf0.001").select(
      col("user_id").cast("string").as("partitionKey"),
      col("ts").as("timestamp"), col("props").as("value")), cfg)
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def read: DataFrame = spark.read.format("polar")
    .option("root", cfg.root).option("topic", cfg.topic).load()

  test("offset and part filters prune at plan time, results exact") {
    val filtered = read.filter(col("offset") >= 3 && col("offset") < 10 && col("part") === 5)
    val expected = PolarLog.consume(spark, cfg)
      .filter(col("offset") >= 3 && col("offset") < 10 && col("part") === 5)
      .select(col("offset")).collect().map(_.getLong(0)).sorted
    val got = filtered.select(col("offset")).collect().map(_.getLong(0)).sorted
    assert(got.toSeq === expected.toSeq)
    assert(got.nonEmpty)
    // plan-time evidence: the scan description carries the accepted bounds
    val plan = filtered.queryExecution.executedPlan.toString
    assert(plan.contains("offsets=[3,10)") && plan.contains("parts=Set(5)"), plan)
  }

  test("partitionKey equality prunes to the owning partition via placement") {
    import graft.functions.{Murmur3, TokenMath}
    val key = PolarLog.consume(spark, cfg)
      .select(col("partitionKey")).filter(col("partitionKey").isNotNull)
      .first().getString(0)
    val owner = TokenMath.partitionForToken(
      Murmur3.hashString(key), cfg.clusterSize, cfg.rangesPerToken)
    val filtered = read.filter(col("partitionKey") === key)
    val plan = filtered.queryExecution.executedPlan.toString
    assert(plan.contains(s"parts=Set($owner)"), plan)
    // exact: the residual re-applies the predicate, so only that key's rows
    val got = filtered.select(col("offset")).collect().map(_.getLong(0)).sorted
    val expected = PolarLog.consume(spark, cfg)
      .filter(col("partitionKey") === key)
      .select(col("offset")).collect().map(_.getLong(0)).sorted
    assert(got.nonEmpty && got.toSeq === expected.toSeq)
    // IN over two keys plans the union of their owners; results exact
    val key2 = PolarLog.consume(spark, cfg)
      .select(col("partitionKey")).filter(col("partitionKey").isNotNull)
      .distinct().orderBy(col("partitionKey").desc).first().getString(0)
    val owners = Set(key, key2).map(k => TokenMath.partitionForToken(
      Murmur3.hashString(k), cfg.clusterSize, cfg.rangesPerToken))
    val in = read.filter(col("partitionKey").isin(key, key2))
    val inPlan = in.queryExecution.executedPlan.toString
    owners.foreach(p => assert(inPlan.contains(p.toString), inPlan))
    val gotIn = in.count()
    val expIn = PolarLog.consume(spark, cfg)
      .filter(col("partitionKey").isin(key, key2)).count()
    assert(gotIn === expIn && gotIn > 0)
  }

  test("scan reports exact registry statistics; filters narrow them") {
    import org.apache.spark.sql.util.CaseInsensitiveStringMap
    val opts = new CaseInsensitiveStringMap(
      java.util.Map.of("root", cfg.root, "topic", cfg.topic))
    def statsFor(bounds: PolarScanBounds) = {
      val scan = new PolarScan(PolarSource.configFrom(
        Map("root" -> cfg.root, "topic" -> cfg.topic)), bounds)
      scan.estimateStatistics()
    }
    val total = PolarLog.consume(spark, cfg).count()
    val full = statsFor(PolarScanBounds())
    assert(full.numRows().getAsLong === total)
    assert(full.sizeInBytes().getAsLong > 0)
    // an offset window narrows rows EXACTLY (offsets are dense)
    val windowed = statsFor(PolarScanBounds(minOffset = 2, maxOffsetExclusive = 5))
    val expect = PolarLog.consume(spark, cfg)
      .filter(col("offset") >= 2 && col("offset") < 5).count()
    assert(windowed.numRows().getAsLong === expect)
    assert(windowed.sizeInBytes().getAsLong < full.sizeInBytes().getAsLong)
    // a partition set narrows to that partition's rows
    val onePart = statsFor(PolarScanBounds(parts = Some(Set(5))))
    val expectP = PolarLog.consume(spark, cfg).filter(col("part") === 5).count()
    assert(onePart.numRows().getAsLong === expectP)
    // and Catalyst actually consumes them: a join against the tiny topic
    // plans the polar side as the BROADCAST build side
    val dim = read.select(col("partitionKey"), col("offset"))
    val fact = spark.range(100000L)
      .select((col("id") % 50).cast("string").as("partitionKey"), col("id"))
    val joined = fact.join(dim, Seq("partitionKey"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"),
      plan)
  }

  test("storage-partitioned read: part-keyed aggregation plans no exchange") {
    val agg = read.groupBy(col("part")).count()
    val plan = agg.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
    val got = agg.collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val exp = PolarLog.consume(spark, cfg).groupBy(col("part")).count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(got === exp && got.values.sum === 1000L)
  }

  test("co-partitioned topic join on (part, key) plans no shuffle under the join") {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val a = read.select(col("part"), col("partitionKey"), col("offset"))
      val b = read.select(col("part"), col("partitionKey"),
        col("offset").as("o2"))
      val j = a.join(b, Seq("part", "partitionKey"))
      val plan = j.queryExecution.executedPlan.toString
      val joinAt = plan.indexOf("SortMergeJoin")
      assert(joinAt >= 0, plan)
      // everything below the join node is its children: both legs must be
      // bare scans (storage-partitioned join), not exchanges
      assert(!plan.substring(joinAt).contains("Exchange"), plan)
      val expect = PolarLog.consume(spark, cfg)
        .groupBy("partitionKey").count()
        .collect().map(r => r.getLong(1) * r.getLong(1)).sum
      assert(j.count() === expect)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("LIMIT pushdown caps planned rows per partition; residuals block it") {
    val limited = read.limit(5)
    val plan = limited.queryExecution.executedPlan.toString
    assert(plan.contains("limit=5"), plan)
    assert(limited.count() === 5)
    assert(limited.collect().length === 5)
    // a residual predicate under the Limit must block the push (Spark-side
    // contract) — otherwise the filter could starve the limit
    val guarded = read.filter(col("partitionKey").isNotNull).limit(5)
    val gplan = guarded.queryExecution.executedPlan.toString
    assert(!gplan.contains("limit=5"), gplan)
    assert(guarded.count() === 5)
    // the capped scan's exact stats are bounded by limit × partitions
    val capped = new PolarScan(PolarSource.configFrom(
      Map("root" -> cfg.root, "topic" -> cfg.topic)),
      PolarScanBounds(limit = Some(5)))
    assert(capped.estimateStatistics().numRows().getAsLong <=
      5L * cfg.numPartitions)
  }

  test("LIMIT pushdown anchors at the actual window start, not offset 0") {
    // retention-trimmed topic: surviving segments start past offset 0, so a
    // cap at minOffset+limit (= limit) would fall below every window and
    // plan ZERO rows — the r8 ADVICE defect
    val root2 = Files.createTempDirectory("polar_limit_trim").toString
    val cfg2 = TopicConfig(root2, "trimmed")
    def recs(lo: Int, hi: Int) =
      graft.Tables.events(spark, "/root/testdata/sf0.001")
        .filter(col("event_id") >= lo && col("event_id") < hi)
        .select(col("user_id").cast("string").as("partitionKey"),
          col("ts").as("timestamp"), col("props").as("value"))
    PolarLog.produce(recs(0, 500), cfg2)
    Thread.sleep(30)
    val mid = System.currentTimeMillis()
    Thread.sleep(30)
    PolarLog.produce(recs(500, 1000), cfg2)
    val now = System.currentTimeMillis()
    val trimmed = PolarLog.cleanRetention(cfg2, retentionMs = now - mid, nowMs = now)
    assert(trimmed > 0)
    val r2 = spark.read.format("polar")
      .option("root", cfg2.root).option("topic", cfg2.topic).load()
    val survivors = r2.count()
    assert(survivors > 5)
    assert(r2.limit(5).collect().length === 5)
    // stats stay consistent with the per-partition anchor (> 0 rows)
    val capped = new PolarScan(PolarSource.configFrom(
      Map("root" -> cfg2.root, "topic" -> cfg2.topic)),
      PolarScanBounds(limit = Some(5)))
    val n = capped.estimateStatistics().numRows().getAsLong
    assert(n > 0 && n <= 5L * cfg2.numPartitions)

    // change-feed LIMIT: windows start at the from-version tails, far from 0
    val meta = graft.log.LogMetadata.read(cfg2)
    PolarLog.produce(recs(0, 200), cfg2)
    val feed = spark.read.format("polar")
      .option("root", cfg2.root).option("topic", cfg2.topic)
      .option("startingVersion", meta.version.toString).load()
    assert(feed.count() === 200)
    assert(feed.limit(5).collect().length === 5)
  }

  test("multi-topic scans report unknown partitioning (duplicate part keys)") {
    val root2 = Files.createTempDirectory("polar_spj_multi").toString
    val a = TopicConfig(root2, "ta")
    val b = TopicConfig(root2, "tb")
    def recs = graft.Tables.events(spark, "/root/testdata/sf0.001").limit(50)
      .select(col("user_id").cast("string").as("partitionKey"),
        col("ts").as("timestamp"), col("props").as("value"))
    PolarLog.produce(recs, a)
    PolarLog.produce(recs, b)
    val scan = new PolarScan(PolarSource.configFrom(
      Map("root" -> root2, "topics" -> "ta,tb")))
    assert(scan.outputPartitioning().isInstanceOf[
      org.apache.spark.sql.connector.read.partitioning.UnknownPartitioning])
    // single-topic scans keep the key-grouped claim (SPJ gate regime)
    val one = new PolarScan(PolarSource.configFrom(
      Map("root" -> root2, "topic" -> "ta")))
    assert(one.outputPartitioning().isInstanceOf[
      org.apache.spark.sql.connector.read.partitioning.KeyGroupedPartitioning])
  }

  test("runtime filters narrow the planned partitions (DPP contract)") {
    import org.apache.spark.sql.sources.{EqualTo, In}
    import graft.functions.{Murmur3, TokenMath}
    def scan() = new PolarScan(PolarSource.configFrom(
      Map("root" -> cfg.root, "topic" -> cfg.topic)))
    val all = scan().toBatch.planInputPartitions().length
    // runtime IN on partitionKey → placement-mapped partition prune
    val s1 = scan()
    s1.filter(Array[org.apache.spark.sql.sources.Filter](
      In("partitionKey", Array[Any]("1", "2"))))
    val owners = Set("1", "2").map(k => TokenMath.partitionForToken(
      Murmur3.hashString(k), cfg.clusterSize, cfg.rangesPerToken))
    assert(s1.description().contains(owners.toString.replace("HashSet", "Set")) ||
      owners.forall(p => s1.description().contains(p.toString)))
    val p1 = s1.toBatch.planInputPartitions().length
    assert(p1 < all && p1 > 0)
    // runtime EqualTo on part intersects directly
    val s2 = scan()
    s2.filter(Array[org.apache.spark.sql.sources.Filter](
      EqualTo("part", Integer.valueOf(5))))
    assert(s2.toBatch.planInputPartitions().length <= all)
    assert(s2.description().contains("parts=Set(5)"), s2.description())
    // unknown runtime predicates are ignored (best-effort contract)
    val s3 = scan()
    s3.filter(Array[org.apache.spark.sql.sources.Filter](EqualTo("value", "x")))
    assert(s3.toBatch.planInputPartitions().length === all)
    // stats narrow with the runtime filter too (AQE sees the pruned size)
    val full = scan().estimateStatistics().numRows().getAsLong
    assert(s1.estimateStatistics().numRows().getAsLong < full)
  }

  test("explicit batch windows: exact mid-file trim, unsound pushes refuse") {
    val df = spark.read.format("polar")
      .option("root", cfg.root).option("topic", cfg.topic)
      .option("startingOffsets", """{"5": 1}""").load()
    val full = PolarLog.consume(spark, cfg).count()
    val p5 = PolarLog.consume(spark, cfg).filter(col("part") === 5).count()
    assert(p5 >= 2, "fixture needs rows in part 5")
    // exactly one row (part 5, offset 0) is cut; unnamed partitions default
    // to the full window — and count() must NOT be answered from registry
    // stats (the aggregate push is refused under explicit windows)
    assert(df.count() === full - 1)
    val aggPlan = df.groupBy().agg(count(lit(1)))
      .queryExecution.executedPlan.toString
    assert(!aggPlan.contains("PolarAggScan"), aggPlan)
    // ts-ordered top-N refuses (the cut counts whole files, the window
    // does not); offset-ordered stays window-anchored and is offered
    val tsPlan = df.orderBy(col("timestamp").desc).limit(3)
      .queryExecution.executedPlan.toString
    assert(!tsPlan.contains("topn=3 by timestamp"), tsPlan)
    val offPlan = df.orderBy(col("offset")).limit(3)
      .queryExecution.executedPlan.toString
    assert(offPlan.contains("topn=3 by offset"), offPlan)
    // a stream refuses the batch-only endingOffsets loudly
    val e = intercept[UnsupportedOperationException](
      new PolarScan(PolarSource.configFrom(Map(
        "root" -> cfg.root, "topic" -> cfg.topic,
        "endingOffsets" -> """{"0": 4}""")))
        .toMicroBatchStream(Files.createTempDirectory("bo_ck").toString))
    assert(e.getMessage.contains("endingOffsets"), e.getMessage)
  }

  test("scan custom metrics: files and rows planned, from registry arithmetic") {
    val scan = new PolarScan(PolarSource.configFrom(
      Map("root" -> cfg.root, "topic" -> cfg.topic)))
    assert(scan.supportedCustomMetrics().map(_.name()).toSet ===
      Set("polarFilesPlanned", "polarRowsPlanned", "polarRowsDecoded"))
    val batch = scan.toBatch
    val parts = batch.planInputPartitions()
    val factory = batch.createReaderFactory()
    val vals = parts.map { ip =>
      val r = factory.createColumnarReader(ip)
      val m = r.currentMetricsValues().map(x => x.name() -> x.value()).toMap
      r.close()
      m
    }
    // planned rows over all splits == the topic's record count (offsets
    // dense, full window); at least one file per planned split
    assert(vals.map(_("polarRowsPlanned")).sum === 1000L)
    assert(vals.forall(_("polarFilesPlanned") >= 1L))
  }

  test("timestamp window prunes whole segments from registry ts stats") {
    // a second topic written in two produces with DISJOINT time ranges →
    // per partition, distinct segments with distinct [tsMin, tsMax]
    val root2 = Files.createTempDirectory("polar_ts_prune").toString
    val cfg2 = TopicConfig(root2, "tsev")
    def recs(lo: Int, hi: Int) =
      graft.Tables.events(spark, "/root/testdata/sf0.001")
        .filter(col("event_id") >= lo && col("event_id") < hi)
        .select(col("user_id").cast("string").as("partitionKey"),
          // synthetic, widely separated event times keyed off event_id
          timestamp_seconds(col("event_id") * 60 +
            (if (lo == 0) 0 else 10000000)).as("timestamp"),
          col("props").as("value"))
    PolarLog.produce(recs(0, 500), cfg2)   // epoch + minutes
    PolarLog.produce(recs(500, 1000), cfg2) // ~epoch + 115 days
    val r2 = spark.read.format("polar")
      .option("root", cfg2.root).option("topic", cfg2.topic).load()

    // window covering only the FIRST produce
    val cut = java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(5000000L))
    val early = r2.filter(col("timestamp") < cut)
    val expected = PolarLog.consume(spark, cfg2).filter(col("timestamp") < cut)
      .count()
    assert(early.count() === expected && expected > 0)
    // plan-time evidence: the ts window reached the scan, and the planned
    // file set is strictly smaller than the full scan's
    val plan = early.queryExecution.executedPlan.toString
    assert(plan.contains("ts=[-9223372036854775808,4999999999999]"), plan)
    def plannedFiles(df: DataFrame): Int = {
      val scan = df.queryExecution.executedPlan.collectLeaves().collectFirst {
        case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b
      }.get
      scan.batch.planInputPartitions()
        .map(PolarInputPartition.unwrap(_).files.size).sum
    }
    val prunedCount = plannedFiles(early)
    val fullCount = plannedFiles(r2)
    assert(prunedCount > 0 && prunedCount < fullCount,
      s"pruned=$prunedCount full=$fullCount")
  }

  test("aggregate pushdown: count/min/max answered from the registry, zero file I/O") {
    val agg = read.agg(
      count(lit(1)).as("n"),
      min(col("offset")).as("min_o"), max(col("offset")).as("max_o"),
      min(col("timestamp")).as("min_ts"), max(col("timestamp")).as("max_ts"))
    val plan = agg.queryExecution.executedPlan.toString
    assert(plan.contains("PolarAggScan"), plan)
    val row = agg.collect().head
    val exp = PolarLog.consume(spark, cfg).agg(
      count(lit(1)), min(col("offset")), max(col("offset")),
      min(col("timestamp")), max(col("timestamp"))).collect().head
    assert(row.toSeq === exp.toSeq)
    // GROUP BY part: one registry-derived row per partition (ops view)
    val perPart = read.groupBy(col("part")).agg(count(lit(1)).as("n"),
      max(col("offset")).as("mx"))
    assert(perPart.queryExecution.executedPlan.toString.contains("PolarAggScan"),
      perPart.queryExecution.executedPlan.toString)
    val gotP = perPart.collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).sorted
    val expP = PolarLog.consume(spark, cfg).groupBy(col("part"))
      .agg(count(lit(1)), max(col("offset")))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).sorted
    assert(gotP.toSeq === expP.toSeq)
    // a filter blocks the push (residual contract) — values stay exact
    val filtered = read.filter(col("part") === 5).agg(count(lit(1)).as("n"))
    assert(!filtered.queryExecution.executedPlan.toString.contains("PolarAggScan"))
    assert(filtered.collect().head.getLong(0) ===
      PolarLog.consume(spark, cfg).filter(col("part") === 5).count())
    // retention-trimmed topic: COUNT(*) counts READABLE rows, min(offset)
    // starts at the surviving segments
    val root2 = Files.createTempDirectory("polar_agg_trim").toString
    val cfg2 = TopicConfig(root2, "aggtrim")
    def recs(lo: Int, hi: Int) =
      graft.Tables.events(spark, "/root/testdata/sf0.001")
        .filter(col("event_id") >= lo && col("event_id") < hi)
        .select(col("user_id").cast("string").as("partitionKey"),
          col("ts").as("timestamp"), col("props").as("value"))
    PolarLog.produce(recs(0, 500), cfg2)
    Thread.sleep(30)
    val mid = System.currentTimeMillis()
    Thread.sleep(30)
    PolarLog.produce(recs(500, 1000), cfg2)
    PolarLog.cleanRetention(cfg2, retentionMs = System.currentTimeMillis() - mid)
    val r2 = spark.read.format("polar")
      .option("root", root2).option("topic", "aggtrim").load()
    val a2 = r2.agg(count(lit(1)).as("n"), min(col("offset")).as("mo"))
    assert(a2.queryExecution.executedPlan.toString.contains("PolarAggScan"))
    val got2 = a2.collect().head
    val exp2 = PolarLog.consume(spark, cfg2)
      .agg(count(lit(1)), min(col("offset"))).collect().head
    assert(got2.toSeq === exp2.toSeq)
    assert(got2.getLong(0) === 500L)
  }

  test("TOP-N pushdown: offset order plans head/tail windows, ts order prunes files") {
    // offset DESC with a unique tie-break — "latest n records": each
    // partition plans only its last 7 offsets
    val tail7 = read.orderBy(col("offset").desc, col("part")).limit(7)
    val plan7 = tail7.queryExecution.executedPlan.toString
    assert(plan7.contains("topn=7 by offset desc"), plan7)
    val gotTail = tail7.select("offset", "part").collect()
      .map(r => (r.getLong(0), r.getInt(1))).toSeq
    val expTail = PolarLog.consume(spark, cfg)
      .orderBy(col("offset").desc, col("part")).limit(7)
      .select("offset", "part").collect()
      .map(r => (r.getLong(0), r.getInt(1))).toSeq
    assert(gotTail === expTail && gotTail.size === 7)
    // planned rows are bounded by n × partitions (stats == plan)
    val bounded = new PolarScan(PolarSource.configFrom(
      Map("root" -> cfg.root, "topic" -> cfg.topic)),
      PolarScanBounds(topN = Some(PolarTopN(byTimestamp = false, desc = true, n = 7))))
    assert(bounded.estimateStatistics().numRows().getAsLong <=
      7L * cfg.numPartitions)
    // offset ASC mirrors (head window)
    val head5 = read.orderBy(col("offset"), col("part")).limit(5)
    assert(head5.queryExecution.executedPlan.toString.contains("topn=5 by offset, "))
    assert(head5.select("offset").collect().map(_.getLong(0)).forall(_ < 5))

    // timestamp order: three ts-disjoint produces → per-partition files
    // with disjoint ts ranges; top-n by ts desc must never plan the old
    // slices
    val root3 = Files.createTempDirectory("polar_topn_ts").toString
    val cfg3 = TopicConfig(root3, "tsorder")
    def slice(lo: String, hi: String) =
      graft.Tables.events(spark, "/root/testdata/sf0.001")
        .filter(col("ts") >= lit(lo).cast("timestamp") &&
          col("ts") < lit(hi).cast("timestamp"))
        .select(col("user_id").cast("string").as("partitionKey"),
          col("ts").as("timestamp"), col("props").as("value"))
    PolarLog.produce(slice("2000-01-01", "2024-01-10"), cfg3)
    PolarLog.produce(slice("2024-01-10", "2024-01-20"), cfg3)
    PolarLog.produce(slice("2024-01-20", "2100-01-01"), cfg3)
    val read3 = spark.read.format("polar")
      .option("root", root3).option("topic", "tsorder").load()
    val top = read3.orderBy(col("timestamp").desc, col("part"), col("offset"))
      .limit(5)
    val planT = top.queryExecution.executedPlan.toString
    assert(planT.contains("topn=5 by timestamp desc"), planT)
    val gotT = top.select("timestamp", "part", "offset").collect()
      .map(r => (r.getTimestamp(0), r.getInt(1), r.getLong(2))).toSeq
    val expT = PolarLog.consume(spark, cfg3)
      .orderBy(col("timestamp").desc, col("part"), col("offset")).limit(5)
      .select("timestamp", "part", "offset").collect()
      .map(r => (r.getTimestamp(0), r.getInt(1), r.getLong(2))).toSeq
    assert(gotT === expT && gotT.size === 5)
    // pruning evidence: the ts cut plans strictly fewer files than the log
    // holds (the two older slices are wholly past the cut)
    val meta3 = graft.log.LogMetadata.read(cfg3)
    val totalFiles = meta3.filesByPart.valuesIterator.map(_.size).sum
    val scanT = new PolarScan(PolarSource.configFrom(
      Map("root" -> root3, "topic" -> "tsorder")),
      PolarScanBounds(topN = Some(PolarTopN(byTimestamp = true, desc = true, n = 5))))
    val plannedFiles = scanT.toBatch.planInputPartitions()
      .map(_.asInstanceOf[PolarInputPartition].files.size).sum
    assert(plannedFiles < totalFiles,
      s"planned=$plannedFiles total=$totalFiles")
    // ASC mirrors: earliest-n plans only the oldest slice's side of the cut
    val bot = read3.orderBy(col("timestamp"), col("part"), col("offset")).limit(5)
    assert(bot.queryExecution.executedPlan.toString
      .contains("topn=5 by timestamp, "))
    val gotB = bot.select("offset", "part").collect()
      .map(r => (r.getLong(0), r.getInt(1))).toSeq
    val expB = PolarLog.consume(spark, cfg3)
      .orderBy(col("timestamp"), col("part"), col("offset")).limit(5)
      .select("offset", "part").collect()
      .map(r => (r.getLong(0), r.getInt(1))).toSeq
    assert(gotB === expB)

    // a topic holding NULL timestamps REFUSES the ts push (nulls live
    // outside the stats range) — values stay exact via the plain TakeOrdered
    val root4 = Files.createTempDirectory("polar_topn_null").toString
    val cfg4 = TopicConfig(root4, "nullts")
    PolarLog.produce(
      graft.Tables.events(spark, "/root/testdata/sf0.001")
        .select(col("user_id").cast("string").as("partitionKey"),
          when(col("event_id") % 10 === 0, lit(null))
            .otherwise(col("ts")).cast("timestamp").as("timestamp"),
          col("props").as("value")), cfg4)
    val read4 = spark.read.format("polar")
      .option("root", root4).option("topic", "nullts").load()
    val top4 = read4.orderBy(col("timestamp").desc, col("part"), col("offset"))
      .limit(5)
    val plan4 = top4.queryExecution.executedPlan.toString
    assert(!plan4.contains("topn="), plan4)
    val got4 = top4.select("part", "offset").collect()
      .map(r => (r.getInt(0), r.getLong(1))).toSeq
    val exp4 = PolarLog.consume(spark, cfg4)
      .orderBy(col("timestamp").desc, col("part"), col("offset")).limit(5)
      .select("part", "offset").collect()
      .map(r => (r.getInt(0), r.getLong(1))).toSeq
    assert(got4 === exp4)
    // …but the offset ordering still pushes there (offsets are never null)
    assert(read4.orderBy(col("offset").desc, col("part")).limit(3)
      .queryExecution.executedPlan.toString.contains("topn=3 by offset desc"))
  }

  test("contradictory bounds plan an empty scan") {
    assert(read.filter(col("offset") >= 100000 && col("offset") < 5).count() === 0)
  }

  test("minPartitions fans partitions out file-granularly, exact and claim-free") {
    val root5 = Files.createTempDirectory("polar_fanout").toString
    val cfg5 = TopicConfig(root5, "fanout")
    def recs(lo: Int, hi: Int) =
      graft.Tables.events(spark, "/root/testdata/sf0.001")
        .filter(col("event_id") >= lo && col("event_id") < hi)
        .select(col("user_id").cast("string").as("partitionKey"),
          col("ts").as("timestamp"), col("props").as("value"))
    PolarLog.produce(recs(0, 333), cfg5)
    PolarLog.produce(recs(333, 666), cfg5)
    PolarLog.produce(recs(666, 1000), cfg5)
    def readFan(opts: (String, String)*) = {
      val r = spark.read.format("polar")
        .option("root", root5).option("topic", "fanout")
      opts.foreach { case (k, v) => r.option(k, v) }
      r.load()
    }
    val plain = readFan()
    val basePartitions = plain.rdd.getNumPartitions
    val totalFiles = graft.log.LogMetadata.read(cfg5)
      .filesByPart.valuesIterator.map(_.size).sum
    assert(totalFiles > basePartitions) // 3 commits → ~3 files per partition
    val target = math.min(totalFiles, basePartitions * 2)
    val fan = readFan("minPartitions" -> target.toString)
    assert(fan.rdd.getNumPartitions >= target,
      s"planned ${fan.rdd.getNumPartitions}, wanted >= $target (files=$totalFiles)")
    // exact: every row exactly once (file-granular split = no straddling)
    def sig(df: org.apache.spark.sql.DataFrame) =
      df.select(col("part"), col("offset")).collect()
        .map(r => (r.getInt(0), r.getLong(1))).sorted.toSeq
    assert(sig(fan) === sig(plain) && sig(fan).nonEmpty)
    // offset filters still prune within the fanned splits
    assert(readFan("minPartitions" -> target.toString)
      .filter(col("offset") >= 1 && col("offset") < 3).count() ===
      plain.filter(col("offset") >= 1 && col("offset") < 3).count())
    // the trade: the one-split-per-part claim is dropped, so a part-keyed
    // aggregation pays an exchange instead of mis-grouping sub-splits
    val agg = fan.groupBy(col("part"))
      .agg(countDistinct(col("partitionKey")).as("u"))
    assert(agg.queryExecution.executedPlan.toString.contains("Exchange"),
      agg.queryExecution.executedPlan.toString)
    val exp = plain.groupBy(col("part"))
      .agg(countDistinct(col("partitionKey")).as("u"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).toMap
    assert(agg.collect().map(r => (r.getInt(0), r.getLong(1))).toMap === exp)
  }

  test("reported (part, offset) ordering: per-partition log window plans no Sort") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.execution.SortExec
    // a split IS one log partition read in offset order, and the scan
    // REPORTS that — so sessionization-style windows over
    // (PARTITION BY part ORDER BY offset) need neither exchange (SPJ
    // clustering) nor sort (reported ordering)
    val w = Window.partitionBy("part").orderBy("offset")
    val df = read.select(col("part"), col("offset"), col("partitionKey"))
      .withColumn("prev_key", lag(col("partitionKey"), 1).over(w))
    val sorts = df.queryExecution.executedPlan.collect { case s: SortExec => s }
    assert(sorts.isEmpty,
      s"expected no SortExec, got:\n${df.queryExecution.executedPlan}")
    // values exact vs the same window computed the ordinary way
    val exp = PolarLog.consume(spark, cfg)
      .select(col("part"), col("offset"), col("partitionKey"))
      .withColumn("prev_key", lag(col("partitionKey"), 1).over(w))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getString(2),
        Option(r.getString(3)))).sortBy(t => (t._1, t._2))
    val got = df.collect().map(r => (r.getInt(0), r.getLong(1), r.getString(2),
      Option(r.getString(3)))).sortBy(t => (t._1, t._2))
    assert(got.toSeq === exp.toSeq && got.nonEmpty)
  }

  test("unfiltered scan == consume (no pruning regressions)") {
    assert(read.count() === PolarLog.consume(spark, cfg).count())
  }

  test("column pruning: projection reaches the scan, values intact") {
    val df = read.select(col("value"), col("offset")).filter(col("part") === 5)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("ReadSchema=offset,value"), plan)
    val viaConsume = PolarLog.consume(spark, cfg).filter(col("part") === 5)
      .select(col("value").cast("string"), col("offset"))
      .collect().map(r => (r.getString(0), r.getLong(1))).sorted
    val got = df.select(col("value").cast("string"), col("offset"))
      .collect().map(r => (r.getString(0), r.getLong(1))).sorted
    assert(got.toSeq === viaConsume.toSeq)
  }
}
