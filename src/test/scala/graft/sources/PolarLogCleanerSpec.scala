package graft.sources

import graft.GraftSession
import graft.log.{LogMetadata, PolarLog, RetentionScheduler, TopicConfig, TopicProps}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** The log cleaner (Kafka cleanup.policy=compact physical cleaning):
  * latest-per-key rewrite with preserved offsets, tombstone lifecycle,
  * scheduler integration, and sparse-file planner correctness. */
class PolarLogCleanerSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private var root: String = _

  override def beforeAll(): Unit = {
    spark = GraftSession.builder(master = "local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    root = Files.createTempDirectory("polar_cleaner_spec").toString
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def produceKeyed(cfg: TopicConfig, tag: String,
      keys: Seq[Int], tombstones: Set[Int] = Set.empty): Unit = {
    val spark2 = spark; import spark2.implicits._
    PolarLog.produce(
      keys.map(k => (k.toString,
        if (tombstones(k)) null else s"$tag:$k")).toDF("partitionKey", "v")
        .selectExpr("partitionKey", "current_timestamp() AS timestamp",
          "CAST(v AS BINARY) AS value"),
      cfg)
  }

  private def compacted(cfg: TopicConfig): Map[String, String] =
    PolarLog.consumeCompacted(spark, cfg)
      .selectExpr("partitionKey", "CAST(value AS STRING)")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap

  test("dropTombstones expires delete markers from the clean region") {
    val cfg = TopicConfig(root, "kc_tomb")
    produceKeyed(cfg, "v1", 0 until 40)
    produceKeyed(cfg, "v2", 0 until 40, tombstones = (0 until 40 by 4).toSet)
    produceKeyed(cfg, "seal", 1000 until 1200) // wide: every partition gets a head file
    val removed = PolarLogCleaner.cleanKeys(spark, cfg, dropTombstones = true)
    // v1 drops for all 40 keys; the 10 tombstones drop too
    assert(removed === 50L)
    val raw = PolarLog.consume(spark, cfg)
    assert(raw.filter(col("value").isNull).count() === 0L,
      "expired tombstones must leave the raw log")
    // the view: non-tombstoned keys keep v2, tombstoned keys are gone
    val view = compacted(cfg)
    assert(view("1") === "v2:1" && !view.contains("0"))
  }

  test("SQL procedure + scheduler clean compact-policy topics on new commits only") {
    val cfg = TopicConfig(root, "kc_auto")
    produceKeyed(cfg, "v1", 0 until 30)
    produceKeyed(cfg, "v2", 0 until 30)
    produceKeyed(cfg, "seal", 2000 until 2200)
    LogMetadata.compareAndSet(cfg, LogMetadata.read(cfg))(m =>
      m.copy(props = Map(TopicProps.CleanupPolicy -> "compact")))
    val viewBefore = compacted(cfg)
    var cleanerCalls = 0
    val sched = new RetentionScheduler(root, retentionMs = 1L,
      keyCleaner = Some { c =>
        cleanerCalls += 1
        PolarLogCleaner.cleanKeys(spark, c)
      })
    sched.sweep()
    // compact policy: exempt from the 1 ms retention window, cleaned once
    assert(PolarLog.consume(spark, cfg).count() > 0,
      "compact policy must exempt the topic from time retention")
    val callsAfterFirst = cleanerCalls
    assert(callsAfterFirst >= 1)
    assert(compacted(cfg) === viewBefore, "cleaning must not change the view")
    // idle sweep: version unchanged -> the cleaner is NOT re-run
    sched.sweep()
    assert(cleanerCalls === callsAfterFirst,
      "an idle topic must not be re-read every sweep")
    // a new commit re-arms the cleaner
    produceKeyed(cfg, "v3", 0 until 30)
    sched.sweep()
    assert(cleanerCalls === callsAfterFirst + 1)
    // the SQL face reports the removed count
    spark.conf.set("spark.sql.catalog.polar_kc",
      classOf[PolarCatalog].getName)
    spark.conf.set("spark.sql.catalog.polar_kc.root", root)
    val viaSql = spark.sql(
      "CALL polar_kc.system.clean_keys(topic => 'kc_auto')").head().getLong(0)
    assert(viaSql >= 0L)
  }

  test("dirty-ratio guard: a mostly-clean region is not re-read every commit") {
    val cfg = TopicConfig(root, "kc_ratio")
    produceKeyed(cfg, "v1", 0 until 50)
    produceKeyed(cfg, "v2", 0 until 50)
    produceKeyed(cfg, "seal", 5000 until 5200)
    LogMetadata.compareAndSet(cfg, LogMetadata.read(cfg))(m =>
      m.copy(props = Map(TopicProps.CleanupPolicy -> "compact")))
    // before any clean: the whole region is dirty
    assert(PolarLogCleaner.dirtyRatio(LogMetadata.read(cfg)) === 1.0)
    var calls = 0
    val sched = new RetentionScheduler(root, retentionMs = 7L * 24 * 3600 * 1000,
      keyCleaner = Some { c => calls += 1; PolarLogCleaner.cleanKeys(spark, c) },
      dirtyRatioOf = Some(PolarLogCleaner.dirtyRatio))
    sched.sweep()
    assert(calls === 1)
    // post-clean the region is kc-dominated; one tiny produce rolls the
    // old head into the region, but dirty/total stays far below 0.5 —
    // the guard skips even though the version advanced
    produceKeyed(cfg, "v3", 0 until 2)
    val ratio = PolarLogCleaner.dirtyRatio(LogMetadata.read(cfg))
    assert(ratio > 0.0 && ratio < 0.5, s"ratio $ratio")
    sched.sweep()
    assert(calls === 1, "a mostly-clean region must not be re-read")
    // churn past the threshold re-arms the cleaner
    produceKeyed(cfg, "v4", 0 until 50)
    produceKeyed(cfg, "v5", 0 until 50)
    produceKeyed(cfg, "v6", 0 until 50)
    assert(PolarLogCleaner.dirtyRatio(LogMetadata.read(cfg)) >= 0.5)
    sched.sweep()
    assert(calls === 2)
  }

  test("key-churn property: after any produce/clean interleaving the view is latest-per-key") {
    val cfg = TopicConfig(root, "kc_churn")
    val rnd = new scala.util.Random(42)
    val expected = scala.collection.mutable.Map.empty[String, Option[String]]
    var round = 0
    val spark2 = spark; import spark2.implicits._
    def produceRound(): Unit = {
      round += 1
      // each round: a random subset of 120 keys, ~15% tombstones
      val keys = (0 until 120).filter(_ => rnd.nextBoolean())
      val rows = keys.map { k =>
        val v = if (rnd.nextInt(100) < 15) None else Some(s"r$round:$k")
        expected(k.toString) = v
        (k.toString, v.orNull)
      }
      if (rows.nonEmpty) PolarLog.produce(
        rows.toDF("partitionKey", "v")
          .selectExpr("partitionKey", "current_timestamp() AS timestamp",
            "CAST(v AS BINARY) AS value"), cfg)
    }
    produceRound(); produceRound()
    (0 until 6).foreach { i =>
      produceRound()
      if (i % 2 == 0) PolarLogCleaner.cleanKeys(spark, cfg)
      val want = expected.collect { case (k, Some(v)) => k -> v }.toMap
      assert(compacted(cfg) === want, s"view diverged after round $round")
    }
    // final deep clean (tombstones expire) and the invariant still holds
    PolarLogCleaner.cleanKeys(spark, cfg, dropTombstones = true)
    val want = expected.collect { case (k, Some(v)) => k -> v }.toMap
    assert(compacted(cfg) === want)
    // registry sanity after the whole interleaving
    val meta = LogMetadata.read(cfg)
    meta.filesByPart.foreach { case (p, files) =>
      files.sortBy(_.minOffset).sliding(2).foreach {
        case Seq(a, b) => assert(a.maxOffset < b.minOffset,
          s"overlap in partition $p")
        case _ => ()
      }
    }
  }

  test("compaction is not data loss: failOnDataLoss distinguishes cleaning from trims") {
    import org.apache.spark.sql.streaming.Trigger
    val cfg = TopicConfig(root, "kc_loss")
    produceKeyed(cfg, "v1", 0 until 40)
    val ckpt = s"$root/ckpt_kc_loss"
    // checkpoint a stream at EARLIEST (offset 0 everywhere), drain fully
    def run(): Long = {
      val q = spark.readStream.format("polar")
        .option("root", root).option("topic", "kc_loss")
        .option("startingOffsets", "earliest").load()
        .writeStream.trigger(Trigger.AvailableNow())
        .option("checkpointLocation", ckpt)
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          b.count(): Unit
        }.start()
      q.awaitTermination(120000)
      0L
    }
    run()
    // supersede everything below a fresh head, then clean: the first
    // survivors start ABOVE many checkpointed positions — NOT loss
    produceKeyed(cfg, "v2", 0 until 40)
    produceKeyed(cfg, "seal", 4000 until 4200)
    assert(PolarLogCleaner.cleanKeys(spark, cfg) > 0L)
    val meta = LogMetadata.read(cfg)
    assert((0 until meta.numPartitions).forall(p => meta.logStart(p) === 0L),
      "cleaning must not advance the log start")
    run() // resumes cleanly — no failOnDataLoss trip
    // a REAL trim advances the log start and trips a stale checkpoint
    PolarLog.deleteRecords(cfg,
      PolarLog.tails(cfg).map { case (p, t) => p -> t })
    val metaAfter = LogMetadata.read(cfg)
    assert((0 until metaAfter.numPartitions).exists(p => metaAfter.logStart(p) > 0L))
    // reset the checkpointed source offsets by deleting the checkpoint and
    // simulating the stale position through a fresh explicit start below
    // the trimmed log start
    val e = intercept[Exception] {
      val q = spark.readStream.format("polar")
        .option("root", root).option("topic", "kc_loss")
        .option("startingOffsets",
          s"""{"${metaAfter.logStarts.indexWhere(_ > 0L)}":0}""")
        .load()
        .writeStream.trigger(Trigger.AvailableNow())
        .option("checkpointLocation", s"$root/ckpt_kc_loss2")
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          b.count(): Unit
        }.start()
      q.awaitTermination(120000)
      if (q.exception.isDefined) throw q.exception.get
    }
    assert(e.getMessage.contains("data loss"), e.getMessage)
  }

  test("delete.retention.ms: tombstones survive inside the window, expire after it") {
    val cfg = TopicConfig(root, "kc_delret")
    val now = System.currentTimeMillis()
    produceKeyed(cfg, "v1", 0 until 30)
    produceKeyed(cfg, "v2", 0 until 30, tombstones = (0 until 30 by 3).toSet)
    produceKeyed(cfg, "seal", 6000 until 6200)
    // the topic prop is the default window (set via the SQL face — the
    // ALTER TABLE round-trip IS part of the contract)
    spark.conf.set("spark.sql.catalog.polar_dr", classOf[PolarCatalog].getName)
    spark.conf.set("spark.sql.catalog.polar_dr.root", root)
    spark.sql("ALTER TABLE polar_dr.kc_delret SET TBLPROPERTIES " +
      "('delete.retention.ms' = '86400000')")
    assert(LogMetadata.read(cfg).props(TopicProps.DeleteRetentionMs) === "86400000")
    // pass 1, clocked PAST the window already: tombstones still SURVIVE —
    // KIP-534 anchors the horizon at the segment's FIRST CLEANING, never
    // the produce age, so the pass that first cleans a tombstone can't
    // drop it (a consumer minutes behind must observe the delete fact)
    val removed1 = PolarLogCleaner.cleanKeys(spark, cfg,
      nowMs = now + 2L * 86400000L)
    assert(removed1 === 30L, s"removed $removed1")
    val raw1 = PolarLog.consume(spark, cfg)
    assert(raw1.filter(col("value").isNull).count() === 10L,
      "a tombstone must survive the pass that first cleans it")
    // pass 2, still inside the window SINCE CLEANING: survive again
    val removed2 = PolarLogCleaner.cleanKeys(spark, cfg,
      nowMs = now + 2L * 86400000L + 1000L)
    assert(removed2 === 0L, s"removed $removed2")
    // a RE-CLEAN with fresh churn (disjoint keys) must NOT reset the
    // tombstones' delete horizon: kc-sourced rows keep the FIRST-cleaning
    // stamp (the writer force-rolls at the kc/dirty boundary), else a
    // busy topic would retain its tombstones forever
    produceKeyed(cfg, "d1", 7000 until 7040)
    produceKeyed(cfg, "seal2", 6000 until 6200) // supersedes seal -> needy
    val recleanAt = now + 2L * 86400000L + 7200000L // first clean + 2h
    assert(PolarLogCleaner.cleanKeys(spark, cfg, nowMs = recleanAt) > 0L)
    assert(PolarLog.consume(spark, cfg).filter(col("value").isNull).count() === 10L,
      "a re-clean inside the window must keep the tombstones")
    // pass 4: past the window since the FIRST cleaning, inside it since
    // the re-clean — the preserved horizon expires the tombstones
    val removed4 = PolarLogCleaner.cleanKeys(spark, cfg,
      nowMs = now + 2L * 86400000L + 25L * 3600000L)
    assert(removed4 === 10L, s"removed $removed4")
    assert(PolarLog.consume(spark, cfg).filter(col("value").isNull).count() === 0L)
    // the non-tombstoned keys are untouched throughout
    assert(compacted(cfg)("1") === "v2:1")
  }

  test("coexisting kc generations each keep their OWN delete horizon across re-cleans") {
    // the round-11 defect: collapsing all prior kc clean times to the
    // per-partition MINIMUM restamps a tombstone first cleaned at t2 with
    // an older generation's t0, expiring it a window early (under-retain —
    // the KIP-534 violation). One partition so every generation coexists.
    val cfg = TopicConfig(root, "kc_gen", clusterSize = 1, rangesPerToken = 1)
    val w = 3600000L // 1 h tombstone window
    val t0 = System.currentTimeMillis()
    def clean(at: Long) = PolarLogCleaner.cleanKeys(spark, cfg,
      deleteRetentionMs = Some(w), nowMs = at)
    // gen 1 (stamp t0): v1 of 10-19 superseded by v2
    produceKeyed(cfg, "v1", 10 until 20)
    produceKeyed(cfg, "v2", 10 until 20)
    produceKeyed(cfg, "seal1", 200 until 210)
    assert(clean(t0) === 10L)
    // gen 2 (stamp t2 = t0+2h): tombstones 0-9 first cleaned here
    produceKeyed(cfg, "tomb", 0 until 10, tombstones = (0 until 10).toSet)
    produceKeyed(cfg, "c1", 300 until 310)
    produceKeyed(cfg, "c1", 300 until 310) // supersede -> needy
    produceKeyed(cfg, "seal2", 210 until 220)
    val t2 = t0 + 2 * w
    assert(clean(t2) === 10L)
    assert(PolarLog.consume(spark, cfg).filter(col("value").isNull).count() === 10L,
      "tombstones survive the pass that first cleans them")
    // both kc generations now coexist with STRUCTURAL distinct horizons
    val gens = LogMetadata.read(cfg).files.filter(_.name.startsWith("kc"))
      .map(_.cleanedMs).toSet
    assert(gens === Set(t0, t2), s"structural horizons $gens")
    // gen 3: re-clean at t3 = t0+2.5h (inside the tombstones' window) with
    // fresh churn — each kc-sourced row must keep ITS file's horizon
    produceKeyed(cfg, "d1", 400 until 410)
    produceKeyed(cfg, "d1", 400 until 410)
    produceKeyed(cfg, "seal3", 220 until 230)
    assert(clean(t0 + w * 5 / 2) > 0L)
    assert(PolarLog.consume(spark, cfg).filter(col("value").isNull).count() === 10L)
    assert(LogMetadata.read(cfg).files.filter(_.name.startsWith("kc"))
      .map(_.cleanedMs).toSet.intersect(Set(t0, t2)) === Set(t0, t2),
      "a re-clean must preserve BOTH generation horizons, not collapse them")
    // gen 4 at t4 = t0+2.75h: past t0+w, inside t2+w — the min-collapse bug
    // would have restamped the tombstones t0 and expired them HERE
    produceKeyed(cfg, "e1", 500 until 510)
    produceKeyed(cfg, "e1", 500 until 510)
    produceKeyed(cfg, "seal4", 230 until 240)
    assert(clean(t0 + w * 11 / 4) > 0L)
    assert(PolarLog.consume(spark, cfg).filter(col("value").isNull).count() === 10L,
      "a tombstone first cleaned at t2 must survive until t2 + window")
    // gen 5 at t5 = t0+4h: past t2+w — now they expire
    produceKeyed(cfg, "f1", 600 until 610)
    produceKeyed(cfg, "f1", 600 until 610)
    produceKeyed(cfg, "seal5", 240 until 250)
    assert(clean(t0 + 4 * w) > 0L)
    assert(PolarLog.consume(spark, cfg).filter(col("value").isNull).count() === 0L,
      "past its own window the tombstone expires")
    // the view was latest-per-key throughout
    assert(compacted(cfg)("15") === "v2:15" && !compacted(cfg).contains("3"))
  }

  test("min.compaction.lag.ms: young records neither compact nor supersede until the lag") {
    val cfg = TopicConfig(root, "kc_minlag")
    val now = System.currentTimeMillis()
    produceKeyed(cfg, "v1", 0 until 20)
    produceKeyed(cfg, "v2", 0 until 20)
    produceKeyed(cfg, "seal", 9000 until 9200)
    LogMetadata.updateProps(cfg)(_ +
      (TopicProps.CleanupPolicy -> "compact") +
      (TopicProps.MinCompactionLagMs -> "3600000"))
    // all dirty segments are younger than the lag: the pass excludes the
    // whole dirty region — nothing removed, nothing rewritten
    assert(PolarLogCleaner.cleanKeys(spark, cfg, nowMs = now) === 0L)
    assert(PolarLog.consume(spark, cfg).count() === 40L + 200L,
      "records within the lag must stay uncompacted")
    assert(LogMetadata.read(cfg).files.forall(!_.name.startsWith("kc")))
    // clocked past the lag the same pass compacts normally
    assert(PolarLogCleaner.cleanKeys(spark, cfg,
      nowMs = now + 2 * 3600000L) === 20L)
    assert(compacted(cfg)("5") === "v2:5")
    // planPass floor semantics, registry-only: the cut starts at the first
    // too-young DIRTY file and takes everything above it (contiguous
    // region), never a kc file below
    def f(name: String, lo: Long, hi: Long, created: Long) =
      graft.log.FileEntry(0, name, lo, hi, hi - lo + 1, 10L, created)
    val meta = graft.log.LogMetadata(1L, 1, 1, Vector(40L),
      filesByPart = Map(0 -> Vector(
        f("kc00000000000-c500-x.parquet", 0, 9, 400),
        f("f1.parquet", 10, 19, 2000),
        f("f2.parquet", 20, 29, 5000),
        f("f3.parquet", 30, 39, 6000))))
    val (regions, dirty, kc, heads) = PolarLogCleaner.planPass(meta, 5000L)
    assert(regions(0).map(_.name) === Vector("kc00000000000-c500-x.parquet", "f1.parquet"))
    assert(dirty.map(_.name) === Vector("f1.parquet"))
    assert(kc.size === 1 && heads.map(_.name) === Vector("f3.parquet"))
    // no floor: the full region is in scope
    assert(PolarLogCleaner.planPass(meta)._1(0).size === 3)
  }

  test("a pass after a clean pass reads only dirty bytes; compaction keeps the kc marker and age") {
    val cfg = TopicConfig(root, "kc_dirtyonly")
    produceKeyed(cfg, "v1", 0 until 40)
    produceKeyed(cfg, "v2", 0 until 40)
    produceKeyed(cfg, "seal", 7000 until 7200)
    val regionAges = LogMetadata.read(cfg).filesByPart.collect {
      case (p, fs) if fs.size >= 2 => p -> fs.sortBy(_.minOffset).init.map(_.createdMs).max
    }
    assert(PolarLogCleaner.cleanKeys(spark, cfg) === 40L)
    val meta = LogMetadata.read(cfg)
    // cleaned segments carry the newest SOURCE age, not the clean-pass time
    meta.filesByPart.foreach { case (p, fs) =>
      fs.filter(_.name.startsWith("kc")).foreach { f =>
        assert(f.createdMs === regionAges(p),
          s"part $p cleaned segment must carry the source commit age") }
    }
    // the next pass's winner map plans ZERO cleaned-region files: dirty
    // input is empty (or heads only), kc files are anti-join tested only
    val (_, dirty, kc, heads) = PolarLogCleaner.planPass(meta)
    assert(kc.nonEmpty, "the region must be kc after a clean pass")
    assert(dirty.isEmpty,
      s"a cleaned region must contribute nothing to the winner map, got $dirty")
    assert(heads.forall(h => !h.name.startsWith("kc")))
    // segment compaction keeps the cleaned marker for all-kc runs only —
    // any dirty member makes the merge dirty (so the dirty-ratio guard
    // never reads a merged cleaned run as dirty forever, and never reads
    // genuinely dirty bytes as clean)
    val kcA = kc.head; val kcB = kcA.copy(name = "kc00000000042-x.parquet")
    val dirtyF = kcA.copy(name = "f00000000050-x.parquet")
    assert(PolarCompaction.mergedPrefix(Seq(kcA, kcB)) === "kc")
    assert(PolarCompaction.mergedPrefix(Seq(kcA, dirtyF)) === "cp")
    // a real merge (kc + head here) carries the newest source age forward
    val agesByPart = meta.filesByPart.map { case (p, fs) =>
      p -> fs.map(_.createdMs).max }
    if (PolarCompaction.compact(spark, cfg, smallBytes = 1L << 30) > 0) {
      val after = LogMetadata.read(cfg)
      after.filesByPart.foreach { case (p, fs) =>
        fs.filter(_.name.startsWith("cp")).foreach(f =>
          assert(f.createdMs === agesByPart(p),
            s"part $p merged segment must carry the source commit age"))
      }
    }
    // and the cleaned data is exactly latest-per-key either way
    assert(compacted(cfg)("3") === "v2:3")
  }

  test("a trim on one partition never advances another partition's compacted logStart pin") {
    val cfg = TopicConfig(root, "kc_pin")
    produceKeyed(cfg, "v1", 0 until 40)
    produceKeyed(cfg, "v2", 0 until 40)
    produceKeyed(cfg, "seal", 8000 until 8200)
    assert(PolarLogCleaner.cleanKeys(spark, cfg) > 0L)
    val meta = LogMetadata.read(cfg)
    // pick a partition whose sparse survivors start ABOVE its pinned start
    val pinned = (0 until meta.numPartitions).find(p =>
      meta.logStart(p) === 0L && meta.derivedLogStart(p) > 0L)
    assert(pinned.nonEmpty, "need a compacted partition with a low pin")
    val p0 = pinned.get
    val other = (0 until meta.numPartitions).find(p =>
      p != p0 && meta.filesOf(p).nonEmpty).get
    // trim the OTHER partition to its tail; p0 is untouched by this trim
    PolarLog.deleteRecords(cfg, Map(other -> -1L))
    val after = LogMetadata.read(cfg)
    assert(after.logStart(other) > 0L, "the trimmed partition must advance")
    assert(after.logStart(p0) === 0L,
      "an untouched compacted partition must keep its pin verbatim")
    // age-based retention that removes nothing from p0's head keeps it too
    PolarLog.cleanRetention(cfg, retentionMs = 365L * 24 * 3600 * 1000)
    assert(LogMetadata.read(cfg).logStart(p0) === 0L)
  }

  test("sparse survivors: offset top-N and LIMIT stay correct; agg pushdown stays exact") {
    val cfg = TopicConfig(root, "kc_sparse")
    produceKeyed(cfg, "v1", 0 until 60)
    // v2 touches the odd keys only -> v1's file keeps an interleaved half
    produceKeyed(cfg, "v2", (1 until 60 by 2))
    produceKeyed(cfg, "seal", 3000 until 3200)
    assert(PolarLogCleaner.cleanKeys(spark, cfg) === 30L)
    val meta = LogMetadata.read(cfg)
    assert(meta.files.exists(f => f.count > 0 && !f.dense),
      "interleaved supersession must leave a sparse file")
    val df = spark.read.format("polar")
      .option("root", root).option("topic", "kc_sparse").load()
    val total = df.count()
    // count(*) from the registry is EXACT for sparse files (counts are real)
    assert(total === 60L + 200L)
    // LIMIT and offset-ordered top-N fall back to uncapped windows —
    // results match a full collect
    assert(df.limit(10).count() === 10L)
    // deterministic tie-break: offsets repeat across partitions
    val topAsc = df.orderBy(col("offset"), col("part")).limit(5)
      .select(col("offset"), col("part")).collect()
      .map(r => (r.getLong(0), r.getInt(1)))
    val fullAsc = df.select(col("offset"), col("part")).collect()
      .map(r => (r.getLong(0), r.getInt(1))).sorted.take(5)
    assert(topAsc.toSeq === fullAsc.toSeq)
    val topDesc = df.orderBy(col("offset").desc, col("part").desc).limit(5)
      .select(col("offset"), col("part")).collect()
      .map(r => (r.getLong(0), r.getInt(1))).sorted
    val fullDesc = df.select(col("offset"), col("part")).collect()
      .map(r => (r.getLong(0), r.getInt(1))).sorted.takeRight(5)
    assert(topDesc.toSeq === fullDesc.toSeq)
  }
}
