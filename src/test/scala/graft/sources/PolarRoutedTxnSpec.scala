package graft.sources

import graft.GraftSession
import graft.log.{FileEntry, LogMetadata, PolarLog, RingTemplate, TxnJournal}
import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Atomic multi-topic routed commits: the intent journal + sweep recovery
  * drive a killed fan-out to all-or-none (journal lifecycle, roll-forward,
  * incomplete-intent rollback, grace window, undrivable marking). */
class PolarRoutedTxnSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private var root: String = _
  private var template: RingTemplate = _

  override def beforeAll(): Unit = {
    spark = GraftSession.builder(master = "local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    root = Files.createTempDirectory("polar_routed_txn").toString
    template = RingTemplate(root)
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def routedProduce(topics: Seq[String], tag: String): Unit = {
    val s = spark; import s.implicits._
    val rows = for (t <- topics; k <- 0 until 40) yield (t, k.toString, s"$tag:$t:$k")
    PolarLog.produceRouted(rows.toDF("topic", "partitionKey", "v")
      .selectExpr("topic", "partitionKey",
        "current_timestamp() AS timestamp", "CAST(v AS BINARY) AS value"),
      template)
  }

  /** Rewind a topic to its pre-produce registry state WITHOUT touching its
    * data files — exactly what a kill between the fan-out's per-topic
    * CASes leaves behind for that topic. Returns the unregistered entries. */
  private def simulateUncommitted(topic: String): Vector[FileEntry] = {
    val cfg = template.topicConfig(topic)
    val meta = LogMetadata.read(cfg)
    val staged = meta.files
    LogMetadata.compareAndSet(cfg, meta)(m => m.copy(
      filesByPart = m.filesByPart.map { case (p, _) => p -> Vector.empty[FileEntry] },
      producerOffsets = Vector.fill(m.numPartitions)(0L)))
    staged
  }

  test("a successful multi-topic commit leaves no journal behind") {
    routedProduce(Seq("ok_a", "ok_b"), "v1")
    assert(TxnJournal.list(root).isEmpty,
      "the intent journal must be deleted once every topic's CAS landed")
    assert(PolarLog.consume(spark, template.topicConfig("ok_a")).count() === 40L)
  }

  test("kill between topic commits: recovery rolls the fan-out forward to ALL") {
    routedProduce(Seq("fw_a", "fw_b"), "v1")
    val cfgA = template.topicConfig("fw_a")
    val cfgB = template.topicConfig("fw_b")
    val committedA = LogMetadata.read(cfgA).files
    // crash state: fw_a's CAS landed, fw_b's never ran (staged files only)
    val stagedB = simulateUncommitted("fw_b")
    assert(PolarLog.consume(spark, cfgB).count() === 0L)
    TxnJournal.write(root,
      Map("fw_a" -> committedA, "fw_b" -> stagedB), txn = None)
    // within the grace window nothing is touched (an in-flight commit)
    assert(PolarRoutedWrite.recoverJournals(template, graceMs = 3600000L) === 0)
    assert(TxnJournal.list(root).size === 1)
    // past it the journal resolves: fw_b's staged segments register through
    // the normal commit path — BOTH topics carry the batch
    assert(PolarRoutedWrite.recoverJournals(template, graceMs = 0L) === 1)
    assert(TxnJournal.list(root).isEmpty)
    assert(PolarLog.consume(spark, cfgB).count() === 40L)
    val metaB = LogMetadata.read(cfgB)
    stagedB.groupBy(_.part).foreach { case (p, fs) =>
      assert(metaB.producerOffsets(p) === fs.map(_.maxOffset).max + 1,
        s"part $p tail must advance with the rolled-forward files")
    }
    // idempotent: nothing left to resolve
    assert(PolarRoutedWrite.recoverJournals(template, graceMs = 0L) === 0)
  }

  test("kill before ANY topic's CAS: recovery rolls back — a failed batch re-run must not duplicate") {
    // the job failed from its caller's perspective and a batch re-run
    // carries no idempotence key, so recovery must choose NONE here even
    // though the staged files could roll forward
    routedProduce(Seq("nb_a", "nb_b"), "v1")
    val stagedA = simulateUncommitted("nb_a")
    val stagedB = simulateUncommitted("nb_b")
    TxnJournal.write(root, Map("nb_a" -> stagedA, "nb_b" -> stagedB), None)
    assert(PolarRoutedWrite.recoverJournals(template, graceMs = 0L) === 1)
    assert(TxnJournal.list(root).isEmpty)
    assert(PolarLog.consume(spark, template.topicConfig("nb_a")).count() === 0L)
    assert(PolarLog.consume(spark, template.topicConfig("nb_b")).count() === 0L)
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(graft.log.HadoopConf.shared)
    (stagedA.map(_.path(template.topicConfig("nb_a"))) ++
      stagedB.map(_.path(template.topicConfig("nb_b")))).foreach { p =>
      assert(!fs.exists(new org.apache.hadoop.fs.Path(p)), s"staged $p reclaimed")
    }
  }

  test("vacuum never reclaims files a live journal references") {
    routedProduce(Seq("vh_a", "vh_b"), "v1")
    val committedA = LogMetadata.read(template.topicConfig("vh_a")).files
    val stagedB = simulateUncommitted("vh_b")
    TxnJournal.write(root, Map("vh_a" -> committedA, "vh_b" -> stagedB), None)
    // staged files are UNREGISTERED and older than the journal — an
    // mtime-only vacuum would eat them before recovery could run
    val cfgB = template.topicConfig("vh_b")
    assert(PolarLog.vacuum(cfgB, manifestGraceMs = Long.MaxValue / 2,
      nowMs = System.currentTimeMillis() + 3600000L,
      dataGraceMs = 0L, dryRun = true) === 0,
      "journal-held staged files must not be vacuum candidates")
    // resolve the journal so later tests see a clean root
    assert(PolarRoutedWrite.recoverJournals(template, graceMs = 0L) === 1)
    assert(PolarLog.consume(spark, cfgB).count() === 40L)
  }

  test("incomplete intent (no commit point): recovery reclaims staged files — NONE") {
    routedProduce(Seq("rb_a"), "v1")
    val staged = simulateUncommitted("rb_a")
    val jdir = TxnJournal.write(root, Map("rb_a" -> staged), txn = None)
    // a journal whose txn.json never landed is an incomplete intent
    val fs = new org.apache.hadoop.fs.Path(jdir)
      .getFileSystem(graft.log.HadoopConf.shared)
    fs.delete(new org.apache.hadoop.fs.Path(s"$jdir/txn.json"), false)
    assert(PolarRoutedWrite.recoverJournals(template, graceMs = 0L) === 1)
    assert(TxnJournal.list(root).isEmpty)
    val cfg = template.topicConfig("rb_a")
    assert(PolarLog.consume(spark, cfg).count() === 0L)
    staged.foreach { f =>
      assert(!fs.exists(new org.apache.hadoop.fs.Path(f.path(cfg))),
        s"staged ${f.name} must be reclaimed")
    }
  }

  test("staged files lost and never committed: the journal is marked failed, not chewed") {
    routedProduce(Seq("lf_a", "lf_b"), "v1")
    val committedA = LogMetadata.read(template.topicConfig("lf_a")).files
    val stagedB = simulateUncommitted("lf_b")
    val cfgB = template.topicConfig("lf_b")
    val fs = new org.apache.hadoop.fs.Path(cfgB.dir)
      .getFileSystem(graft.log.HadoopConf.shared)
    stagedB.foreach(f =>
      fs.delete(new org.apache.hadoop.fs.Path(f.path(cfgB)), false))
    TxnJournal.write(root, Map("lf_a" -> committedA, "lf_b" -> stagedB), None)
    assert(PolarRoutedWrite.recoverJournals(template, graceMs = 0L) === 0)
    // renamed out of the scan — later sweeps don't re-chew it, the
    // committed topic keeps its records (unregistering already-visible
    // data would be worse than the partial state)
    assert(TxnJournal.list(root).isEmpty)
    assert(fs.exists(new org.apache.hadoop.fs.Path(
      TxnJournal.dir(root))), "journal dir survives for the operator")
    assert(PolarLog.consume(spark, template.topicConfig("lf_a")).count() === 40L)
  }

  test("batch fan-outs stamp a synthetic txn: recovery stays correct after compaction renames the entries") {
    routedProduce(Seq("cls_a", "cls_b"), "v1")
    val cfgA = template.topicConfig("cls_a")
    val cfgB = template.topicConfig("cls_b")
    val firstA = LogMetadata.read(cfgA).files
    val firstB = LogMetadata.read(cfgB).files
    // the multi-topic BATCH commit recorded its synthetic (sinkId, 0) in
    // every destination's root doc
    val sid = LogMetadata.read(cfgA).sinkCommits.keys
      .find(_.startsWith("polar-routed-"))
      .getOrElse(fail("batch fan-out must record a synthetic txn"))
    assert(LogMetadata.read(cfgB).sinkCommits.contains(sid),
      "every destination records the same fan-out txn")
    // crash state: the journal survived a kill AFTER both CASes; before
    // recovery runs, a second batch + compaction REWRITES the registry
    // names the journal references (originals deleted — the worst case)
    routedProduce(Seq("cls_a", "cls_b"), "v2")
    TxnJournal.write(root, Map("cls_a" -> firstA, "cls_b" -> firstB),
      txn = Some(sid -> 0L))
    Seq(cfgA, cfgB).foreach { c =>
      assert(PolarCompaction.compact(spark, c, smallBytes = 1L << 30,
        minRun = 2) > 0, "fixture must compact")
    }
    assert(PolarRoutedWrite.recoverJournals(template, graceMs = 0L) === 1)
    // classified committed FROM THE ROOT DOC (names are gone): no
    // duplicate roll-forward, no wrongful .failed, journal resolved
    // (other tests' .failed journals under the shared root persist by
    // design — scope the check to THIS fan-out's topics)
    assert(!TxnJournal.list(root, includeFailed = true)
      .exists(_.topics.contains("cls_a")))
    assert(PolarLog.consume(spark, cfgA).count() === 80L)
    assert(PolarLog.consume(spark, cfgB).count() === 80L)
  }

  test("a .failed journal keeps protecting its surviving staged files from vacuum") {
    routedProduce(Seq("hold_c", "hold_lost", "hold_keep"), "v1")
    val committedC = LogMetadata.read(template.topicConfig("hold_c")).files
    val stagedLost = simulateUncommitted("hold_lost")
    val stagedKeep = simulateUncommitted("hold_keep")
    val cfgLost = template.topicConfig("hold_lost")
    val cfgKeep = template.topicConfig("hold_keep")
    val fs = new org.apache.hadoop.fs.Path(cfgLost.dir)
      .getFileSystem(graft.log.HadoopConf.shared)
    stagedLost.foreach(f =>
      fs.delete(new org.apache.hadoop.fs.Path(f.path(cfgLost)), false))
    TxnJournal.write(root, Map("hold_c" -> committedC,
      "hold_lost" -> stagedLost, "hold_keep" -> stagedKeep), None)
    assert(PolarRoutedWrite.recoverJournals(template, graceMs = 0L) === 0)
    assert(TxnJournal.list(root).isEmpty, "renamed out of the recovery scan")
    // the surviving topic's staged files stay held — an operator can still
    // inspect/hand-roll-forward them; vacuum must not treat them as orphans
    val heldK = TxnJournal.heldNames(root, "hold_keep")
    assert(stagedKeep.map(f => s"part=${f.part}/${f.name}").toSet
      .subsetOf(heldK))
    PolarLog.vacuum(cfgKeep, dataGraceMs = 0L)
    stagedKeep.foreach(f => assert(fs.exists(
      new org.apache.hadoop.fs.Path(f.path(cfgKeep))),
      "vacuum must hold a .failed journal's staged files"))
    // releasing = deleting the .failed dir; clean up for later tests
    TxnJournal.list(root, includeFailed = true)
      .foreach(j => TxnJournal.delete(j.path))
  }

  test("heartbeats keep recovery's grace measured from last progress, not the commit point") {
    routedProduce(Seq("hb_a", "hb_b"), "v1")
    val entriesA = LogMetadata.read(template.topicConfig("hb_a")).files
    val jpath = TxnJournal.write(root, Map("hb_a" -> entriesA), None)
    val anchor1 = TxnJournal.list(root).head.ageAnchorMs
    Thread.sleep(1100)
    TxnJournal.heartbeat(jpath)
    val anchor2 = TxnJournal.list(root).head.ageAnchorMs
    assert(anchor2 > anchor1, "the hb file must advance the age anchor")
    // a clock where the commit point is past grace but the heartbeat is
    // not: the journal is an in-flight commit and must be left alone
    assert(PolarRoutedWrite.recoverJournals(template,
      graceMs = 1000L, nowMs = anchor1 + 1050L) === 0)
    assert(TxnJournal.list(root).size === 1)
    assert(PolarRoutedWrite.recoverJournals(template, graceMs = 0L) === 1)
  }

  test("the retention sweep drives recovery and skips the reserved journal dir") {
    routedProduce(Seq("sw_a", "sw_b"), "v1")
    val committedA = LogMetadata.read(template.topicConfig("sw_a")).files
    val stagedB = simulateUncommitted("sw_b")
    TxnJournal.write(root, Map("sw_a" -> committedA, "sw_b" -> stagedB), None)
    val sched = new graft.log.RetentionScheduler(root,
      retentionMs = 365L * 24 * 3600 * 1000,
      routedRecover = Some(now => PolarRoutedWrite.recoverJournals(
        template, graceMs = 0L, nowMs = now)))
    sched.sweep()
    assert(sched.recovered === 1L)
    assert(PolarLog.consume(spark, template.topicConfig("sw_b")).count() === 40L)
    // `_polar_txns` is never mistaken for a topic
    assert(!sched.topics().exists(_.topic.startsWith("_")))
  }
}
