package graft.log

import graft.GraftSession
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import java.nio.file.Files

/** Kafka's `file.delete.delay.ms` (reader-protection window between a
  * segment's UNREGISTRATION and its physical delete), made structural via
  * the root doc's `pendingDeletes` ledger: every trim / compaction /
  * key-clean / overwrite removal defers to the ledger when the topic
  * configures a delay, vacuum holds ledger entries until their own
  * deadline, and the default (no prop) keeps the engine's pre-existing
  * eager deletion. */
class FileDeleteDelaySpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private var root: String = _
  private val sfDir = "/root/testdata/sf0.001"
  private val DelayMs = 60_000L

  override def beforeAll(): Unit = {
    spark = GraftSession.builder(master = "local[4]")
      .config("spark.sql.shuffle.partitions", "8")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    root = Files.createTempDirectory("fdd_spec").toString
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def records(from: Int, until: Int) = graft.Tables.events(spark, sfDir)
    .filter(col("event_id") >= from && col("event_id") < until)
    .select(col("user_id").cast("string").as("partitionKey"),
      col("ts").as("timestamp"), col("props").as("value"))

  private def setProps(c: TopicConfig, ps: Map[String, String]): Unit =
    LogMetadata.compareAndSet(c, LogMetadata.read(c))(m => m.copy(props = ps))

  private def onDisk(path: String): Boolean = new java.io.File(path).isFile

  test("props validation: non-negative ms accepted, negatives/garbage refused") {
    assert(TopicProps.validate(TopicProps.FileDeleteDelayMs, "0"))
    assert(TopicProps.validate(TopicProps.FileDeleteDelayMs, "60000"))
    intercept[IllegalArgumentException] {
      TopicProps.validate(TopicProps.FileDeleteDelayMs, "-1")
    }
    intercept[IllegalArgumentException] {
      TopicProps.validate(TopicProps.FileDeleteDelayMs, "soon")
    }
  }

  test("an absurd-but-valid delay saturates to hold-forever instead of wrapping to immediate reclamation") {
    assert(PolarLog.dueAt(1000L, Long.MaxValue) === Long.MaxValue)
    assert(PolarLog.dueAt(1000L, 60_000L) === 61_000L)
    val t = TopicConfig(root, "fdd_overflow")
    PolarLog.produce(records(0, 100), t)
    setProps(t, Map(TopicProps.FileDeleteDelayMs -> Long.MaxValue.toString))
    val paths = LogMetadata.read(t).files.map(_.path(t))
    val now = System.currentTimeMillis() + 1000
    PolarLog.cleanRetention(t, retentionMs = 0L, nowMs = now)
    assert(LogMetadata.read(t).pendingDeletes.forall(_.dueMs === Long.MaxValue))
    // even the farthest representable vacuum clock holds the files (the
    // count includes superseded MANIFESTS at such a clock — assert on the
    // data files and the ledger, not the count)
    PolarLog.vacuum(t, nowMs = Long.MaxValue - 1, dataGraceMs = 0L)
    assert(paths.forall(onDisk))
    assert(LogMetadata.read(t).pendingDeletes.size === paths.size)
  }

  test("ledger round-trips through the root doc and stamps format 5 only when nonempty") {
    val t = TopicConfig(root, "fdd_serde")
    PolarLog.produce(records(0, 50), t)
    val before = LogMetadata.read(t)
    assert(before.pendingDeletes.isEmpty)
    val pend = Vector(PendingDelete(0, "a.parquet", 123L),
      PendingDelete(3, "b.parquet", 456L))
    LogMetadata.compareAndSet(t, before)(m => m.copy(pendingDeletes = pend))
    val after = LogMetadata.read(t)
    assert(after.pendingDeletes === pend)
    def rootFormat: Int = {
      val s = new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(t.metadataPath)))
      """"format"\s*:\s*(\d+)""".r.findFirstMatchIn(s).get.group(1).toInt
    }
    assert(rootFormat === 5, "a nonempty ledger must refuse older readers")
    // and back to empty → readable as a plain (format-2) doc again
    LogMetadata.compareAndSet(t, after)(m => m.copy(pendingDeletes = Vector.empty))
    assert(LogMetadata.read(t).pendingDeletes.isEmpty)
    assert(rootFormat === 2, "ledger-free docs keep the compatible stamp")
  }

  test("retention trim defers the physical delete; vacuum holds until due, then reclaims and prunes") {
    val t = TopicConfig(root, "fdd_retention")
    PolarLog.produce(records(0, 300), t)
    setProps(t, Map(TopicProps.FileDeleteDelayMs -> DelayMs.toString))
    val paths = LogMetadata.read(t).files.map(_.path(t))
    assert(paths.nonEmpty && paths.forall(onDisk))
    val now = System.currentTimeMillis() + 1000
    val trimmed = PolarLog.cleanRetention(t, retentionMs = 0L, nowMs = now)
    assert(trimmed === paths.size)
    // unregistered (invisible to readers) but still on disk, held by the ledger
    assert(PolarLog.consume(spark, t).count() === 0)
    assert(paths.forall(onDisk), "deferred files must survive the trim")
    val meta = LogMetadata.read(t)
    assert(meta.pendingDeletes.size === paths.size)
    assert(meta.pendingDeletes.forall(_.dueMs === now + DelayMs))
    // vacuum INSIDE the window: held even at zero data grace
    assert(PolarLog.vacuum(t, nowMs = now + DelayMs - 1, dataGraceMs = 0L) === 0)
    assert(paths.forall(onDisk))
    assert(LogMetadata.read(t).pendingDeletes.size === paths.size,
      "held entries stay in the ledger")
    // vacuum PAST the deadline: reclaims the files and prunes the ledger
    val reclaimed = PolarLog.vacuum(t, nowMs = now + DelayMs + 1, dataGraceMs = 0L)
    assert(reclaimed === paths.size)
    assert(paths.forall(p => !onDisk(p)))
    assert(LogMetadata.read(t).pendingDeletes.isEmpty)
  }

  test("without the prop the trim deletes eagerly (pre-existing default)") {
    val t = TopicConfig(root, "fdd_eager")
    PolarLog.produce(records(0, 200), t)
    val paths = LogMetadata.read(t).files.map(_.path(t))
    assert(paths.nonEmpty && paths.forall(onDisk))
    PolarLog.cleanRetention(t, retentionMs = 0L,
      nowMs = System.currentTimeMillis() + 1000)
    assert(paths.forall(p => !onDisk(p)), "eager default deletes at the trim")
    assert(LogMetadata.read(t).pendingDeletes.isEmpty)
  }

  test("deleteRecords defers through the ledger too") {
    val t = TopicConfig(root, "fdd_delrecs")
    PolarLog.produce(records(0, 300), t)
    setProps(t, Map(TopicProps.FileDeleteDelayMs -> DelayMs.toString))
    val meta0 = LogMetadata.read(t)
    val paths = meta0.files.map(_.path(t))
    PolarLog.truncate(t)
    assert(PolarLog.consume(spark, t).count() === 0)
    assert(paths.forall(onDisk), "truncated segments held by the ledger")
    assert(LogMetadata.read(t).pendingDeletes.size === paths.size)
    val far = System.currentTimeMillis() + DelayMs + 60_000
    assert(PolarLog.vacuum(t, nowMs = far, dataGraceMs = 0L) >= paths.size)
    assert(paths.forall(p => !onDisk(p)))
    assert(LogMetadata.read(t).pendingDeletes.isEmpty)
  }

  test("compaction defers superseded originals through the ledger") {
    val t = TopicConfig(root, "fdd_compact")
    // several small produces → a run of small adjacent segments
    (0 until 4).foreach(i => PolarLog.produce(records(i * 50, (i + 1) * 50), t))
    setProps(t, Map(TopicProps.FileDeleteDelayMs -> DelayMs.toString))
    val before = LogMetadata.read(t)
    val paths = before.files.map(_.path(t))
    val rows = PolarLog.consume(spark, t).count()
    val mergedRuns = graft.sources.PolarCompaction.compact(
      spark, t, smallBytes = 1L << 30, minRun = 2)
    assert(mergedRuns > 0, "fixture must produce at least one mergeable run")
    // readers see the same rows; originals survive on disk under the ledger
    assert(PolarLog.consume(spark, t).count() === rows)
    val meta = LogMetadata.read(t)
    assert(meta.pendingDeletes.nonEmpty)
    val pendPaths = meta.pendingDeletes
      .map(pd => s"${t.dir}/part=${pd.part}/${pd.name}")
    assert(pendPaths.forall(onDisk))
    assert(pendPaths.toSet.subsetOf(paths.toSet),
      "only pre-compaction originals enter the ledger")
    // past the deadline: reclaimed + pruned; the merged data stays intact
    val far = System.currentTimeMillis() + DelayMs + 60_000
    assert(PolarLog.vacuum(t, nowMs = far, dataGraceMs = 0L) >= pendPaths.size)
    assert(pendPaths.forall(p => !onDisk(p)))
    assert(LogMetadata.read(t).pendingDeletes.isEmpty)
    assert(PolarLog.consume(spark, t).count() === rows)
  }

  test("the pending_deletes metadata table surfaces the ledger in SQL") {
    val t = TopicConfig(root, "fdd_metatable")
    PolarLog.produce(records(0, 200), t)
    setProps(t, Map(TopicProps.FileDeleteDelayMs -> DelayMs.toString))
    val expected = LogMetadata.read(t).files.map(f => (f.part, f.name)).toSet
    val now = System.currentTimeMillis() + 1000
    PolarLog.cleanRetention(t, retentionMs = 0L, nowMs = now)
    spark.conf.set("spark.sql.catalog.fddcat", "graft.sources.PolarCatalog")
    spark.conf.set("spark.sql.catalog.fddcat.root", root)
    val rows = spark.sql(
      "SELECT part, name, due_ms FROM fddcat.fdd_metatable.pending_deletes")
      .collect()
    assert(rows.map(r => (r.getInt(0), r.getString(1))).toSet === expected)
    assert(rows.forall(_.getLong(2) === now + DelayMs))
    // reclaim → the view drains
    PolarLog.vacuum(t, nowMs = now + DelayMs + 1, dataGraceMs = 0L)
    assert(spark.sql(
      "SELECT * FROM fddcat.fdd_metatable.pending_deletes").count() === 0)
  }

  test("VERSION AS OF a pre-trim snapshot stays readable through the window") {
    val t = TopicConfig(root, "fdd_timetravel")
    PolarLog.produce(records(0, 150), t)
    setProps(t, Map(TopicProps.FileDeleteDelayMs -> DelayMs.toString))
    val preVersion = LogMetadata.read(t).version
    PolarLog.produce(records(150, 300), t)
    val now = System.currentTimeMillis() + 1000
    PolarLog.cleanRetention(t, retentionMs = 0L, nowMs = now)
    assert(PolarLog.consume(spark, t).count() === 0)
    // the snapshot's registry still names the held files — a time-traveled
    // read inside the window succeeds instead of hitting missing segments
    val asOf = PolarLog.consumeAt(spark, t, LogMetadata.readAt(t, preVersion))
    assert(asOf.count() === 150)
    // past the deadline the files are reclaimed; the same read now fails
    // loudly at execution (registry names missing data) rather than
    // returning a silently partial snapshot
    PolarLog.vacuum(t, nowMs = now + DelayMs + 1, dataGraceMs = 0L)
    intercept[Exception] {
      PolarLog.consumeAt(spark, t, LogMetadata.readAt(t, preVersion)).count()
    }
  }

  test("a reader that planned before the trim still reads held files (the window's point)") {
    val t = TopicConfig(root, "fdd_reader")
    PolarLog.produce(records(0, 300), t)
    setProps(t, Map(TopicProps.FileDeleteDelayMs -> DelayMs.toString))
    // plan against the pre-trim registry (lazy: no files touched yet)
    val preTrim = PolarLog.consume(spark, t)
    PolarLog.cleanRetention(t, retentionMs = 0L,
      nowMs = System.currentTimeMillis() + 1000)
    // the trim landed, but the held files keep the old plan executable
    assert(preTrim.count() === 300)
  }
}
