package graft.sources

import graft.log.{LogMetadata, PolarLog, TopicConfig}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Segment compaction: registry shrinks, rows/offsets byte-stable, idempotent. */
class PolarCompactionSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private val sfDir = "/root/testdata/sf0.001"

  override def beforeAll(): Unit = {
    spark = graft.GraftSession.builder(master = "local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def snapshot(cfg: TopicConfig): Seq[(Int, Long, String)] =
    PolarLog.consume(spark, cfg)
      .select(col("part"), col("offset"), col("value").cast("string"))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getString(2))).toSeq.sorted

  test("compaction merges small runs, preserves rows+offsets, and is idempotent") {
    val root = Files.createTempDirectory("polar_cp_spec").toString
    val cfg = TopicConfig(root, "cmp")
    def slice(rem: Int) = graft.Tables.events(spark, sfDir)
      .filter(pmod(col("event_id"), lit(3)) === rem)
      .select(col("user_id").cast("string").as("partitionKey"),
        col("ts").as("timestamp"), col("props").as("value"))
    (0 until 3).foreach(r => PolarLog.produce(slice(r), cfg,
      orderBy = Seq(col("timestamp"), col("value"))))

    val before = snapshot(cfg)
    val filesBefore = LogMetadata.read(cfg).files.size
    val merged = PolarCompaction.compact(spark, cfg, smallBytes = 1L << 30, minRun = 2)
    assert(merged > 0)
    val metaAfter = LogMetadata.read(cfg)
    assert(metaAfter.files.size < filesBefore)
    // every data-bearing partition collapsed to one registered segment
    metaAfter.filesByPart.foreach { case (_, v) => assert(v.size <= 1) }
    // rows, offsets, order, payloads: byte-stable across the swap
    assert(snapshot(cfg) === before)
    // offsets stay dense per partition
    metaAfter.filesByPart.filter(_._2.nonEmpty).foreach { case (p, v) =>
      assert(v.head.minOffset === 0L)
      assert(v.head.count === v.head.maxOffset - v.head.minOffset + 1)
    }
    // second pass finds nothing (runs of one)
    assert(PolarCompaction.compact(spark, cfg, smallBytes = 1L << 30, minRun = 2) === 0)
    // new small segments re-qualify and the data stays intact
    PolarLog.produce(slice(0), cfg, orderBy = Seq(col("timestamp"), col("value")))
    assert(PolarCompaction.compact(spark, cfg, smallBytes = 1L << 30, minRun = 2) > 0)
    assert(PolarLog.consume(spark, cfg).count() === before.size + slice(0).count())
  }

  test("deferred-delete mode keeps originals readable until an age-gated vacuum") {
    val root = Files.createTempDirectory("polar_cp_defer").toString
    val cfg = TopicConfig(root, "defer")
    def slice(rem: Int) = graft.Tables.events(spark, sfDir)
      .filter(pmod(col("event_id"), lit(2)) === rem)
      .select(col("user_id").cast("string").as("partitionKey"),
        col("ts").as("timestamp"), col("props").as("value"))
    (0 until 2).foreach(r => PolarLog.produce(slice(r), cfg,
      orderBy = Seq(col("timestamp"), col("value"))))
    val oldPaths = LogMetadata.read(cfg).files
      .map(f => new org.apache.hadoop.fs.Path(f.path(cfg)))
    assert(PolarCompaction.compact(spark, cfg, smallBytes = 1L << 30,
      minRun = 2, deleteOriginals = false) > 0)
    val fs = oldPaths.head.getFileSystem(graft.log.HadoopConf.shared)
    // superseded files still on disk (an in-flight reader can finish)...
    assert(oldPaths.forall(fs.exists))
    // ...but invisible to new planners (registry lists only merged files)
    assert(snapshot(cfg).size === LogMetadata.read(cfg).files.map(_.count).sum)
    // an age-gated vacuum protects them inside the grace window...
    PolarLog.vacuum(cfg, dataGraceMs = 60L * 60 * 1000)
    assert(oldPaths.forall(fs.exists))
    // ...and reclaims them beyond it
    PolarLog.vacuum(cfg, dataGraceMs = 0L)
    assert(!oldPaths.exists(fs.exists))
    // data unchanged throughout
    assert(snapshot(cfg).size.toLong ===
      graft.Tables.events(spark, sfDir).count())
  }

  test("files at or above the small threshold never join a run") {
    val f = (o: Long, b: Long) => graft.log.FileEntry(0, s"f$o", o, o + 9, 10, b, 0L)
    // small, small, BIG, small -> one run of the two leading smalls
    val runs = PolarCompaction.runsOf(
      Vector(f(0, 10), f(10, 10), f(20, 999), f(30, 10)),
      smallBytes = 100, minRun = 2, maxBytes = 1L << 30)
    assert(runs === Seq(Vector(f(0, 10), f(10, 10))))
    // run splits when the cumulative size would exceed maxBytes
    val capped = PolarCompaction.runsOf(
      Vector(f(0, 60), f(10, 60), f(20, 60), f(30, 60)),
      smallBytes = 100, minRun = 2, maxBytes = 130)
    assert(capped.forall(_.map(_.bytes).sum <= 130))
    assert(capped.flatten.size >= 2)
  }

  test("segment.ms caps a merge run's createdMs span") {
    val hour = 3600L * 1000
    val g = (o: Long, created: Long) =>
      graft.log.FileEntry(0, s"g$o", o, o + 9, 10, 10, created)
    val files = Vector(g(0, 0), g(10, hour), g(20, 2 * hour), g(30, 3 * hour))
    // 90-minute ceiling: [t0, t0+1h] merge, adding t0+2h would span 2h
    val runs = PolarCompaction.runsOf(files, smallBytes = 100, minRun = 2,
      maxBytes = 1L << 30, maxSpanMs = 90L * 60 * 1000)
    assert(runs === Seq(Vector(g(0, 0), g(10, hour)),
      Vector(g(20, 2 * hour), g(30, 3 * hour))))
    // unbounded (the default) keeps one maximal run
    assert(PolarCompaction.runsOf(files, smallBytes = 100, minRun = 2,
      maxBytes = 1L << 30).map(_.size) === Seq(4))
  }

  test("end-to-end: a segment.ms topic splits compaction at the span ceiling") {
    val root = Files.createTempDirectory("polar_cp_segms").toString
    val cfg = TopicConfig(root, "segms")
    def slice(rem: Int) = graft.Tables.events(spark, sfDir)
      .filter(pmod(col("event_id"), lit(4)) === rem)
      .select(col("user_id").cast("string").as("partitionKey"),
        col("ts").as("timestamp"), col("props").as("value"))
    (0 until 4).foreach(r => PolarLog.produce(slice(r), cfg,
      orderBy = Seq(col("timestamp"), col("value"))))
    // simulate hourly produces: restamp each partition's files (in offset
    // order) to t0, t0+1h, t0+2h, t0+3h — the registry is the only reader
    // of createdMs, so a CAS restamp is a faithful aging fixture
    val hour = 3600L * 1000
    LogMetadata.compareAndSet(cfg, LogMetadata.read(cfg)) { m =>
      m.copy(filesByPart = m.filesByPart.map { case (p, fs) =>
        p -> fs.sortBy(_.minOffset).zipWithIndex.map { case (fe, i) =>
          fe.copy(createdMs = i * hour)
        }
      })
    }
    LogMetadata.updateProps(cfg)(_ +
      (graft.log.TopicProps.SegmentMs -> (90L * 60 * 1000).toString))
    val before = graft.Tables.events(spark, sfDir).count()
    assert(PolarCompaction.compact(spark, cfg, smallBytes = 1L << 30,
      minRun = 2) > 0)
    val meta = LogMetadata.read(cfg)
    // every data-bearing partition that had 4 slices compacted to exactly
    // 2 segments (the 90-minute ceiling splits the hourly quartet in two)
    meta.filesByPart.values.filter(_.map(_.count).sum > 0).foreach { fs =>
      assert(fs.size <= 2, s"expected <=2 files after span-capped compaction, got ${fs.size}")
    }
    // rows, offsets and order preserved
    assert(PolarLog.consume(spark, cfg).count() === before)
    // and validation guards the admin face
    intercept[IllegalArgumentException] {
      graft.log.TopicProps.validate(graft.log.TopicProps.SegmentMs, "0")
    }
  }
}
