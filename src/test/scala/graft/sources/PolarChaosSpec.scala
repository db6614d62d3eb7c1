package graft.sources

import graft.GraftSession
import graft.log.{LogMetadata, PolarLog, TopicConfig}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import java.nio.file.Files
import java.util.concurrent.Executors
import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration._

/** Three-way race: producers appending, the compactor merging runs
  * (deferred-delete mode so in-flight planners stay readable), and a
  * reader consuming throughout. The invariants a 100 TB operator cares
  * about: no lost or duplicated records, dense per-partition offsets,
  * monotonically growing counts at every read. */
class PolarChaosSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private val sfDir = "/root/testdata/sf0.001"

  override def beforeAll(): Unit = {
    spark = GraftSession.builder(master = "local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("produce/compact/consume race: dense offsets, no loss, monotone reads") {
    val root = Files.createTempDirectory("polar_chaos").toString
    val cfg = TopicConfig(root, "chaos")
    val events = graft.Tables.events(spark, sfDir)
    val total = events.count()
    def slice(rem: Int, of: Int) = events
      .filter(pmod(col("event_id"), lit(of)) === rem)
      .select(col("user_id").cast("string").as("partitionKey"),
        col("ts").as("timestamp"), col("props").as("value"))

    val pool = Executors.newFixedThreadPool(3)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    @volatile var producing = true
    val producer = Future {
      (0 until 8).foreach(r => PolarLog.produce(slice(r, 8), cfg))
      producing = false
    }
    val compactor = Future {
      var merged = 0
      while (producing) {
        // deferred-delete: superseded files stay readable for planners
        // holding the pre-compaction registry
        merged += PolarCompaction.compact(spark, cfg,
          smallBytes = 1L << 30, minRun = 2, deleteOriginals = false)
        Thread.sleep(30)
      }
      merged
    }
    val reader = Future {
      var last = 0L
      var reads = 0
      while (producing) {
        val n = try PolarLog.consume(spark, cfg).count()
        catch { case _: Exception => last } // topic may not exist yet
        assert(n >= last, s"read went backwards: $n < $last")
        last = n
        reads += 1
        Thread.sleep(20)
      }
      reads
    }
    Await.result(producer, 300.seconds)
    val mergedRuns = Await.result(compactor, 300.seconds)
    val reads = Await.result(reader, 300.seconds)
    pool.shutdown()

    // every record exactly once
    val consumed = PolarLog.consume(spark, cfg)
    assert(consumed.count() === total)
    // dense offsets per partition: count == span, all offsets distinct
    val byPart = consumed.groupBy(col("part"))
      .agg(count(lit(1)).as("n"), (max(col("offset")) + 1).as("span"),
        countDistinct(col("offset")).as("d"))
      .collect()
    byPart.foreach { r =>
      assert(r.getLong(1) === r.getLong(2) && r.getLong(1) === r.getLong(3),
        s"partition ${r.getInt(0)}: ${r.toString}")
    }
    // a final compaction pass + vacuum leaves the same data
    PolarCompaction.compact(spark, cfg, smallBytes = 1L << 30, minRun = 2,
      deleteOriginals = false)
    PolarLog.vacuum(cfg, dataGraceMs = 0L)
    assert(PolarLog.consume(spark, cfg).count() === total)
    assert(reads >= 0 && mergedRuns >= 0) // raced activity completed sanely
  }

  test("cleaner vs producer race: view converges to latest-per-key, nothing lost") {
    val root = Files.createTempDirectory("polar_chaos_kc").toString
    val cfg = TopicConfig(root, "chaoskc")
    val spark2 = spark; import spark2.implicits._
    def produceRound(tag: Int): Unit = PolarLog.produce(
      (0 until 80).map(k => (k.toString, s"r$tag:$k")).toDF("partitionKey", "v")
        .selectExpr("partitionKey", "current_timestamp() AS timestamp",
          "CAST(v AS BINARY) AS value"),
      cfg)
    produceRound(0)
    val pool = Executors.newFixedThreadPool(2)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    @volatile var producing = true
    val producer = Future {
      (1 until 8).foreach { r => produceRound(r); Thread.sleep(15) }
      producing = false
    }
    val cleaner = Future {
      var removed = 0L
      while (producing) {
        // deferred deletes: pre-clean planners stay readable
        removed += PolarLogCleaner.cleanKeys(spark, cfg,
          deleteOriginals = false)
        Thread.sleep(25)
      }
      removed
    }
    Await.result(producer, 300.seconds)
    val removedRaced = Await.result(cleaner, 300.seconds)
    pool.shutdown()
    // convergence: a final clean + the compacted view == last round's values
    PolarLogCleaner.cleanKeys(spark, cfg, deleteOriginals = false)
    val view = PolarLog.consumeCompacted(spark, cfg)
      .selectExpr("partitionKey", "CAST(value AS STRING)")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(view.size === 80)
    (0 until 80).foreach(k => assert(view(k.toString) === s"r7:$k"))
    // registry is sane: every registered file on disk, ranges disjoint,
    // tails untouched by cleaning (8 rounds x 80 records)
    val meta = LogMetadata.read(cfg)
    assert(meta.producerOffsets.sum === 640L)
    meta.filesByPart.foreach { case (p, files) =>
      val sorted = files.sortBy(_.minOffset)
      sorted.sliding(2).foreach {
        case Seq(a, b) => assert(a.maxOffset < b.minOffset,
          s"overlapping ranges in partition $p: $a / $b")
        case _ => ()
      }
      files.foreach { f =>
        assert(java.nio.file.Files.exists(
          java.nio.file.Paths.get(f.path(cfg))),
          s"registered file missing on disk: ${f.name}")
      }
    }
    // vacuum reclaims the deferred originals; the data is unchanged
    PolarLog.vacuum(cfg, dataGraceMs = 0L)
    assert(PolarLog.consumeCompacted(spark, cfg).count() === 80L)
    assert(removedRaced >= 0L)
  }

  test("overwrite vs producer race: replace is atomic, offsets dense, no dangling files") {
    val root = Files.createTempDirectory("polar_chaos_ovw").toString
    val cfg = TopicConfig(root, "ovw")
    val events = graft.Tables.events(spark, sfDir)
    def slice(rem: Int, of: Int) = events
      .filter(pmod(col("event_id"), lit(of)) === rem)
      .select(col("user_id").cast("string").as("partitionKey"),
        col("ts").as("timestamp"), col("props").as("value"))
    PolarLog.produce(slice(0, 4), cfg)

    val pool = Executors.newFixedThreadPool(2)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    // a producer appending while an overwrite replaces: whichever CAS
    // lands second decides — the append's records either got replaced
    // (landed first) or survive whole (landed after)
    val appender = Future { PolarLog.produce(slice(1, 4), cfg) }
    val replacer = Future {
      PolarLog.produce(slice(2, 4), cfg, replaceAll = true) }
    Await.result(appender, 4.minutes)
    Await.result(replacer, 4.minutes)
    pool.shutdown()

    val rows = PolarLog.consume(spark, cfg)
    val overwriteN = events.filter(pmod(col("event_id"), lit(4)) === 2).count()
    val appendN = events.filter(pmod(col("event_id"), lit(4)) === 1).count()
    // all-or-nothing: the overwrite slice is always fully present; the
    // appended slice is fully present or fully replaced, never partial
    val n = rows.count()
    assert(n === overwriteN || n === overwriteN + appendN, s"n=$n")
    // dense per-partition offsets over whatever survived is NOT expected —
    // replace trims the head; what MUST hold: registered files exist on
    // disk, offsets within each file are dense, and no registered range
    // overlaps another
    val meta = LogMetadata.read(cfg)
    val fs = new org.apache.hadoop.fs.Path(cfg.dir)
      .getFileSystem(graft.log.HadoopConf.shared)
    meta.files.foreach { f =>
      assert(fs.exists(new org.apache.hadoop.fs.Path(f.path(cfg))),
        s"registered file missing: ${f.name}")
      assert(f.maxOffset - f.minOffset + 1 === f.count)
    }
    meta.filesByPart.values.foreach { files =>
      files.sliding(2).foreach {
        case Vector(a, b) => assert(a.maxOffset < b.minOffset)
        case _ => ()
      }
    }
    // consumed offsets match the registry exactly (no phantom rows)
    assert(rows.count() === meta.files.map(_.count).sum)
    // vacuum reports nothing dangling beyond the replaced originals it
    // may still find; after vacuum, disk state == registry state
    PolarLog.vacuum(cfg, dataGraceMs = 0L)
    assert(PolarLog.consume(spark, cfg).count() === n)
  }
}
