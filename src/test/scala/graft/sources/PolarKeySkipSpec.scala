package graft.sources

import graft.GraftSession
import graft.log.{PolarLog, TopicConfig}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import java.nio.file.Files

/** The file-internal pruning tier of a point lookup: pushed partitionKey
  * values ride into every split and become a parquet
  * stats/dictionary/bloom predicate, so within the key's OWNING partition
  * (already narrowed by placement) the reader skips whole row groups of
  * segments that provably don't hold the key — the read-path analog of the
  * reference's sparse index seek, applied to the key dimension.
  *
  * The fixture produces TWO commits with disjoint key alphabets
  * (`a<i>` then `b<i>`), so each partition holds one segment per commit
  * and a lookup of an `a`-key must decode only the first segment's rows. */
class PolarKeySkipSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private var cfg: TopicConfig = _

  override def beforeAll(): Unit = {
    spark = GraftSession.builder(master = "local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val root = Files.createTempDirectory("polar_keyskip").toString
    cfg = TopicConfig(root, "events")
    def slice(prefix: String) = graft.Tables.events(spark, "/root/testdata/sf0.001")
      .select(concat(lit(prefix), col("user_id") % 50).as("partitionKey"),
        col("ts").as("timestamp"), col("props").as("value"))
    PolarLog.produce(slice("a"), cfg)
    PolarLog.produce(slice("b"), cfg)
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def read: DataFrame = spark.read.format("polar")
    .option("root", cfg.root).option("topic", cfg.topic).load()

  /** Sum a custom SQL metric over the executed plan's scan nodes. */
  private def metric(df: DataFrame, name: String): Long = {
    df.collect()
    val plan = df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case p => p
    }
    plan.collectLeaves().flatMap(
      _.metrics.collectFirst { case (n, m) if n == name => m.value }).sum
  }

  test("point lookup decodes only segments that can hold the key") {
    val key = "a7"
    val df = read.filter(col("partitionKey") === key)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("keys=1,"), plan)

    val planned = metric(read.filter(col("partitionKey") === key), "polarRowsPlanned")
    val decoded = metric(read.filter(col("partitionKey") === key), "polarRowsDecoded")
    // the owning partition holds one `a`-segment and one `b`-segment with
    // roughly equal row counts; the b-segment's dictionary excludes "a7",
    // so its row group never decodes
    assert(decoded > 0L)
    assert(decoded < planned,
      s"expected the b-commit row group skipped: decoded=$decoded planned=$planned")
    assert(decoded <= planned / 2 + planned / 8,
      s"decoded=$decoded planned=$planned — skipped less than one of two segments")

    // exactness: every row of the key survives the pruning tiers
    val expect = PolarLog.consume(spark, cfg)
      .filter(col("partitionKey") === key).count()
    assert(df.count() === expect && expect > 0)
  }

  test("IN over both alphabets decodes both segments; missing key decodes none") {
    val both = read.filter(col("partitionKey").isin("a3", "b3"))
    assert(metric(both, "polarRowsDecoded") > 0L)
    val expect = PolarLog.consume(spark, cfg)
      .filter(col("partitionKey").isin("a3", "b3")).count()
    assert(both.count() === expect && expect > 0)

    // a key no segment holds: the partition set still plans (placement
    // can't rule it out) but every row group's dictionary excludes it
    val missing = read.filter(col("partitionKey") === "zz9")
    assert(missing.count() === 0L)
    assert(metric(missing, "polarRowsDecoded") === 0L)
  }

  test("null-key rows never leak through a pushed key predicate") {
    val root2 = Files.createTempDirectory("polar_keyskip_null").toString
    val cfg2 = TopicConfig(root2, "ev")
    PolarLog.produce(graft.Tables.events(spark, "/root/testdata/sf0.001")
      .select(when(col("event_id") % 3 === 0, col("user_id").cast("string"))
          .as("partitionKey"),
        col("ts").as("timestamp"), col("props").as("value")), cfg2)
    val df = spark.read.format("polar")
      .option("root", cfg2.root).option("topic", cfg2.topic).load()
    val got = df.filter(col("partitionKey") === "5").count()
    val expect = PolarLog.consume(spark, cfg2)
      .filter(col("partitionKey") === "5").count()
    assert(got === expect)
    // EqualNullSafe pushes too; <=> null is never pushed as a key
    assert(df.filter(col("partitionKey") <=> "5").count() === expect)
    val nulls = df.filter(col("partitionKey").isNull).count()
    assert(nulls > 0, "fixture must carry null keys")
  }

  test("count(*) under a key filter still decodes (no registry shortcut)") {
    // the aggregate-pushdown COMPLETE path refuses when filters are
    // present; with a key filter the count must come from decoded rows
    val n = read.filter(col("partitionKey") === "a1").count()
    val expect = PolarLog.consume(spark, cfg)
      .filter(col("partitionKey") === "a1").count()
    assert(n === expect && n > 0)
  }
}
