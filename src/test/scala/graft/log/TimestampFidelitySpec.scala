package graft.log

import graft.{GraftSession, Tables}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/**
 * End-to-end envelope-precision contract at sf0.01: micros timestamps
 * survive produce→consume EXACTLY. The reference stores the record
 * timestamp at microsecond precision in the envelope
 * (`/root/reference/internal/producing/models.go:146-150`); any loader or
 * serving regression that truncates, shifts (timezone), or re-derives a
 * timestamp shows up here as a multiset mismatch — the serving-layer
 * counterpart of FixtureContractSpec, guarding the path the fixture break
 * of round 5 reached through `Tables.events`.
 */
class TimestampFidelitySpec extends AnyFunSuite with BeforeAndAfterAll {

  private val sfDir = "/root/testdata/sf0.01"
  private var spark: SparkSession = _
  private var root: String = _

  override def beforeAll(): Unit = {
    spark = GraftSession.builder(master = "local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    root = java.nio.file.Files.createTempDirectory("graft_ts_fidelity").toString
  }

  override def afterAll(): Unit = {
    if (spark != null) spark.stop()
    if (root != null) {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).getOrElse(Array.empty).foreach(rm)
        f.delete()
      }
      rm(new java.io.File(root))
    }
  }

  test("events survive produce->consume with exact micros timestamps") {
    val cfg = TopicConfig(root, "ts_fidelity")
    val source = Tables.events(spark, sfDir).select(
      col("user_id").cast("string").as("partitionKey"),
      col("ts").as("timestamp"),
      to_json(struct(col("event_id"), col("event_type"), col("value"))).as("value"))

    PolarLog.produce(source, cfg, orderBy = Seq(col("timestamp"), col("value")))
    val consumed = PolarLog.consume(spark, cfg)

    val srcN = source.count()
    assert(consumed.count() == srcN, "row count changed through the log")

    // exact multiset equality on (key, micros, payload): catches truncation
    // to millis, timezone shifts, and per-record reassignment — not just
    // aggregate drift
    def canon(df: org.apache.spark.sql.DataFrame) = df.select(
      col("partitionKey"),
      unix_micros(col("timestamp")).as("us"),
      col("value").cast("string").as("payload"))
    val srcC = canon(source)
    val conC = canon(consumed)
    assert(conC.exceptAll(srcC).isEmpty, "consumed rows not in source")
    assert(srcC.exceptAll(conC).isEmpty, "source rows missing from consumed")

    // sub-millisecond residue must be non-trivial in the fixture itself,
    // or the exactness assertion above would pass vacuously at millis
    // precision
    val subMs = srcC.filter(col("us") % 1000 =!= 0).count()
    assert(subMs > 0, "fixture carries no sub-millisecond timestamps; " +
      "micros-fidelity check is vacuous")
  }
}
