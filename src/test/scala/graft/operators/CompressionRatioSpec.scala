package graft.operators

import graft.GraftSession
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Invariants for the DEFLATE redundancy signal (no SQL oracle exists for
  * zlib, so the gate's correctness lives here). */
class CompressionRatioSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = GraftSession.builder(master = "local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("repetitive text compresses below prose; gibberish barely compresses") {
    val s = spark
    import s.implicits._
    val rng = new scala.util.Random(7)
    val docs = Seq(
      (1L, "spam ham " * 200),
      (2L, ("the quick brown fox jumps over the lazy dog and then wanders " +
        "through a long meadow describing everything it sees in detail ") * 8),
      (3L, Seq.fill(1600)(('a' + rng.nextInt(26)).toChar).mkString))
      .toDF("doc_id", "text")
    val r = TextAnalysis.compressionRatio(docs, "text", "doc_id")
      .collect().map(x => x.getLong(0) -> x.getDouble(3)).toMap
    assert(r(1L) < r(2L) && r(2L) < r(3L))
    assert(r(3L) > 0.5, "random chars must stay near-incompressible")
    assert(r(1L) < 0.05, "pure repetition must collapse")
  }

  test("golden frame hash at sf0.01: the gate's exact content is pinned") {
    // the driver's correctness row for text_compression_ratio is rows-only
    // (zlib is not replayable in SQL) — this hash is its hard signal: one
    // order-independent digest over the full (doc_id, raw_len, comp_len)
    // frame at the driver's own scale factor. Deflater level-6 output is
    // deterministic for a given JDK lineage (zlib's fixed algorithm); a JDK
    // swap that changes compressed lengths fails HERE, loudly, instead of
    // silently shifting the gate's dump.
    val r = TextAnalysis.compressionRatio(
      graft.Tables.documents(spark, "/root/testdata/sf0.01"), "text", "doc_id")
    val row = r.agg(
      count(lit(1)).as("n"),
      bit_xor(xxhash64(col("doc_id"), col("raw_len"), col("comp_len"))).as("h"),
      sum(col("raw_len")).as("raw"), sum(col("comp_len")).as("comp"))
      .head()
    val digest = (row.getLong(0), row.getLong(1), row.getLong(2), row.getLong(3))
    assert(digest === ((500L, -7480950026147948700L, 149174L, 74349L)),
      s"golden digest moved: $digest")
  }

  test("ratio is deterministic and raw_len matches utf-8 bytes") {
    val s = spark
    import s.implicits._
    val docs = (1 to 50).map(i => (i.toLong, s"document body $i " * (i % 7 + 1)))
      .toDF("doc_id", "text")
    val a = TextAnalysis.compressionRatio(docs, "text", "doc_id")
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2))).sortBy(_._1)
    val b = TextAnalysis.compressionRatio(docs.repartition(9), "text", "doc_id")
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2))).sortBy(_._1)
    assert(a.toSeq === b.toSeq)
    assert(a.forall { case (_, raw, comp) => raw > 0 && comp > 0 })
  }
}
