package graft.operators

import graft.GraftSession
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Invariants for synchronous label propagation and PMI collocations. */
class LabelPropCollocSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = GraftSession.builder(master = "local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def edges(pairs: Seq[(Long, Long)]) = {
    val s = spark
    import s.implicits._
    val raw = pairs.toDF("a", "b")
    raw.select(col("a").as("src"), col("b").as("dst"))
      .unionAll(raw.select(col("b").as("src"), col("a").as("dst")))
  }

  test("labelPropagation: disjoint cliques each converge to their min id") {
    val e = edges(Seq(
      (1L, 2L), (2L, 3L), (1L, 3L),               // triangle A
      (10L, 11L), (11L, 12L), (10L, 12L),          // triangle B
      (20L, 21L), (21L, 22L), (20L, 22L), (20L, 23L), (21L, 23L), (22L, 23L)))
    val out = Analytics.labelPropagation(e, rounds = 4)
      .orderBy(col("community")).collect()
    assert(out.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq ===
      Seq((1L, 3L, 1L), (10L, 3L, 10L), (20L, 4L, 20L)))
  }

  test("labelPropagation is deterministic under input partitioning") {
    val pairs = for (i <- 1 to 40) yield (i.toLong, ((i * 7) % 40 + 1).toLong)
    val clean = pairs.filter { case (a, b) => a != b }
    val a = Analytics.labelPropagation(edges(clean).repartition(1), rounds = 3)
      .orderBy("community").collect().toSeq
    val b = Analytics.labelPropagation(edges(clean).repartition(13), rounds = 3)
      .orderBy("community").collect().toSeq
    assert(a === b)
  }

  test("collocations: a true collocation outranks independent co-occurrence") {
    val s = spark
    import s.implicits._
    // "aa bb" always adjacent (perfect collocation); "xx" and "yy" frequent
    // but never adjacent; "cc dd" adjacent once (below minCount)
    val docs = (1 to 10).map(i => (i.toLong, "aa bb xx pad" + i + " yy")) :+
      (11L, "cc dd xx yy pad") :+ (12L, "xx pad yy")
    val df = docs.toDF("doc_id", "text")
    val out = TextAnalysis.collocations(df, "text", "doc_id", minCount = 5, k = 10)
      .collect()
    val top = out.head
    assert(top.getString(0) === "aa bb")
    // perfect collocation: c12 = c1 = c2 = 10, pmi = ln(N/10)
    val n = docs.map(_._2.split("\\s+").length).sum
    assert(math.abs(top.getDouble(2) - math.log(n / 10.0)) < 1e-6)
    assert(!out.map(_.getString(0)).contains("cc dd"), "below minCount must be gated")
  }
}
