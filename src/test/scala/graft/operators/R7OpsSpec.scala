package graft.operators

import graft.GraftSession
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import java.nio.file.Files

/** Semantics of the round-7 operators: IVF index compaction, winnowing
  * near-dup pairs, duplicated-n-gram mass. */
class R7OpsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = GraftSession.builder(master = "local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def parquetFiles(dir: java.io.File): Seq[java.io.File] =
    Option(dir.listFiles()).getOrElse(Array.empty).toIndexedSeq
      .flatMap { f =>
        if (f.isDirectory) parquetFiles(f)
        else if (f.getName.endsWith(".parquet") && !f.getName.startsWith("_")
          && !f.getName.startsWith(".")) Seq(f)
        else Seq.empty
      }

  test("ivfIndexCompact: merges append tails, preserves rows and probe answer") {
    val sp = spark; import sp.implicits._
    val rnd = new scala.util.Random(11)
    val vecs = (1L to 60L).map(i =>
      (i, Array.fill(8)(rnd.nextFloat() * 2f - 1f).toSeq))
    val df = vecs.toDF("vec_id", "embedding")
    val centroids = vecs.take(4).map(_._2.map(_.toDouble))
    val root = Files.createTempDirectory("ivf_cpt_spec").toString
    val path = s"$root/ivf"
    Similarity.ivfIndexWrite(df.filter($"vec_id" <= 20), "embedding", "vec_id",
      centroids, path)
    Similarity.ivfIndexAppend(df.filter($"vec_id" > 20 && $"vec_id" <= 40),
      "embedding", "vec_id", centroids, path)
    Similarity.ivfIndexAppend(df.filter($"vec_id" > 40), "embedding", "vec_id",
      centroids, path)
    val qv = vecs.head._2.map(_.toFloat)
    val before = Similarity.ivfIndexProbe(spark, path, centroids, qv, 10, 2)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val filesBefore = parquetFiles(new java.io.File(path)).size
    val rowsBefore = spark.read.parquet(path).count()

    val n = Similarity.ivfIndexCompact(spark, path, smallBytes = 64L << 20,
      minRun = 2)
    assert(n >= 1, "expected at least one cell compacted")
    val filesAfter = parquetFiles(new java.io.File(path)).size
    assert(filesAfter < filesBefore,
      s"file count should drop: $filesBefore -> $filesAfter")
    assert(spark.read.parquet(path).count() === rowsBefore)
    // content identical: same ids, same cells
    val after = Similarity.ivfIndexProbe(spark, path, centroids, qv, 10, 2)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(after === before)
    // idempotent once everything per cell is one file and minRun=2
    assert(Similarity.ivfIndexCompact(spark, path) === 0)
  }

  test("winnowPairs: shared long substring pairs, disjoint docs don't") {
    val sp = spark; import sp.implicits._
    val shared = "the quick brown fox jumps over the lazy dog again and again"
    val docs = Seq(
      (1L, s"alpha begins here $shared and then one tail"),
      (2L, s"totally different opening $shared closing words differ"),
      (3L, "nothing in common with anyone else at all zebra quilt")
    ).toDF("doc_id", "text")
    val pairs = Dedup.winnowPairs(docs, "text", "doc_id",
        k = 8, w = 4, minShared = 2, maxDf = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
    graft.Materialize.release()
  }

  test("winnowPairs: maxDf drops corpus-wide boilerplate fingerprints") {
    val sp = spark; import sp.implicits._
    val boiler = "copyright notice all rights reserved forever and ever amen"
    // every doc shares ONLY the boilerplate; df cap of 2 kills those fps
    val docs = (1L to 5L).map(i =>
      (i, s"unique preamble number $i goes here $boiler"))
      .toDF("doc_id", "text")
    val pairs = Dedup.winnowPairs(docs, "text", "doc_id",
        k = 8, w = 4, minShared = 1, maxDf = 2)
      .collect()
    assert(pairs.isEmpty)
    graft.Materialize.release()
  }

  test("winnowFpSet: per-row expression equals the batch window formulation") {
    val sfDocs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .filter(col("doc_id") % 7 === 0)
    val batch = TextAnalysis.winnowingFingerprints(sfDocs, "text", "doc_id",
        k = 8, w = 4)
      .select(col("doc_id"), col("fp")).distinct()
    val perRow = sfDocs.select(col("doc_id"),
        explode(TextAnalysis.winnowFpSet(col("text"), k = 8, w = 4)).as("fp"))
      .distinct()
    assert(perRow.exceptAll(batch).isEmpty && batch.exceptAll(perRow).isEmpty)
    assert(batch.count() > 0)
  }

  test("sceneCuts: flags exactly the frame pairs whose luma diff crosses the threshold") {
    val sp = spark; import sp.implicits._
    // 3 frames: flat 10s, flat 10s (no cut), flat 200s (cut: 64*190 = 12160)
    val grids = Seq(Array.fill(64)(10), Array.fill(64)(10), Array.fill(64)(200))
    val out = new java.io.ByteArrayOutputStream()
    val dos = new java.io.DataOutputStream(out)
    grids.foreach { g =>
      val png = MediaCodec.encodeGrayPng(g, 8, 8)
      dos.writeInt(png.length); dos.write(png)
    }
    val media = Seq(graft.operators.MediaRecord(
      7L, out.toByteArray, "video/x-framed", 8, 8)).toDS()
    val cuts = Multimodal.sceneCuts(media, threshold = 1500L).collect()
      .map(c => c.frame_idx -> (c.diff_sum, c.is_cut)).toMap
    assert(cuts === Map(1 -> (0L, 0L), 2 -> (64L * 190, 1L)))
  }

  test("dupNgramMass: exact ppm on a hand-checked document") {
    val sp = spark; import sp.implicits._
    // words: a b c a b c a b -> 3-grams: "a b c","b c a","c a b","a b c",
    // "b c a","c a b" -> each of the 3 distinct grams occurs 2x.
    // total_chars = 6 grams * 5 chars = 30, dup_chars = 30, ppm = 1000000
    val docs = Seq((1L, "a b c a b c a b"), (2L, "x y z w")).toDF("doc_id", "text")
    val got = TextAnalysis.dupNgramMass(docs, "text", "doc_id", n = 3)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(got(1L) === ((6L, 30L, 30L, 1000000L)))
    // doc 2: grams "x y z","y z w" distinct -> dup 0
    assert(got(2L) === ((2L, 0L, 10L, 0L)))
  }
}
