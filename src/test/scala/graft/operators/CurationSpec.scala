package graft.operators

import graft.GraftSession
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

class CurationSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = GraftSession.builder(master = "local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("contamination finds exactly the train docs sharing test n-grams") {
    val sp = spark; import sp.implicits._
    val train = Seq(
      (1L, "the quick brown fox jumps over dogs"),
      (2L, "completely unrelated words appear here"),
      (3L, "quick brown fox runs fast today")).toDF("doc_id", "text")
    val test = Seq((100L, "a the quick brown fox escaped")).toDF("doc_id", "text")
    val hits = Curation.contamination(train, test, "text", "doc_id", n = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    // doc 1 shares "the quick brown" and "quick brown fox"; doc 3 shares
    // "quick brown fox"; doc 2 shares nothing
    assert(hits === Map(1L -> 2L, 3L -> 1L))
  }

  test("repetition signals on a hand-checked document") {
    val sp = spark; import sp.implicits._
    val df = Seq((1L, "a b a b a c")).toDF("doc_id", "text")
    val r = df.select(
      Curation.dupWordFrac(col("text")).as("dw"),
      Curation.topNgramCharFrac(col("text"), 2).as("top2"),
      Curation.repeatedNgramCharFrac(col("text"), 2).as("rep2")).head()
    // 6 words, 3 distinct -> dup fraction 0.5
    assert(r.getDouble(0) === 0.5)
    // 2-grams: [a b, b a, a b, b a, a c]; top = "b a" x2 (ties to the
    // lexicographically largest of the count-2 grams); share = 2*3/11
    assert(math.abs(r.getDouble(1) - math.rint(2.0 * 3 / 11 * 1e6) / 1e6) < 1e-9)
    // repeated grams: "a b" x2 and "b a" x2 -> (2*3 + 2*3)/11
    assert(math.abs(r.getDouble(2) - math.rint(12.0 / 11 * 1e6) / 1e6) < 1e-9)
  }

  test("temperature rates: flattened shares, saturating domain, determinism") {
    val counts = Seq("big" -> 900L, "mid" -> 90L, "small" -> 10L)
    val rates = Curation.temperatureRates(counts, 0.5).toMap
    // the smallest domain saturates at 1.0; bigger domains downsample
    assert(rates("small") === 1.0)
    assert(rates("big") < rates("mid") && rates("mid") < 1.0)
    // kept counts follow the α-scaled shares: kept_d / kept_e = sqrt(n_d/n_e)
    val keptBig = rates("big") * 900
    val keptMid = rates("mid") * 90
    assert(math.abs(keptBig / keptMid - math.sqrt(900.0 / 90.0)) < 1e-9)
    // α=1 is a no-op (proportional sampling keeps everything)
    Curation.temperatureRates(counts, 1.0).foreach { case (_, r) =>
      assert(math.abs(r - 1.0) < 1e-12)
    }
  }

  test("packSequences: windows fill greedily, deterministic under repartition") {
    val sp = spark; import sp.implicits._
    val df = (0 until 200).map(i => (i.toLong, 100L + i % 7)).toDF("doc_id", "nt")
    val packed = Curation.packSequences(df, "doc_id", "nt", 512, shards = 4)
      .collect().map(r => (r.getLong(2), r.getLong(3), r.getLong(1))) // shard, win, nt
    // per (shard, window): token sum stays under ctx + one straddling doc
    packed.groupBy(p => (p._1, p._2)).foreach { case ((s, w), docs) =>
      val tokens = docs.map(_._3).sum
      assert(tokens < 512 + 107, s"window ($s,$w) overfilled: $tokens")
    }
    // windows are contiguous from 0 in every shard
    packed.groupBy(_._1).foreach { case (s, ds) =>
      val wins = ds.map(_._2).distinct.sorted.toVector
      assert(wins === (0L until wins.size).toVector, s"shard $s windows: $wins")
    }
    val again = Curation.packSequences(df.repartition(13), "doc_id", "nt", 512, 4)
      .collect().map(r => (r.getLong(0), r.getLong(3))).toSet
    assert(again === Curation.packSequences(df, "doc_id", "nt", 512, 4)
      .collect().map(r => (r.getLong(0), r.getLong(3))).toSet)
  }

  test("packSequences equals a driver-side fold replay on random corpora (ScalaCheck)") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val sp = spark; import sp.implicits._
    // token counts include zeros and docs far larger than the context
    val corpusGen: Gen[List[(Long, Long)]] = for {
      n <- Gen.chooseNum(1, 120)
      ids <- Gen.pick(n, 0L until 500L)
      nts <- Gen.listOfN(n, Gen.oneOf(Gen.chooseNum(0L, 30L), Gen.chooseNum(200L, 900L)))
    } yield ids.toList.zip(nts)
    def md5h(id: Long): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(id.toString.getBytes("UTF-8"))
        .map(b => f"${b & 0xff}%02x").mkString
      java.lang.Long.parseLong(hex.take(15), 16)
    }
    val prop = Prop.forAll(corpusGen) { corpus =>
      val df = corpus.toDF("doc_id", "nt")
      val got = Curation.packSequences(df, "doc_id", "nt", 256, shards = 4)
        .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3))).toMap
      // replay: shard by hash bucket, order by (h, id), fold one cursor
      val expected = corpus
        .map { case (id, nt) => (math.floorMod(md5h(id), 4L), md5h(id), id, nt) }
        .groupBy(_._1).flatMap { case (shard, ds) =>
          var cum = 0L
          ds.sortBy(d => (d._2, d._3)).map { case (_, _, id, nt) =>
            val win = cum / 256
            cum += nt
            id -> (shard, win)
          }
        }.toMap
      got == expected
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(15), prop)
    assert(res.passed, res.status.toString)
  }

  test("packDocuments and quantileFilter accept a custom token counter / scorer") {
    val sp = spark; import sp.implicits._
    val df = (0 until 40).map(i => (i.toLong, ("word " * (i + 1)).trim))
      .toDF("doc_id", "text")
    // a stand-in "real tokenizer": 1 token per 4 characters
    val byChars: org.apache.spark.sql.Column => org.apache.spark.sql.Column =
      c => ceil(length(c) / lit(4.0)).cast("long")
    val packed = Curation.packDocuments(df, "text", "doc_id", contextLen = 64,
      shards = 2, tokenCounter = byChars)
    // counts flow from the custom counter, not subwordCount
    val expected = df.select(col("doc_id"), byChars(col("text")).as("n_tokens"))
    val viaGeneric = Curation.packSequences(expected, "doc_id", "n_tokens", 64, shards = 2)
    assert(packed.collect().toSet === viaGeneric.collect().toSet)
    val defaultPacked = Curation.packDocuments(df, "text", "doc_id", 64, shards = 2)
    assert(packed.select(sum("n_tokens")).head().getLong(0) !==
      defaultPacked.select(sum("n_tokens")).head().getLong(0))
    // quantile gate with a custom scorer: keep the longest 50% by tokens
    val kept = Curation.quantileFilter(df, "text", 0.5, scorer = byChars)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept === (20L until 40L).toSet)
  }

  test("mixtureSample membership is deterministic and rate-bounded") {
    val sp = spark; import sp.implicits._
    val df = (0 until 300).map(i => (i.toLong, if (i % 3 == 0) "a" else "b"))
      .toDF("doc_id", "lang")
    val kept1 = Curation.mixtureSample(df, "lang", "doc_id", 0.5)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val kept2 = Curation.mixtureSample(df.repartition(7), "lang", "doc_id", 0.5)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept1 === kept2) // partitioning-independent
    assert(kept1.nonEmpty && kept1.size < 300)
  }

  test("chunkDocuments: windows, overlap, tail, and empty-doc semantics") {
    val sp = spark; import sp.implicits._
    val words = (1 to 23).map(i => s"w$i")
    val df = Seq(
      (1L, words.mkString(" ")),  // 23 words: chunks of 10/5 -> 4 chunks
      (2L, "a b c"),              // shorter than one window -> 1 chunk
      (3L, "   "),                // word-empty -> no chunks
      (4L, "  x   y  ")           // ragged whitespace -> 1 chunk "x y"
    ).toDF("doc_id", "text")
    val out = Curation.chunkDocuments(df, "text", "doc_id", chunkSize = 10, overlap = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
      .sortBy(t => (t._1, t._2))

    val d1 = out.filter(_._1 == 1L)
    // ceil((23-10)/5) + 1 = 4 chunks at starts 0,5,10,15
    assert(d1.map(_._2).toSeq === Seq(0L, 1L, 2L, 3L))
    assert(d1(0)._3 === (1 to 10).map(i => s"w$i").mkString(" "))
    assert(d1(1)._3 === (6 to 15).map(i => s"w$i").mkString(" "))
    assert(d1(3)._3 === (16 to 23).map(i => s"w$i").mkString(" ")) // 8-word tail
    assert(d1.map(_._4).toSeq === Seq(10L, 10L, 10L, 8L))
    // every word appears in some chunk; adjacent chunks share `overlap` words
    assert(d1.flatMap(_._3.split(" ")).toSet === words.toSet)
    assert(d1(0)._3.split(" ").takeRight(5).toSeq === d1(1)._3.split(" ").take(5).toSeq)

    assert(out.filter(_._1 == 2L).toSeq === Seq((2L, 0L, "a b c", 3L)))
    assert(!out.exists(_._1 == 3L))
    assert(out.filter(_._1 == 4L).toSeq === Seq((4L, 0L, "x y", 2L)))
  }

  test("contaminationBloom equals exact contamination; prefilter is in the plan") {
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val train = docs.filter(col("doc_id") % 10 < 8)
    val test_ = docs.filter(col("doc_id") % 10 >= 8)
    val exact = Curation.contamination(train, test_, "text", "doc_id", n = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val bloomDf = Curation.contaminationBloom(train, test_, "text", "doc_id",
      n = 3, expectedItems = 1L << 14, numBits = 1L << 18)
    // no false negatives + confirm join -> bit-identical result set
    assert(bloomDf.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      === exact)
    // and the bloom probe actually prefilters the gram stream
    assert(bloomDf.queryExecution.executedPlan.toString.contains("might_contain"))
  }

  test("gopherFilter: rule outcomes and ordered reasons on hand-built docs") {
    val sp = spark; import sp.implicits._
    val good = ("the cat sat of the mat and a dog ran to town " +
      "with many other fine distinct words making quality prose here").trim
    val df = Seq(
      (1L, good),                                  // passes everything
      (2L, "the a of to and in words more words words here pad pad2 pad3 " +
        "pad4 pad5 pad6 pad7 pad8 pad9"),          // dup ok, 20 words, keeps
      (3L, "x " * 30),                             // dup + mean len + stopwords
      (4L, "the of unique small words")            // too_short only... plus count
    ).toDF("doc_id", "text")
    val out = Curation.gopherFilter(df, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> (r.getBoolean(2), r.getString(3))).toMap
    assert(out(1L) === ((true, "")))
    assert(out(2L) === ((true, "")))
    // doc 3: 30 copies of "x" -> dup_frac ~0.97, mean len 1, no stopwords
    assert(out(3L) === ((false, "dup_words,mean_word_len,stopwords")))
    // doc 4: 5 words with 2 stopwords, mean len fine -> only too_short
    assert(out(4L) === ((false, "too_short")))
  }

  test("chunkDocuments rejects overlap >= chunkSize") {
    val sp = spark; import sp.implicits._
    val df = Seq((1L, "a b")).toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      Curation.chunkDocuments(df, "text", "doc_id", chunkSize = 4, overlap = 4)
    }
  }
}
