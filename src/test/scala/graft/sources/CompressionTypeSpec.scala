package graft.sources

import graft.GraftSession
import graft.log.{HadoopConf, LogMetadata, PolarLog, TopicConfig, TopicProps}
import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Per-topic `compression.type` (Kafka parity): every write path seals the
  * topic's parquet with its configured codec — direct produce, the
  * cleaner's kc rewrites, and compaction merges — and the data round-trips
  * identically under all of them. */
class CompressionTypeSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private var root: String = _

  override def beforeAll(): Unit = {
    spark = GraftSession.builder(master = "local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    root = Files.createTempDirectory("polar_codec_spec").toString
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def produceKeyed(cfg: TopicConfig, tag: String, keys: Range): Unit = {
    val s = spark; import s.implicits._
    PolarLog.produce(keys.map(k => (k.toString, s"$tag:$k" * 20))
      .toDF("partitionKey", "v")
      .selectExpr("partitionKey", "current_timestamp() AS timestamp",
        "CAST(v AS BINARY) AS value"), cfg)
  }

  private def codecOf(path: String): String = {
    val r = ParquetFileReader.open(
      HadoopInputFile.fromPath(new Path(path), HadoopConf.shared))
    try r.getFooter.getBlocks.get(0).getColumns.get(0).getCodec.name
    finally r.close()
  }

  private def withCodec(topic: String, codec: String): TopicConfig = {
    val cfg = TopicConfig(root, topic)
    LogMetadata.updateProps(cfg)(_ + (TopicProps.CompressionType -> codec))
    cfg
  }

  test("produce seals segments with the topic's codec; content round-trips identically") {
    val gz = withCodec("c_gzip", "gzip")
    val un = withCodec("c_uncomp", "uncompressed")
    val lz = withCodec("c_lz4", "lz4")
    val zs = TopicConfig(root, "c_default") // no prop -> zstd
    Seq(gz, un, lz, zs).foreach(produceKeyed(_, "v1", 0 until 60))
    def firstFile(cfg: TopicConfig): String = {
      val m = LogMetadata.read(cfg)
      m.files.head.path(cfg)
    }
    assert(codecOf(firstFile(gz)) === "GZIP")
    assert(codecOf(firstFile(un)) === "UNCOMPRESSED")
    assert(codecOf(firstFile(lz)) === "LZ4_RAW")
    assert(codecOf(firstFile(zs)) === "ZSTD")
    // identical content under every codec
    def view(cfg: TopicConfig) = PolarLog.consume(spark, cfg)
      .selectExpr("partitionKey", "CAST(value AS STRING)")
      .collect().map(r => (r.getString(0), r.getString(1))).sorted.toSeq
    assert(view(gz) === view(zs) && view(un) === view(zs) && view(lz) === view(zs))
    // uncompressed is measurably larger than zstd for repetitive text
    val bytesUn = LogMetadata.read(un).files.map(_.bytes).sum
    val bytesZs = LogMetadata.read(zs).files.map(_.bytes).sum
    assert(bytesUn > bytesZs, s"uncompressed $bytesUn vs zstd $bytesZs")
    // validator: unknown codecs refuse; Kafka's 'producer' is accepted
    intercept[IllegalArgumentException] {
      TopicProps.validate(TopicProps.CompressionType, "brotli")
    }
    assert(TopicProps.validate(TopicProps.CompressionType, "producer"))
    assert(PolarWrite.effectiveCodec(Map(TopicProps.CompressionType -> "producer"))
      === org.apache.parquet.hadoop.metadata.CompressionCodecName.ZSTD)
  }

  test("cleaner rewrites and compaction merges keep the topic's codec") {
    val cfg = withCodec("c_clean", "gzip")
    produceKeyed(cfg, "v1", 0 until 40)
    produceKeyed(cfg, "v2", 0 until 40)
    produceKeyed(cfg, "seal", 9000 until 9200)
    assert(PolarLogCleaner.cleanKeys(spark, cfg) === 40L)
    val kc = LogMetadata.read(cfg).files.filter(_.name.startsWith("kc"))
    assert(kc.nonEmpty)
    kc.foreach(f => assert(codecOf(f.path(cfg)) === "GZIP",
      s"cleaned segment ${f.name} must keep the topic codec"))
    // compaction merge keeps it too
    if (PolarCompaction.compact(spark, cfg, smallBytes = 1L << 30) > 0) {
      LogMetadata.read(cfg).files.filter(_.name.startsWith("cp"))
        .foreach(f => assert(codecOf(f.path(cfg)) === "GZIP"))
    }
    // and the compacted view is intact
    val v = PolarLog.consumeCompacted(spark, cfg)
      .selectExpr("partitionKey", "CAST(value AS STRING)").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(v("3") === "v2:3" * 20)
  }
}
