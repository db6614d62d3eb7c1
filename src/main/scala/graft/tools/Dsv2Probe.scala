package graft.tools

import graft.GraftSession
import graft.log.{PolarLog, TopicConfig}
import org.apache.spark.sql.functions._

/** Probe the DSv2 batch read path after the vectorized-reader rewrite. */
object Dsv2Probe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder("local[4]").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val root = java.nio.file.Files.createTempDirectory("dsv2probe").toString
    val cfg = TopicConfig(root, "t")
    val df = spark.range(300).selectExpr(
      "cast(id as string) as partitionKey",
      "timestamp_micros(1700000000000000 + id * 1000000) as timestamp",
      "cast(concat('v', id) as binary) as value")
    PolarLog.produce(df, cfg)
    val via = spark.read.format("polar")
      .option("root", cfg.root).option("topic", cfg.topic).load()
    println("PROBE count=" + via.count())
    println("PROBE full collect=" + via.collect().length)
    for (cols <- Seq(Seq("value"), Seq("offset"), Seq("offset", "value"),
        Seq("partitionKey"), Seq("part", "value"), Seq("topic", "offset"),
        Seq("partitionKey", "token", "offset", "timestamp", "value"))) {
      println(s"PROBE select(${cols.mkString(",")})=" +
        via.select(cols.map(col): _*).collect().length)
    }
    val r = via.agg(sum(crc32(col("value")))).head
    println("PROBE crc sum=" + r)
    spark.stop()
  }
}
