package graft.tools

import graft.Tables
import graft.log.{LogMetadata, PolarLog, TopicConfig}
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** One-off: read-side cost of a fragmented registry vs the compacted one —
  * 40 per-request-sized produces, then the same consume+aggregate before
  * and after PolarCompaction. */
object CompactionProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.get()
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val root = Files.createTempDirectory("cp_probe").toString
    val cfg = TopicConfig(root, "frag")
    val slices = 40
    for (r <- 0 until slices)
      PolarLog.produce(
        Tables.events(spark, dir).filter(pmod(col("event_id"), lit(slices)) === r)
          .select(col("user_id").cast("string").as("partitionKey"),
            col("ts").as("timestamp"), col("props").as("value")),
        cfg, orderBy = Seq(col("timestamp"), col("value")))
    def consumeAgg(): Long =
      PolarLog.consume(spark, cfg).groupBy(col("partitionKey"))
        .agg(count(lit(1))).count()
    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"PROBE $label ${(System.nanoTime() - t0) / 1e9}%.2fs rows=$n " +
        s"files=${LogMetadata.read(cfg).files.size}")
    }
    time("warm")(consumeAgg())
    time("fragmented_1")(consumeAgg())
    time("fragmented_2")(consumeAgg())
    val merged = graft.sources.PolarCompaction.compact(spark, cfg)
    println(s"PROBE merged_runs $merged")
    time("compacted_1")(consumeAgg())
    time("compacted_2")(consumeAgg())
    spark.stop()
  }
}
