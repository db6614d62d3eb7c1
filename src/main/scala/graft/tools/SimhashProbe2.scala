package graft.tools

import graft.{GraftSession, Tables}
import org.apache.spark.sql.functions._

/** Fresh-JVM cold-cost split for dedup_simhash: planning vs execution. */
object SimhashProbe2 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.builder(master = "local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = Tables.documents(spark, sfDir).filter(col("doc_id") % 5 === 0)
    docs.limit(1).count() // parquet reader init only

    var t0 = System.nanoTime()
    val df = graft.operators.Dedup.md5SimhashPairs(docs, "text", "doc_id", 8)
    println(f"PROBE build+checkpoint: ${(System.nanoTime() - t0) / 1e9}%.2fs")
    t0 = System.nanoTime()
    df.queryExecution.executedPlan
    println(f"PROBE planning: ${(System.nanoTime() - t0) / 1e9}%.2fs")
    t0 = System.nanoTime()
    val n = df.count()
    println(f"PROBE execution: ${(System.nanoTime() - t0) / 1e9}%.2fs rows=$n")
    spark.stop()
  }
}
