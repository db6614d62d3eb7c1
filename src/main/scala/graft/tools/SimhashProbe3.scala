package graft.tools

import graft.{GraftSession, SparkEntry, Tables}
import org.apache.spark.sql.functions._

/** Bench-faithful timing of dedup_simhash: fresh JVM, same warmup and the
  * alphabetically-preceding dedup queries first, exactly as Bench runs. */
object SimhashProbe3 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.builder(master = "local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000L).groupBy((col("id") % 7).as("g"))
      .agg(count(lit(1))).count()
    Tables.lineitem(spark, sfDir).limit(1).count()
    Tables.documents(spark, sfDir).limit(1).count()
    Tables.events(spark, sfDir).limit(1).count()

    val order = Seq("decontaminate", "dedup_char_jaccard", "dedup_clusters",
      "dedup_exact", "dedup_jaccard_pairs", "dedup_minhash_lsh", "dedup_simhash")
    order.foreach { name =>
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir).count()
      println(f"PROBE $name: ${(System.nanoTime() - t0) / 1e9}%.2fs")
    }
    spark.stop()
  }
}
