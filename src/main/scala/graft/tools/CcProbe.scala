package graft.tools

import graft.{GraftSession, Tables}
import graft.operators.Dedup
import org.apache.spark.sql.functions._

/** Measures where dedup_clusters' time goes: pair generation vs the CC
  * iteration machinery (rounds × per-round overhead). */
object CcProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.builder(master = "local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    GraftSession.ensureFunctions(spark)

    def time[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"PROBE $tag: ${(System.nanoTime() - t0) / 1e9}%.2fs"); r
    }

    val pairs = Dedup.md5MinhashLshPairs(
      Tables.documents(spark, sfDir).filter(col("doc_id") % 10 === 0),
      "text", "doc_id", shingleK = 1, numHashes = 32, bands = 16, threshold = 0.8)
    time("pairs count")(println("  pairs=" + pairs.count()))
    val cached = time("pairs checkpoint")(pairs.localCheckpoint())
    time("cc over checkpointed pairs") {
      val cc = Dedup.connectedComponents(cached, "id_a", "id_b")
      println("  nodes=" + cc.count())
    }
    time("cc full (as the gate runs it)") {
      val cc = Dedup.connectedComponents(pairs, "id_a", "id_b")
      println("  nodes=" + cc.count())
    }
    spark.stop()
  }
}
