package graft.tools
import graft.SparkEntry

/** Re-times a few fixed queries back-to-back to separate machine noise
  * from real regressions (each run cold-plans but shares the JVM). */
object VarianceProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.get()
    val dir = "/root/testdata/sf0.1"
    val names = if (args.nonEmpty) args.toSeq else Seq("sim_pairs", "decontaminate")
    (1 to 3).foreach { round =>
      names.foreach { n =>
        val t0 = System.nanoTime()
        SparkEntry.queries(n)(spark, dir).count()
        println(f"PROBE $n round$round: ${(System.nanoTime() - t0) / 1e9}%.2fs")
      }
    }
    spark.stop()
  }
}
