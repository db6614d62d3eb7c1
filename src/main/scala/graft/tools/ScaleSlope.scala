package graft.tools

import graft.{GraftSession, Materialize, SparkEntry}

/** Scale-slope experiment: run a gate list at TWO scale factors in ONE
  * JVM/session and report per-gate wall-time ratios —
  * `runMain graft.tools.ScaleSlope <g1,g2,...> <smallDir> <bigDir>`.
  *
  * Each (gate, sf) runs TWICE; the slope uses the WARM run (fixtures
  * built, stages JIT'd), so the ratio measures how the PLAN scales with
  * data, not fixture/compilation amortization. Data scales bigDir/smallDir
  * (10× for sf0.01 → sf0.1); a warm ratio far above that flags
  * super-linear work (global sorts, O(rounds × data) BSP, d² aggregates)
  * that would bite at 100 TB. */
object ScaleSlope {
  def main(args: Array[String]): Unit = {
    require(args.length == 3, "usage: ScaleSlope <g1,g2,...> <smallDir> <bigDir>")
    val gates = args(0).split(",").map(_.trim).filter(_.nonEmpty)
    val (small, big) = (args(1), args(2))
    val spark = GraftSession.get()
    spark.sparkContext.setLogLevel("WARN")

    def time(name: String, dir: String): Double = {
      val t0 = System.nanoTime()
      try { SparkEntry.queries(name)(spark, dir).count() }
      catch { case e: Throwable =>
        System.err.println(s"[slope] $name@$dir failed: ${e.getMessage}")
      }
      val dt = (System.nanoTime() - t0) / 1e9
      Materialize.sweep(spark)
      dt
    }

    println("PROBE gate,small_cold,small_warm,big_cold,big_warm,warm_ratio")
    gates.foreach { g =>
      val sc = time(g, small); val sw = time(g, small)
      val bc = time(g, big); val bw = time(g, big)
      println(f"PROBE $g,$sc%.2f,$sw%.2f,$bc%.2f,$bw%.2f,${bw / math.max(sw, 1e-9)}%.1f")
      System.gc()
    }
    spark.stop()
  }
}
