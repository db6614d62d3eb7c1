package graft.tools

import graft.{GraftSession, Materialize, SparkEntry}

/** Fresh-JVM single-gate timer: `runMain graft.tools.GateTime <name> [reps]`
  * against `SPARK_GRAFT_SF_DIR` — the number the bench row is compared to
  * when diagnosing session-accumulation vs real query cost. */
object GateTime {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse(sys.error("usage: GateTime <query> [reps]"))
    val reps = if (args.length > 1) args(1).toInt else 2
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.get()
    val fn = SparkEntry.queries(name)
    for (i <- 1 to reps) {
      val t0 = System.nanoTime()
      val n = fn(spark, dir).count()
      println(f"PROBE $name run$i: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
      Materialize.sweep(spark)
    }
    spark.stop()
  }
}
