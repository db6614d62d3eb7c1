package graft.tools

import graft.GraftSession

/** Micro-probe for the long-tail floor (guide §1/§7.3): how much driver
  * time does ONE `spark.read.parquet` resolution cost (file listing +
  * footer schema + DataSource resolution), vs the action itself? The
  * bench battery re-resolves the same ~10 fixture paths ~300 times; this
  * measures what a session-scoped relation memo could save.
  * `runMain graft.tools.ReadProbe [reps]` against SPARK_GRAFT_SF_DIR.
  */
object ReadProbe {
  def main(args: Array[String]): Unit = {
    val reps = args.headOption.map(_.toInt).getOrElse(10)
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.get()
    spark.sparkContext.setLogLevel("WARN")
    // warm: JIT + first-touch codec init
    spark.read.parquet(s"$dir/lineitem.parquet").count()
    for (name <- Seq("lineitem", "events", "documents")) {
      var resolveMs = 0.0
      var countMs = 0.0
      for (_ <- 1 to reps) {
        val t0 = System.nanoTime()
        val df = spark.read.parquet(s"$dir/$name.parquet")
        df.queryExecution.analyzed // force analysis
        val t1 = System.nanoTime()
        df.count()
        val t2 = System.nanoTime()
        resolveMs += (t1 - t0) / 1e6
        countMs += (t2 - t1) / 1e6
      }
      println(f"READPROBE $name: resolve=${resolveMs / reps}%.1fms/call " +
        f"count=${countMs / reps}%.1fms/call (avg of $reps)")
      // variant: schema supplied explicitly (no footer inference) — what a
      // per-path schema memo would make every subsequent load cost
      val schema = spark.read.parquet(s"$dir/$name.parquet").schema
      var withSchemaMs = 0.0
      for (_ <- 1 to reps) {
        val t0 = System.nanoTime()
        val df = spark.read.schema(schema).parquet(s"$dir/$name.parquet")
        df.queryExecution.analyzed
        withSchemaMs += (System.nanoTime() - t0) / 1e6
      }
      println(f"READPROBE $name: resolveWithSchema=${withSchemaMs / reps}%.1fms/call")
    }
    spark.stop()
  }
}
