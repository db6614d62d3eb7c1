package graft.tools
import graft.SparkEntry

/** Prints the physical plans of the round-4b additions for PLANS.md. */
object R4PlanProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.get()
    spark.sparkContext.setLogLevel("WARN")
    val names = if (args.nonEmpty) args.toSeq
      else Seq("pipeline_shuffle", "dedup_semantic", "q_exists_subquery",
        "q_array_funcs", "q_string_agg")
    names.foreach { n =>
      println(s"\n===== $n =====")
      SparkEntry.queries(n)(spark, "/root/testdata/sf0.01").explain("formatted")
    }
    spark.stop()
  }
}
