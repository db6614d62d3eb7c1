package graft.tools

import graft.SparkEntry

/** Dumps formatted physical plans of headline queries (input for PLANS.md —
  * the per-operator scale audit). */
object PlanAudit {
  val Headline = Seq("q1_agg", "q3_join_topk", "q5_multi_join", "q_window_rank",
    "q_salted_join", "dedup_minhash_lsh", "sim_topk", "polar_roundtrip",
    "q_approx_distinct", "decontaminate")
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.get()
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    Headline.foreach { name =>
      println(s"===== $name =====")
      SparkEntry.queries(name)(spark, dir).explain("formatted")
    }
    spark.stop()
  }
}
