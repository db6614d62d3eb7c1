package graft.tools

import graft.SparkEntry

/** Round-5 batch-4 plan audit: analytics family, weighted sample,
  * recursive CTE, lateral, IVF-PQ, MMR. NOT part of the shipped library. */
object R5cPlanProbe {
  val R5c = Seq("events_cohort_retention", "q_rfm", "events_scd2",
    "profile_columns", "graph_pagerank", "sample_weighted",
    "q_recursive_cte", "q_lateral_topk", "sim_ann_ivfpq", "sim_mmr_select")
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.get()
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    R5c.foreach { name =>
      println(s"===== $name =====")
      SparkEntry.queries(name)(spark, dir).explain("formatted")
    }
    spark.stop()
  }
}
