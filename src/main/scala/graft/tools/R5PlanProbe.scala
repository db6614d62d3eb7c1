package graft.tools

import graft.SparkEntry

/** Round-5 plan audit: the new operators' physical shapes (input for
  * PLANS.md). NOT part of the shipped library — measurement harness. */
object R5PlanProbe {
  val R5 = Seq("dedup_paragraph", "dedup_paragraph_rebuild", "dedup_incremental",
    "sim_ann_pq", "sim_linear_probe", "sim_embed_cov", "pipeline_token_mixture",
    "sim_class_centroids")
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.get()
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    R5.foreach { name =>
      println(s"===== $name =====")
      SparkEntry.queries(name)(spark, dir).explain("formatted")
    }
    spark.stop()
  }
}
