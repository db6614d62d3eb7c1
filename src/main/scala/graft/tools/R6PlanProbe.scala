package graft.tools

import graft.SparkEntry

/** Round-6 plan audit: the reworked triangle plan (exchange reuse + AQE
  * runtime broadcast, no driver-side count) and the real-codec gates
  * (input for PLANS.md). NOT part of the shipped library. */
object R6PlanProbe {
  val R6 = Seq("graph_triangles", "multimodal_codec", "multimodal_codec_audio",
    "sim_kmeans", "graph_kcore", "dedup_sorted_neighbors",
    "events_resample", "sim_ann_recall")
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.get()
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val names = if (args.nonEmpty) args.toSeq else R6
    names.foreach { name =>
      println(s"===== $name =====")
      SparkEntry.queries(name)(spark, dir).explain("formatted")
    }
    spark.stop()
  }
}
