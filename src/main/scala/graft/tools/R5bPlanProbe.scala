package graft.tools

import graft.SparkEntry

/** Round-5 batch-3 plan audit: chunking, token stream, bloom decontam,
  * BQ ANN, batch sessionize. NOT part of the shipped library. */
object R5bPlanProbe {
  val R5b = Seq("pipeline_chunk", "pipeline_tokenize", "decontaminate_bloom",
    "sim_ann_bq", "q_sessionize_batch")
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.get()
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    R5b.foreach { name =>
      println(s"===== $name =====")
      SparkEntry.queries(name)(spark, dir).explain("formatted")
    }
    spark.stop()
  }
}
