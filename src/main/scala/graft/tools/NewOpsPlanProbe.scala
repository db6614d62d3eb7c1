package graft.tools
import graft.SparkEntry

/** One-off: plan shapes of the round-4 operators (bm25, vocab, logprob,
  * sq8, knn join, bucketed join) — simple-string explain per query. */
object NewOpsPlanProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.get()
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val names = if (args.nonEmpty) args.toSeq
      else Seq("text_bm25", "text_vocab", "text_logprob", "text_boilerplate",
        "sim_ann_sq8", "sim_knn_join", "q_bucketed_join", "pipeline_stratified")
    for (n <- names) {
      println(s"==== $n")
      val df = SparkEntry.queries(n)(spark, dir)
      println(df.queryExecution.executedPlan.toString.linesIterator
        .map(_.take(160)).mkString("\n"))
    }
    spark.stop()
  }
}
