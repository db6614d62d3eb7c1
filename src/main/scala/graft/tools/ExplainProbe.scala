package graft.tools
import graft.SparkEntry
object ExplainProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.get()
    val df = SparkEntry.queries("q3_join_topk")(spark, "/root/testdata/sf0.01")
    df.explain("formatted")
    spark.stop()
  }
}
