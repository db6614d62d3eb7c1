package graft.tools

import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Stage timing for the duplicated-spans pipeline at sf0.1.
  * NOT part of the shipped library. */
object SpanProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.get()
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val docs = graft.Tables.documents(spark, dir)

    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"PROBE $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    val inst = Dedup.ngramInstances(docs, "text", "doc_id", 8)
    timed("inst count (x2 to see recompute cost)") {
      println("inst=" + inst.count()); println("inst=" + inst.count())
    }
    val dup = inst.groupBy(col("gram"))
      .agg(countDistinct(col("doc_id")).as("n_docs"))
      .filter(col("n_docs") > 1)
    timed("dup agg count")(println("dup=" + dup.count()))
    timed("full duplicatedSpans")(
      println("out=" + Dedup.duplicatedSpans(docs, "text", "doc_id", 8).count()))
    timed("full duplicatedSpans again")(
      println("out=" + Dedup.duplicatedSpans(docs, "text", "doc_id", 8).count()))
    spark.stop()
  }
}
