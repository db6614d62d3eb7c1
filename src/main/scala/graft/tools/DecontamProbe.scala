package graft.tools

import graft.Tables
import graft.operators.{Curation, Dedup, Sampling}
import org.apache.spark.sql.functions._

/** Stage bisect for the decontaminate gate query. */
object DecontamProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.get()
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"PROBE $name -> $n rows in ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    val tagged = Tables.documents(spark, dir).withColumn("split",
      Sampling.splitTag(col("doc_id"), 90, 5))
    val train = tagged.filter(col("split") === "train")
    val test = tagged.filter(col("split") === "test")
    time("tag-count")(tagged.count())
    time("test-grams-distinct")(
      test.select(explode(Dedup.shingles(col("text"), 3)).as("gram")).distinct().count())
    time("train-explode")(
      train.select(col("doc_id"), Dedup.shingles(col("text"), 3).as("grams"))
        .select(col("doc_id"), size(col("grams")).as("n"), explode(col("grams")).as("gram"))
        .count())
    time("full")(Curation.contamination(train, test, "text", "doc_id", 3).count())
    // variant: materialize grams via a non-collapsible barrier
    time("full-again")(Curation.contamination(train, test, "text", "doc_id", 3).count())
    spark.stop()
  }
}
