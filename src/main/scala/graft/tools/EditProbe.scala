package graft.tools

import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Stage timing for the blocked edit-distance join at sf0.1.
  * NOT part of the shipped library. */
object EditProbe {
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

    // stage 1: normalized + blocked + q-gram hist, count after count-filter
    val d = docs.select(col("doc_id").as("id"),
        Dedup.normalizedContent(col("text")).as("t"))
      .withColumn("blk", floor(length(col("t")) / lit(32)).cast("long"))
      .withColumn("len", length(col("t")))
      .withColumn("qh", graft.functions.GraftFunctions
        .char_qgram_hist(col("t"), 3, 4096))
      .localCheckpoint()
    val commonFloor = greatest(col("a.len"), col("b.len")) - lit(2 + 3 * 30)
    val joined = d.as("a").join(d.as("b"),
      col("a.blk") === col("b.blk") && col("a.id") < col("b.id") &&
        abs(col("a.len") - col("b.len")) <= 30 &&
        graft.functions.GraftFunctions
          .qgram_common_upper(col("a.qh"), col("b.qh")) >= commonFloor)
    timed("qgram-filtered pair count")(println("pairs=" + joined.count()))
    timed("banded levenshtein over survivors") {
      println("matches=" + joined
        .select(levenshtein(col("a.t"), col("b.t"), 30).as("dist"))
        .filter(col("dist") >= 0 && col("dist") <= 30).count())
    }
    timed("native levenshtein_bounded over survivors") {
      println("matches=" + joined
        .select(graft.functions.GraftFunctions
          .levenshtein_bounded(col("a.t"), col("b.t"), 30).as("dist"))
        .filter(col("dist") >= 0 && col("dist") <= 30).count())
    }
    spark.stop()
  }
}
