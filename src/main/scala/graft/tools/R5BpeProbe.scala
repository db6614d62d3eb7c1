package graft.tools

import graft.operators.TextAnalysis

/** Trains the gate's fixed BPE merge table on sf0.01 (deterministic:
  * ordered word table, lexicographic tie-breaks) and prints it as Scala
  * source + sanity piece counts. The printed list is hard-coded in
  * PipelineQueries so the gate and its oracle share one static artifact. */
object R5BpeProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.builder().getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.01")
    val merges = TextAnalysis.bpeTrain(docs, "text", numMerges = 32)
    println("MERGES:")
    println(merges.map { case (a, b) => s"""("$a", "$b")""" }.mkString(", "))
    val enc = new graft.functions.BpeEncoder(merges)
    Seq("the quick brown fox", "information retrieval systems")
      .foreach { s =>
        val u = org.apache.spark.unsafe.types.UTF8String.fromString(s)
        println(s"'$s' -> count=${enc.countDoc(u)}")
      }
    spark.stop()
  }
}
