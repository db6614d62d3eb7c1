package graft.tools

import graft.{GraftSession, Tables}
import org.apache.spark.sql.functions._

/** Round-7 plan audit: formatted plans of the new operators, checked for
  * the shapes PLANS.md claims (partial aggregation on the dup-ngram mass,
  * no re-computation legs in winnowPairs, no corpus shuffle in the fusion
  * legs). `runMain graft.tools.R7PlanProbe [sfDir]` */
object R7PlanProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = GraftSession.get()
    val docs = Tables.documents(spark, dir)

    println("=== dupNgramMass ===")
    graft.operators.TextAnalysis.dupNgramMass(docs, "text", "doc_id", 3)
      .explain("formatted")

    println("=== winnowPairs ===")
    graft.operators.Dedup.winnowPairs(
      docs.filter(col("doc_id") % 5 === 0), "text", "doc_id").explain("formatted")

    println("=== rank_fusion ===")
    graft.SparkEntry.queries("rank_fusion")(spark, dir).explain("formatted")

    println("=== text_dup_ngram_mass wholestage check ===")
    val p = graft.operators.TextAnalysis.dupNgramMass(docs, "text", "doc_id", 3)
      .queryExecution.executedPlan.toString
    println("WholeStageCodegen spans: " +
      "WholeStageCodegen".r.findAllIn(p).size)
    spark.stop()
  }
}
