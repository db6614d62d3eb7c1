package graft.tools

import graft.{GraftSession, Tables}
import org.apache.spark.sql.functions._

/** Round-8 plan audit: explain("formatted") of the new operators at
  * sf0.01 — leakage-safe split, HNSW probe family — plus job-count notes.
  * Findings land in PLANS.md. */
object R8PlanProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder(master = "local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.01"

    println("=== leakageSafeSplit (aggregated gate shape) ===")
    val docs = Tables.documents(spark, dir)
    val rep = docs.select(col("doc_id"),
      min(col("doc_id")).over(org.apache.spark.sql.expressions.Window
        .partitionBy(col("text"))).as("rep"))
    val pairs = rep.filter(col("doc_id") =!= col("rep"))
      .select(col("rep").as("id_a"), col("doc_id").as("id_b"))
    val split = graft.operators.Sampling.leakageSafeSplit(docs, "doc_id", pairs)
    split.groupBy(col("split")).agg(count(lit(1)).as("n_docs"))
      .explain("formatted")

    println("=== hnswTopK (in-memory, merge shape) ===")
    val emb = Tables.embeddings(spark, dir)
    val qv = emb.filter(col("vec_id") === 0)
      .head().getAs[scala.collection.Seq[Float]]("embedding").toSeq
    graft.operators.Similarity.hnswTopK(
      emb.filter(col("vec_id") =!= 0), "embedding", "vec_id", qv, 20)
      .explain("formatted")

    println("=== hnswIndexProbe (persisted, reconstruction shape) ===")
    val path = java.nio.file.Files.createTempDirectory("r8_probe_idx").toString
    graft.operators.Similarity.hnswIndexWrite(
      emb.filter(col("vec_id") =!= 0), "embedding", "vec_id", path, shards = 8)
    graft.operators.Similarity.hnswIndexProbe(spark, path, qv, 10)
      .explain("formatted")

    println("=== hnswIndexProbeBatch (rank-window merge) ===")
    graft.operators.Similarity.hnswIndexProbeBatch(
      spark, path, Seq((0L, qv), (1L, qv)), 5)
      .explain("formatted")

    spark.stop()
  }
}
