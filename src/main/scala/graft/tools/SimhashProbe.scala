package graft.tools

import graft.{GraftSession, Tables}
import org.apache.spark.sql.functions._

/** Measures where dedup_simhash's time goes at sf0.1: fingerprint compute
  * vs banding join, and whether the self-join recomputes the md5 pipeline
  * on both sides (exchange reuse). */
object SimhashProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.builder(master = "local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = Tables.documents(spark, sfDir).filter(col("doc_id") % 5 === 0)
    // warmup
    docs.limit(1).count()

    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"PROBE $label: ${(System.nanoTime() - t0) / 1e9}%.2fs rows=$n")
    }

    time("fingerprints_only") {
      docs.select(graft.operators.Dedup.md5Simhash(
        graft.operators.TextAnalysis.tokens(col("text")))).count()
    }
    time("current_pairs") {
      graft.operators.Dedup.md5SimhashPairs(docs, "text", "doc_id", 8).count()
    }
    val fps = docs.select(col("doc_id").as("id"),
      graft.operators.Dedup.md5Simhash(
        graft.operators.TextAnalysis.tokens(col("text"))).as("simhash"))
      .localCheckpoint()
    val chunks = (0 until 4).map(c => struct(lit(c).as("chunk_idx"),
      shiftright(col("simhash"), c * 15).bitwiseAND(lit(0x7fffL)).as("chunk_val")))
    val chunked = fps.withColumn("chunk", explode(array(chunks: _*)))
      .select(col("id"), col("simhash"), col("chunk.chunk_idx"), col("chunk.chunk_val"))
      .localCheckpoint()
    time("chunked_count") { chunked.count() }
    val cand = chunked.as("a").join(chunked.as("b"),
      col("a.chunk_idx") === col("b.chunk_idx") &&
        col("a.chunk_val") === col("b.chunk_val") &&
        col("a.id") < col("b.id"))
    time("candidates") { cand.count() }
    time("after_dropdup") {
      cand.select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        col("a.simhash").as("h_a"), col("b.simhash").as("h_b"))
        .dropDuplicates("id_a", "id_b").count()
    }
    time("full_from_checkpointed_chunked") {
      cand.select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        col("a.simhash").as("h_a"), col("b.simhash").as("h_b"))
        .dropDuplicates("id_a", "id_b")
        .withColumn("hamming", bit_count(col("h_a").bitwiseXOR(col("h_b"))))
        .filter(col("hamming") <= 8)
        .select(col("id_a"), col("id_b"), col("hamming")).count()
    }
    time("second_run_current_pairs") {
      graft.operators.Dedup.md5SimhashPairs(docs, "text", "doc_id", 8).count()
    }
    spark.stop()
  }
}
