package graft.tools

import graft.{GraftSession, Tables}
import org.apache.spark.sql.functions._

/** Generate a K×-scaled derivative of a harness sf directory for
  * scale-slope experiments (VERDICT r14 directive 4: measured slopes past
  * sf0.1) — `runMain graft.tools.MakeScale <srcDir> <dstDir> [k=10]`.
  *
  * Scaling model: K disjoint replicas with per-replica ID REMAPPING
  * (event/user/doc/vec ids offset by replica × (max+1)), so graph gates
  * see K disjoint subgraphs (the honest "10× more data" shape, not a
  * densified graph with different asymptotics) and keyed gates see K× the
  * keys. Document text gets a per-replica prefix so near-duplicate
  * structure stays predominantly per-replica instead of exploding into
  * K-cliques of exact cross-replica duplicates. Embedding vectors are
  * carried as-is (ids differ; ANN timing is id-blind). Timestamps are
  * carried as-is: same time range, K× the concurrent keys — how a bigger
  * deployment actually looks. Remaining tables are not consumed by the
  * slope gates and are copied 1×. */
object MakeScale {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: MakeScale <srcDir> <dstDir> [k]")
    val (src, dst) = (args(0), args(1))
    val k = args.lift(2).map(_.toInt).getOrElse(10)
    val spark = GraftSession.get()
    import spark.implicits._
    val reps = (0 until k).toDF("r")

    val ev = Tables.events(spark, src)
    val (maxE, maxU) = ev.agg(max("event_id"), max("user_id"))
      .as[(Long, Long)].head()
    ev.crossJoin(broadcast(reps))
      .select((col("event_id") + col("r") * (maxE + 1)).as("event_id"),
        col("ts"), (col("user_id") + col("r") * (maxU + 1)).as("user_id"),
        col("event_type"), col("value"), col("props"))
      .repartition(32)
      .write.mode("overwrite").parquet(s"$dst/events.parquet")

    val docs = Tables.documents(spark, src)
    val maxD = docs.agg(max("doc_id")).as[Long].head()
    docs.crossJoin(broadcast(reps))
      .select((col("doc_id") + col("r") * (maxD + 1)).as("doc_id"),
        when(col("r") === 0, col("text"))
          .otherwise(concat(format_string("r%d ", col("r")), col("text")))
          .as("text"),
        col("lang"), col("source"),
        when(col("r") === 0, col("n_chars"))
          .otherwise(col("n_chars") + length(format_string("r%d ", col("r"))))
          .as("n_chars"))
      .repartition(32)
      .write.mode("overwrite").parquet(s"$dst/documents.parquet")

    val embs = Tables.embeddings(spark, src)
    val maxV = embs.agg(max("vec_id")).as[Long].head()
    embs.crossJoin(broadcast(reps))
      .select((col("vec_id") + col("r") * (maxV + 1)).as("vec_id"),
        col("embedding"), col("label"))
      .repartition(32)
      .write.mode("overwrite").parquet(s"$dst/embeddings.parquet")

    // remaining tables: 1× copies so every Tables loader resolves
    val fs = new org.apache.hadoop.fs.Path(dst)
      .getFileSystem(graft.log.HadoopConf.shared)
    Seq("lineitem", "orders", "customer", "supplier", "part", "nation", "region")
      .foreach { t =>
        // delete-then-copy: a re-run onto an existing dstDir must replace
        // the copy outright — FileUtil.copy descends INTO an existing
        // DIRECTORY destination before the overwrite flag is consulted
        // (nesting t.parquet/t.parquet; consumers then read zero rows)
        val dstP = new org.apache.hadoop.fs.Path(s"$dst/$t.parquet")
        if (fs.exists(dstP)) fs.delete(dstP, true)
        org.apache.hadoop.fs.FileUtil.copy(fs,
          new org.apache.hadoop.fs.Path(s"$src/$t.parquet"), fs,
          dstP, false, true, fs.getConf)
      }
    println(s"PROBE wrote ${k}x of $src to $dst: events=${maxE + 1}->${(maxE + 1) * k} " +
      s"docs=${maxD + 1}->${(maxD + 1) * k} vecs=${maxV + 1}->${(maxV + 1) * k}")
    spark.stop()
  }
}
