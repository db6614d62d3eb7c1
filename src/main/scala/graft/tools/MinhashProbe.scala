package graft.tools

import graft.Tables
import graft.operators.Dedup
import org.apache.spark.sql.functions._

/** One-off: stage-by-stage timing of the md5 minhash LSH pipeline. */
object MinhashProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.get()
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"STAGE $label ${(System.nanoTime() - t0) / 1e9}%.2f"); r
    }
    val df = Tables.documents(spark, dir).filter(col("doc_id") % 10 === 0)
    val seeds = Dedup.xorSeeds(32)
    val docs = df.select(col("doc_id").as("id"), Dedup.shingles(col("text"), 1).as("sh"))
    time("warmup")(docs.count())
    time("shingles")(docs.count())
    val sig = docs.withColumn("sig", graft.functions.GraftFunctions.xor_minhash(
      transform(col("sh"), x => Dedup.md5Hash60(x)), seeds))
    time("sig")(sig.count())
    val banded = sig.withColumn("band",
        explode(transform(sequence(lit(0), lit(15)),
          b => struct(b.as("band_idx"), slice(col("sig"), b * 2 + 1, lit(2)).as("band_val")))))
      .select(col("id"), col("sh"), col("band.band_idx"), col("band.band_val"))
    time("banded")(banded.count())
    val cand = banded.as("a").join(banded.as("b"),
        col("a.band_idx") === col("b.band_idx") &&
          col("a.band_val") === col("b.band_val") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        col("a.sh").as("sh_a"), col("b.sh").as("sh_b"))
    time("join")(cand.count())
    val dd = cand.dropDuplicates("id_a", "id_b")
    time("dropdup")(dd.count())
    val fin = dd.withColumn("sim", Dedup.jaccardSorted(col("sh_a"), col("sh_b")))
      .filter(col("sim") >= 0.8)
    time("verify")(fin.count())
    time("full_repeat")(Dedup.md5MinhashLshPairs(df, "text", "doc_id", 1, 32, 16, 0.8).count())
    spark.stop()
  }
}
