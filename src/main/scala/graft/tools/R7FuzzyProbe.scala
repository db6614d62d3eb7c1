package graft.tools

import graft.{GraftSession, Tables}
import org.apache.spark.sql.functions._

/** Round-7 measurement: band-collision candidate count for the re-banded
  * `decontaminate_fuzzy` (word-3-gram shingles, 64 hashes / 16 bands of
  * r=4) vs the r6 parameterization (unigrams, r=2) that degenerated to
  * all-pairs (measured 83.8M raw band collisions from 5k docs at sf0.1).
  * `runMain graft.tools.R7FuzzyProbe [sfDir]` */
object R7FuzzyProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    val spark = GraftSession.get()
    val tagged = Tables.documents(spark, dir)
      .withColumn("split", graft.operators.Sampling.splitTag(col("doc_id"), 90, 5))
      .filter(col("split") =!= "val")
    val nDocs = tagged.count()

    def collisions(shingleK: Int, numHashes: Int, bands: Int): (Long, Long) = {
      val rows = numHashes / bands
      val seeds = graft.operators.Dedup.xorSeeds(numHashes)
      val base = tagged.select(col("doc_id").as("id"),
          graft.operators.Dedup.shingles(col("text"), shingleK).as("sh"))
        .withColumn("sig", graft.functions.GraftFunctions.xor_minhash(
          transform(col("sh"), x => graft.operators.Dedup.md5Hash60(x)), seeds))
      val banded = base.select(col("id"), col("sig")).withColumn("band",
          explode(transform(sequence(lit(0), lit(bands - 1)),
            b => struct(b.as("band_idx"),
              xxhash64(slice(col("sig"), b * rows + 1, lit(rows)), b).as("band_hash")))))
        .select(col("id"), col("band.band_idx"), col("band.band_hash"))
      val raw = banded.as("a").join(banded.as("b"),
          col("a.band_idx") === col("b.band_idx") &&
            col("a.band_hash") === col("b.band_hash") &&
            col("a.id") < col("b.id")).count()
      val distinct = banded.as("a").join(banded.as("b"),
          col("a.band_idx") === col("b.band_idx") &&
            col("a.band_hash") === col("b.band_hash") &&
            col("a.id") < col("b.id"))
        .select(col("a.id"), col("b.id")).distinct().count()
      (raw, distinct)
    }

    val (r7raw, r7dist) = collisions(3, 64, 16)
    println(f"PROBE fuzzy r7 (k=3, 64/16): docs=$nDocs raw_collisions=$r7raw distinct_candidates=$r7dist allpairs=${nDocs * (nDocs - 1) / 2}")
    spark.stop()
  }
}
