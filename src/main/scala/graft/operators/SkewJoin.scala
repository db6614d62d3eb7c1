package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Manual skew mitigation for large-large joins whose key distribution is
 * pathological even for AQE (a handful of keys holding a large fraction of
 * rows): salt the skewed side's key into `saltFactor` sub-keys and explode
 * the other side across all salts, restoring exact join semantics while
 * spreading each hot key over `saltFactor` tasks.
 *
 * At 100 TB this is the difference between one straggler task holding a
 * hot key's entire partition and `saltFactor` tasks sharing it. AQE's
 * skew-join splitting (enabled in GraftSession) handles moderate skew
 * automatically; this operator is the explicit tool for the extreme tail.
 */
object SkewJoin {

  /**
   * Inner-join `skewed` with `other` on `skewed(key) === other(key)`,
   * salting the skewed side. Exact same rows as a plain inner join.
   */
  def saltedInnerJoin(
      skewed: DataFrame,
      other: DataFrame,
      key: String,
      saltFactor: Int = 8): DataFrame = {
    val salted = skewed.withColumn("__salt",
      pmod(xxhash64(monotonically_increasing_id()), lit(saltFactor)).cast("int"))
    val exploded = other.withColumnRenamed(key, "__other_key").withColumn("__salt",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    salted.join(exploded,
        salted(key) === exploded("__other_key") &&
          salted("__salt") === exploded("__salt"))
      .drop("__salt", "__other_key")
  }
}
