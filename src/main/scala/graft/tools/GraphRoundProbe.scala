package graft.tools

import graft.{GraftSession, Materialize}
import org.apache.spark.sql.functions._

/** r16 optimization evidence: print the PHYSICAL plan and job count of one
  * k-core peel round on the co-purchase edge fixture (the per-round plan is
  * invisible in the gate's final explain — each round is checkpoint-
  * truncated). `runMain graft.tools.GraphRoundProbe` against
  * `SPARK_GRAFT_SF_DIR`. */
object GraphRoundProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.get()
    val li = graft.Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey").as("pk"))
    val raw = li.as("x").join(li.as("y"),
        col("x.l_orderkey") === col("y.l_orderkey") &&
          col("y.l_linenumber") === col("x.l_linenumber") + 1)
      .filter(col("x.pk") =!= col("y.pk"))
      .select(least(col("x.pk"), col("y.pk")).as("a"),
        greatest(col("x.pk"), col("y.pk")).as("b"))
      .distinct()
    val edges = raw.select(col("a").as("src"), col("b").as("dst"))
      .unionAll(raw.select(col("b").as("src"), col("a").as("dst")))
    val variant = args.headOption.getOrElse("new") // "old" | "new"
    val (e, rows) = Materialize.checkpointCounted(
      edges.select(col("src").cast("long"), col("dst").cast("long")))
    val k = 18
    val aliveRaw = e.groupBy(col("src")).agg(count(lit(1)).as("deg"))
      .filter(col("deg") >= k).select(col("src").as("node"))
    val next =
      if (variant == "old") {
        // the pre-r16 round shape: rename-per-side semi-joins, no hint —
        // SMJ initial plan, probe-side edge shuffle, two broadcast builds
        e.join(aliveRaw.withColumnRenamed("node", "src"), Seq("src"), "left_semi")
          .join(aliveRaw.withColumnRenamed("node", "dst"), Seq("dst"), "left_semi")
          .select(col("src"), col("dst"))
      } else {
        // the r16 shape mirroring Analytics.kCore: count-gated broadcast
        // hint + one canonical alive frame for both joins
        val threshold = org.apache.spark.sql.internal.SQLConf.get
          .autoBroadcastJoinThreshold
        val alive = if (threshold > 0 && rows * 32 < threshold)
          broadcast(aliveRaw) else aliveRaw
        e.join(alive, e("src") === alive("node"), "left_semi")
          .join(alive, e("dst") === alive("node"), "left_semi")
          .select(col("src"), col("dst"))
      }
    // run it so AQE finalizes, then print the FINAL adaptive plan
    val jobs = new java.util.concurrent.atomic.AtomicInteger
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          jobs.incrementAndGet(); ()
        }
      })
    val t0 = System.nanoTime()
    val cp = Materialize.localCheckpoint(next)
    val n = cp.count()
    Thread.sleep(500)
    println(f"ROUND: n=$n wall=${(System.nanoTime() - t0) / 1e9}%.2fs jobs=${jobs.get}")
    println(next.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode))
    spark.stop()
  }
}
