package graft.tools

import graft.log.{ConsumerGroups, LogMetadata, PolarLog, TopicConfig}
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Phase-level profile of the repartition/resize gates (temporary audit
  * utility): times produce / consume+produce / projection / final-agg
  * separately and reports root-doc read counts per phase. */
object ProfileResize {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val s = graft.GraftSession.builder(master = "local[32]")
      .config("spark.sql.shuffle.partitions", "32").getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    def phase[T](name: String)(f: => T): T = {
      val r0 = LogMetadata.rootReads.get()
      val t0 = System.nanoTime()
      val r = f
      println(f"PROFILE $name%-28s ${(System.nanoTime() - t0) / 1e9}%6.2f s  " +
        f"rootReads=${LogMetadata.rootReads.get() - r0}")
      r
    }
    // warm the session once so phase times are not JIT noise
    graft.Tables.events(s, sfDir).limit(1).count()
    (1 to 2).foreach { round =>
      println(s"--- round $round ---")
      val root = Files.createTempDirectory("graft_prof_rz").toString
      val cfg = TopicConfig(root, "events", clusterSize = 3)
      val records = graft.Tables.events(s, sfDir).select(
        col("user_id").cast("string").as("partitionKey"),
        col("ts").as("timestamp"), col("props").as("value"))
      phase("produce(15k)") {
        PolarLog.produce(records, cfg,
          orderBy = Seq(col("timestamp"), col("value"), col("partitionKey")))
      }
      val half = phase("tails+commit") {
        val h = PolarLog.tails(cfg).map { case (p, t) => p -> t / 2 }
        ConsumerGroups.commit(cfg, "mid", h)
        h
      }
      val res = phase("repartitionTopic 3->6") {
        graft.log.TopicOps.repartitionTopic(s, cfg, "events_v2", 6)
      }
      phase("poll+agg") {
        ConsumerGroups.poll(s, res.newCfg, "mid").records
          .groupBy(col("partitionKey")).agg(count(lit(1)).as("n_served")).count()
      }
      println(s"  half=${half.values.sum} moved=${res.recordsMoved}")
    }
    s.stop()
  }
}
