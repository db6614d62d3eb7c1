package graft.tools

import graft.log._
import org.apache.hadoop.fs.Path
import java.nio.file.Files

/** Scale-slope audit for the recovery machinery (temporary evidence tool):
  * vacuum sweep time vs pendingDeletes ledger size (1e2 vs 1e4 entries),
  * routed-journal recovery vs journal count, and producer-transaction
  * recovery vs transaction count — each should scale linear-or-better in
  * its worklist, independent of topic data size. */
object LedgerSlope {
  def main(args: Array[String]): Unit = {
    val s = graft.GraftSession.builder(master = "local[8]")
      .config("spark.sql.shuffle.partitions", "8").getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    def timeMs[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f; (r, (System.nanoTime() - t0) / 1e6)
    }

    // --- vacuum vs ledger size ---
    Seq(100, 10000).foreach { n =>
      val root = Files.createTempDirectory("slope_vac").toString
      val cfg = TopicConfig(root, "t", 1, 2)
      val rows = s.range(50).selectExpr("cast(id as string) as partitionKey",
        "timestamp_micros(id) as timestamp", "cast(id as string) as value")
      PolarLog.produce(rows, cfg)
      // synthesize a due ledger of n entries over files already gone (the
      // steady-state shape after out-of-band reclamation): vacuum must
      // walk + prune all of them in one CAS
      val due = System.currentTimeMillis() - 1000L
      LogMetadata.compareAndSet(cfg, LogMetadata.read(cfg))(cur =>
        cur.copy(pendingDeletes = Vector.tabulate(n)(i =>
          PendingDelete(i % 2, f"ghost$i%06d.parquet", due))))
      val (_, warm) = timeMs(PolarLog.vacuum(cfg))
      val left = LogMetadata.read(cfg).pendingDeletes.size
      println(f"SLOPE vacuum ledger=$n%6d  ${warm}%8.1f ms  (left=$left)")
    }

    // --- routed-journal recovery vs journal count ---
    Seq(10, 1000).foreach { n =>
      val root = Files.createTempDirectory("slope_jr").toString
      val tpl = RingTemplate(root, 1, 2)
      val cfg = tpl.topicConfig("t")
      val rows = s.range(50).selectExpr("cast(id as string) as partitionKey",
        "timestamp_micros(id) as timestamp", "cast(id as string) as value")
      PolarLog.produce(rows, cfg)
      val entries = LogMetadata.read(cfg).files
      // complete journals whose topics all REGISTERED (the roll-forward
      // no-op classification — one registry read per topic per journal)
      (0 until n).foreach(_ => TxnJournal.write(root,
        Map("t" -> entries), Some("sink" -> 1L)))
      val (resolved, ms) = timeMs(
        graft.sources.PolarRoutedWrite.recoverJournals(tpl, graceMs = 0L,
          nowMs = System.currentTimeMillis() + 1000L))
      println(f"SLOPE journals n=$n%5d  ${ms}%8.1f ms  (resolved=$resolved)")
    }

    // --- producer-txn recovery vs txn count ---
    Seq(10, 1000).foreach { n =>
      val root = Files.createTempDirectory("slope_tx").toString
      (0 until n).foreach(i =>
        Transactions.begin(root, f"tx$i%04d", timeoutMs = 1L))
      val (resolved, ms) = timeMs(Transactions.recover(root,
        nowMs = System.currentTimeMillis() + 60000L))
      println(f"SLOPE producer-txns n=$n%5d  ${ms}%8.1f ms  (resolved=$resolved)")
    }
    s.stop()
  }
}
