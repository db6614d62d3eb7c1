package graft.tools

import graft.log._
import java.nio.file.Files

/** Scale-slope audit for `read_committed` planning under producer-txn mark
  * load (r14 evidence tool): [[Transactions.readCommittedView]] cost vs the
  * number of DISTINCT marked transactions in one topic's registry, for the
  * three state shapes a planner meets — all-open (one tiny state read per
  * id), all-unknown (ONE directory listing short-circuits every id), and
  * the zero-marks fast path (no I/O at all). Each should be linear or
  * better in the id count and independent of topic data size. */
object TxnViewSlope {
  def main(args: Array[String]): Unit = {
    def timeMs[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f; (r, (System.nanoTime() - t0) / 1e6)
    }
    Seq(10, 100, 1000).foreach { n =>
      val root = Files.createTempDirectory("slope_txnview").toString
      val cfg = TopicConfig(root, "t", 1, 2)
      LogMetadata.write(cfg, LogMetadata.empty(cfg))
      val handles = (0 until n).map(i => Transactions.begin(root, f"txn$i%05d"))
      LogMetadata.casWithRetry(cfg) { cur =>
        cur.copy(
          filesByPart = Map(
            0 -> Vector.tabulate(n)(i => FileEntry(0, f"m$i%05d.parquet",
              i * 10L, i * 10L + 9, 10, 100, 1L,
              txn = Some(f"txn$i%05d"), txnEpoch = handles(i).epoch)),
            1 -> Vector.tabulate(n)(i => FileEntry(1, f"p$i%05d.parquet",
              i * 10L, i * 10L + 9, 10, 100, 1L))),
          producerOffsets = Vector(n * 10L, n * 10L))
      }
      val meta = LogMetadata.read(cfg)
      val (v1, cold) = timeMs(Transactions.readCommittedView(root, meta))
      val (_, warm) = timeMs(Transactions.readCommittedView(root, meta))
      require(v1.filesByPart(0).isEmpty && v1.filesByPart(1).size == n)
      println(f"SLOPE rc-view OPEN    ids=$n%5d  cold=$cold%8.1f ms  warm=$warm%8.1f ms")

      // all-unknown: ids that never began — one listing resolves them all
      val root2 = Files.createTempDirectory("slope_txnview_u").toString
      val cfg2 = TopicConfig(root2, "t", 1, 2)
      LogMetadata.write(cfg2, LogMetadata.empty(cfg2))
      LogMetadata.casWithRetry(cfg2) { cur =>
        cur.copy(
          filesByPart = Map(0 -> Vector.tabulate(n)(i =>
            FileEntry(0, f"m$i%05d.parquet", i * 10L, i * 10L + 9, 10, 100, 1L,
              txn = Some(f"gone$i%05d"), txnEpoch = -1L))),
          producerOffsets = Vector(n * 10L, 0L))
      }
      val meta2 = LogMetadata.read(cfg2)
      val (v2, unk) = timeMs(Transactions.readCommittedView(root2, meta2))
      require(v2.filesByPart(0).size == n) // Unknown legacy marks = committed
      println(f"SLOPE rc-view UNKNOWN ids=$n%5d  one-listing=$unk%8.1f ms")

      // zero marks: the steady state — must cost nothing
      val plain = meta.copy(filesByPart = meta.filesByPart.map { case (p, fs) =>
        p -> fs.map(_.copy(txn = None, txnEpoch = -1L)) })
      val (_, zero) = timeMs(Transactions.readCommittedView(root, plain))
      println(f"SLOPE rc-view ZERO    ids=$n%5d  fast-path=$zero%8.3f ms")
    }
  }
}
