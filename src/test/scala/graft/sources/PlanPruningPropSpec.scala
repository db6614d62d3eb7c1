package graft.sources

import graft.log.{FileEntry, LogMetadata, TopicConfig}
import org.scalatest.funsuite.AnyFunSuite

/**
 * Property tests for the two plan-time kernels whose soundness is easy to
 * get subtly wrong:
 *
 *  - `minPartitions` subdivision: every (file, row) of the base plan must
 *    appear in EXACTLY one sub-split (no loss, no duplication at seams),
 *    for arbitrary file layouts, offset windows and targets;
 *  - the top-N timestamp cut: for arbitrary row populations, every row of
 *    the true top-N must live in a file that SURVIVES the cut's pruning —
 *    with adversarial stats shapes (single-row files, fully-overlapping
 *    ranges, massive duplicate timestamps).
 *
 * Both are pure metadata arithmetic, so the properties run over thousands
 * of randomized layouts with no Spark session at all.
 */
class PlanPruningPropSpec extends AnyFunSuite {

  private val rnd = new scala.util.Random(987654321L) // deterministic

  /** A random partition's file chain: dense offsets from `base`, random
    * file sizes; returns files + the underlying (offset, ts) rows. */
  private def randomChain(
      part: Int, base: Long, nRows: Int): (Vector[FileEntry], Vector[(Long, Long)]) = {
    val rows = Vector.tabulate(nRows)(i =>
      (base + i, rnd.nextInt(50).toLong)) // ts in a SMALL domain: many ties
    var off = 0
    val files = Vector.newBuilder[FileEntry]
    var idx = 0
    while (off < nRows) {
      val take = math.min(nRows - off, 1 + rnd.nextInt(7))
      val slice = rows.slice(off, off + take)
      files += FileEntry(part, s"f$part-$idx.parquet",
        slice.head._1, slice.last._1, take.toLong, 10L + take * 100L,
        createdMs = 1L,
        tsMin = slice.map(_._2).min, tsMax = slice.map(_._2).max, tsNulls = 0L)
      off += take
      idx += 1
    }
    (files.result(), rows)
  }

  test("minPartitions subdivision: every planned row exactly once, any layout") {
    for (_ <- 1 to 300) {
      val nParts = 1 + rnd.nextInt(5)
      val chains = (0 until nParts).map { p =>
        val trimmedBase = rnd.nextInt(4).toLong // retention-style gap at 0
        p -> randomChain(p, trimmedBase, 1 + rnd.nextInt(40))
      }.toMap
      val cfg = TopicConfig("/tmp/nowhere", "t", clusterSize = 1,
        rangesPerToken = nParts)
      val meta = LogMetadata(
        version = 1, clusterSize = 1, rangesPerToken = nParts,
        producerOffsets = Vector.tabulate(nParts)(p =>
          chains(p)._1.last.maxOffset + 1),
        filesByPart = chains.map { case (p, (fs, _)) => p -> fs })
      // a random sub-window per partition (may clip head and tail files)
      val start = PolarOffsets((0 until nParts).map { p =>
        val lo = chains(p)._2.head._1 + rnd.nextInt(3)
        ("t", p) -> lo
      }.toMap)
      val end = PolarOffsets((0 until nParts).map { p =>
        val hi = chains(p)._2.last._1 + 1 - rnd.nextInt(3)
        ("t", p) -> hi
      }.toMap)
      def coveredRows(splits: Array[org.apache.spark.sql.connector.read.InputPartition])
          : Seq[(Int, Long)] =
        splits.flatMap { ip =>
          val s = PolarInputPartition.unwrap(ip)
          s.files.flatMap(f =>
            (math.max(s.startOffset, f.minOffset) to
              math.min(s.endOffset - 1, f.maxOffset)).map(o => (s.part, o)))
        }.toSeq
      val basePlan = PolarMicroBatchStream.plan(
        Map("t" -> cfg), Map("t" -> meta), start, end, None)
      for (target <- Seq(1, 2, nParts + 1, nParts * 3, 64, 4096)) {
        val fanned = PolarMicroBatchStream.plan(
          Map("t" -> cfg), Map("t" -> meta), start, end, None,
          minPartitions = Some(target))
        val got = coveredRows(fanned).sorted
        val exp = coveredRows(basePlan).sorted
        assert(got == exp,
          s"target=$target: fanned coverage diverged (got ${got.size}, exp ${exp.size})")
        assert(got.distinct.size == got.size, s"target=$target: duplicated rows")
        // the fan-out is real whenever files allow it
        val maxSplits = basePlan.map(_.asInstanceOf[PolarInputPartition].files.size).sum
        assert(fanned.length >= math.min(target, maxSplits) || fanned.length >= basePlan.length,
          s"target=$target: planned only ${fanned.length} of $maxSplits possible")
        // strip-or-assert: sub-splits carry NO HasPartitionKey claim — the
        // splits still claiming a key must be unique per part, so Spark's
        // key grouping can never treat one sub-split as a whole partition
        val keyed = fanned.collect {
          case p: org.apache.spark.sql.connector.read.HasPartitionKey =>
            p.asInstanceOf[PolarInputPartition].part
        }
        assert(keyed.distinct.length === keyed.length,
          s"target=$target: duplicate partition-key claims: ${keyed.mkString(",")}")
      }
    }
  }

  test("top-N ts cut: the true top-N always survives the prune, ties and all") {
    for (trial <- 1 to 2000) {
      val nFiles = 1 + rnd.nextInt(12)
      var off = 0L
      val filesAndRows = Vector.fill(nFiles) {
        val take = 1 + rnd.nextInt(6)
        val rows = Vector.fill(take)(rnd.nextInt(30).toLong) // heavy ties
        val f = FileEntry(0, s"f$off.parquet", off, off + take - 1,
          take.toLong, 100L, 1L, rows.min, rows.max, tsNulls = 0L)
        off += take
        (f, rows)
      }
      val files = filesAndRows.map(_._1)
      val allTs = filesAndRows.flatMap(_._2)
      for (desc <- Seq(true, false); n <- Seq(1, 2, 5, allTs.size, allTs.size + 3)) {
        val cut = TopNPruning.tsCut(files, desc, n)
        cut match {
          case None =>
            assert(allTs.size < n,
              s"trial $trial: no cut although ${allTs.size} rows >= n=$n")
          case Some(c) =>
            // the true top-n multiset of timestamps
            val sorted = if (desc) allTs.sorted.reverse else allTs.sorted
            val topN = sorted.take(n)
            // a pruned file may hold NO row at-or-better than the N-th
            // best value — otherwise the true top-N lost a candidate
            filesAndRows.foreach { case (f, rows) =>
              if (!TopNPruning.survives(f, desc, c))
                rows.foreach { t =>
                  if (desc) assert(t < topN.last,
                    s"trial $trial: pruned file held ts=$t >= nth=${topN.last}")
                  else assert(t > topN.last,
                    s"trial $trial: pruned file held ts=$t <= nth=${topN.last}")
                }
            }
        }
      }
    }
  }

  test("explicit batch windows: planned coverage is exactly the window, any layout") {
    // planning is pure metadata — write only the registry doc, never data
    for (trial <- 1 to 150) {
      val nParts = 1 + rnd.nextInt(5)
      val chains = (0 until nParts).map { p =>
        p -> randomChain(p, rnd.nextInt(4).toLong, 1 + rnd.nextInt(40))
      }.toMap
      val root = java.nio.file.Files.createTempDirectory("prop_bo").toString
      val cfg = TopicConfig(root, "t", clusterSize = 1, rangesPerToken = nParts)
      val meta = LogMetadata(
        version = 1, clusterSize = 1, rangesPerToken = nParts,
        producerOffsets = Vector.tabulate(nParts)(p =>
          chains(p)._1.last.maxOffset + 1),
        filesByPart = chains.map { case (p, (fs, _)) => p -> fs })
      LogMetadata.write(cfg, meta)
      def randomEdge(p: Int): Long = rnd.nextInt(5) match {
        case 0 => -2L
        case 1 => -1L
        case _ =>
          // anywhere from below the head gap to past the tail
          rnd.nextLong(meta.producerOffsets(p) + 3)
      }
      // partitions may be named in one map, both, or neither
      val startOv = (0 until nParts).filter(_ => rnd.nextBoolean())
        .map(p => p -> randomEdge(p)).toMap
      val endOv = (0 until nParts).filter(_ => rnd.nextBoolean())
        .map(p => p -> randomEdge(p)).toMap
      def json(m: Map[Int, Long]) =
        m.map { case (p, o) => s""""$p": $o""" }.mkString("{", ",", "}")
      var opts = Map("root" -> root, "topic" -> "t",
        "clusterSize" -> "1", "rangesPerToken" -> nParts.toString)
      if (startOv.nonEmpty) opts += ("startingOffsets" -> json(startOv))
      if (endOv.nonEmpty) opts += ("endingOffsets" -> json(endOv))
      val scan = new PolarScan(PolarSource.configFrom(opts))
      val covered = scan.toBatch.planInputPartitions().flatMap { ip =>
        val s = ip.asInstanceOf[PolarInputPartition]
        s.files.flatMap(f =>
          (math.max(s.startOffset, f.minOffset) to
            math.min(s.endOffset - 1, f.maxOffset)).map(o => (s.part, o)))
      }.toSeq.sorted
      val expected = (0 until nParts).flatMap { p =>
        val tail = meta.producerOffsets(p)
        def res(o: Long) = if (o == -2L) 0L else if (o == -1L) tail else o
        val lo = startOv.get(p).map(res).getOrElse(0L)
        val hi = math.min(endOv.get(p).map(res).getOrElse(tail), tail)
        chains(p)._2.map(_._1).filter(o => o >= lo && o < hi).map(o => (p, o))
      }.sorted
      assert(covered == expected,
        s"trial $trial: window coverage diverged (got ${covered.size}, " +
          s"exp ${expected.size}; startOv=$startOv endOv=$endOv)")
      assert(covered.distinct.size == covered.size, s"trial $trial: dup rows")
      // statistics agree with the plan (stats == plan invariant)
      assert(scan.estimateStatistics().numRows().getAsLong == expected.size,
        s"trial $trial: stats diverged from plan")
    }
  }
}
