package graft.log

import org.scalatest.funsuite.AnyFunSuite

/**
 * The fair poll-admission split (reference round-robin parity,
 * `internal/consuming/group_read_queue.go:115-118`): a capped poll gives
 * every backlogged partition an even share of the budget first, then
 * redistributes what the short backlogs left unspent in one ascending
 * pass. Pure registry arithmetic — the specs construct metadata directly.
 */
class FairAdmissionSpec extends AnyFunSuite {

  private def dense(p: Int, n: Long, bytesPerRec: Long = 64L) =
    Vector(FileEntry(p, s"p$p.parquet", 0L, n - 1, n, n * bytesPerRec, 1L))

  test("a hot partition no longer starves the others (record cap)") {
    // partition 0 backlog 1M; partitions 1..3 backlog 100 each; cap 1000.
    // Pre-fairness the ascending walk gave p0 the whole cap and p1..p3
    // nothing, forever (p0's inflow could outrun the cap). Fair split:
    // share 250 → p1..p3 drain their 100s, the 450 leftover tops p0 up.
    val meta = LogMetadata(1L, 1, 4, Vector(1000000L, 100L, 100L, 100L),
      filesByPart = Map(
        0 -> dense(0, 1000000L), 1 -> dense(1, 100L),
        2 -> dense(2, 100L), 3 -> dense(3, 100L)))
    val start = Map(0 -> 0L, 1 -> 0L, 2 -> 0L, 3 -> 0L)
    val end = Map(0 -> 1000000L, 1 -> 100L, 2 -> 100L, 3 -> 100L)
    val res = ConsumerGroups.recordCapEnd(meta, start, end, 1000L)
    assert(res(1) === 100L)
    assert(res(2) === 100L)
    assert(res(3) === 100L)
    assert(res(0) === 700L, "p0 gets its 250 share + the 450 leftover")
    assert(res.values.sum === 1000L, "the cap is spent exactly, never overshot")
  }

  test("byte cap is byte-fair, not record-fair") {
    // p0 holds 1 KiB records, p1 holds 10 B records, 1000 pending each;
    // a 10 KiB cap splits 5 KiB/5 KiB → 5 big records vs 512 small ones
    val meta = LogMetadata(1L, 1, 2, Vector(1000L, 1000L),
      filesByPart = Map(
        0 -> dense(0, 1000L, bytesPerRec = 1024L),
        1 -> dense(1, 1000L, bytesPerRec = 10L)))
    val res = ConsumerGroups.byteCapEnd(
      meta, Map(0 -> 0L, 1 -> 0L), Map(0 -> 1000L, 1 -> 1000L), 10240L)
    assert(res(0) === 5L)
    assert(res(1) === 512L)
  }

  test("a single backlogged partition still receives the full cap") {
    val meta = LogMetadata(1L, 1, 3, Vector(50L, 2000L, 70L),
      filesByPart = Map(1 -> dense(1, 2000L)))
    // p0 and p2 are caught up — p1 is the only backlog, share = whole cap
    val res = ConsumerGroups.recordCapEnd(meta,
      Map(0 -> 50L, 1 -> 0L, 2 -> 70L),
      Map(0 -> 50L, 1 -> 2000L, 2 -> 70L), 500L)
    assert(res(1) === 500L)
    assert(res(0) === 50L && res(2) === 70L, "caught-up windows stay empty")
  }

  test("progress guarantee is global: a zero cap admits exactly one record") {
    val meta = LogMetadata(1L, 1, 3, Vector(100L, 100L, 100L),
      filesByPart = Map(
        0 -> dense(0, 100L), 1 -> dense(1, 100L), 2 -> dense(2, 100L)))
    val start = Map(0 -> 0L, 1 -> 0L, 2 -> 0L)
    val end = Map(0 -> 100L, 1 -> 100L, 2 -> 100L)
    val res = ConsumerGroups.recordCapEnd(meta, start, end, 0L)
    assert(res(0) === 1L, "one record, in the first backlogged partition")
    assert(res(1) === 0L && res(2) === 0L,
      "per-partition forcing would overshoot the cap B-fold")
    val bytes = ConsumerGroups.byteCapEnd(meta, start, end, 0L)
    assert(bytes(0) === 1L && bytes(1) === 0L && bytes(2) === 0L)
  }

  test("progress guarantee skips a backlogged-but-trimmed partition") {
    // p0's window is open but every file was trimmed away — the forced
    // record must come from p1, not stall on p0
    val meta = LogMetadata(1L, 1, 2, Vector(100L, 100L),
      filesByPart = Map(1 -> dense(1, 100L)))
    val res = ConsumerGroups.recordCapEnd(
      meta, Map(0 -> 0L, 1 -> 0L), Map(0 -> 100L, 1 -> 100L), 0L)
    assert(res(1) === 1L)
  }

  test("gap jumps stay free and mid-file budget stops stay put, per share") {
    // p0: files [100,199] and [300,399] (trimmed head + compacted gap);
    // p1: dense 1000. Cap 250 → share 125: p0 jumps to 100 free, admits
    // its whole first file (100) + 25 into the second after jumping the
    // real gap; p1 admits 125. Zero leftover.
    val gappy = Vector(
      FileEntry(0, "a.parquet", 100L, 199L, 100L, 6400L, 1L),
      FileEntry(0, "b.parquet", 300L, 399L, 100L, 6400L, 1L))
    val meta = LogMetadata(1L, 1, 2, Vector(400L, 1000L),
      filesByPart = Map(0 -> gappy, 1 -> dense(1, 1000L)))
    val res = ConsumerGroups.recordCapEnd(
      meta, Map(0 -> 0L, 1 -> 0L), Map(0 -> 400L, 1 -> 1000L), 250L)
    assert(res(0) === 325L, "100 whole + gap jump + 25 partial")
    assert(res(1) === 125L)
    // a budget stop MID-file must not jump (records would be skipped):
    // share 50 stops p0 inside file a at offset 150
    val res2 = ConsumerGroups.recordCapEnd(
      meta, Map(0 -> 0L, 1 -> 0L), Map(0 -> 400L, 1 -> 1000L), 100L)
    assert(res2(0) === 150L)
    assert(res2(1) === 50L)
  }

  test("redistribution pass resumes a partition mid-file") {
    // p0 backlog 1000, p1 backlog 10; cap 600 → share 300: p1 drains its
    // 10, pass 2 hands the 290 leftover back to p0 → 590 total for p0
    val meta = LogMetadata(1L, 1, 2, Vector(1000L, 10L),
      filesByPart = Map(0 -> dense(0, 1000L), 1 -> dense(1, 10L)))
    val res = ConsumerGroups.recordCapEnd(
      meta, Map(0 -> 0L, 1 -> 0L), Map(0 -> 1000L, 1 -> 10L), 600L)
    assert(res(0) === 590L)
    assert(res(1) === 10L)
  }

  test("whole-file exact count charging survives the split (sparse files)") {
    // two compacted partitions: 10 files each spanning 10000 offsets with
    // 100 real records. A 65535 cap (share 32767) must admit ALL 2000
    // real records — count-charged, not span-charged — on both sides.
    def sparse(p: Int) = Vector.tabulate(10)(i =>
      FileEntry(p, s"kc$p-$i.parquet", i * 10000L, i * 10000L + 9999L,
        100L, 4096L, 1L))
    val meta = LogMetadata(1L, 1, 2, Vector(100000L, 100000L),
      filesByPart = Map(0 -> sparse(0), 1 -> sparse(1)))
    val res = ConsumerGroups.recordCapEnd(
      meta, Map(0 -> 0L, 1 -> 0L), Map(0 -> 100000L, 1 -> 100000L), 0xFFFFL)
    assert(res(0) === 100000L)
    assert(res(1) === 100000L)
  }
}
