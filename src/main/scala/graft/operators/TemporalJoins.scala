package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Temporal join operators the built-in join strategies don't cover directly
 * — composed from union + window / bin + equi-join so they run as ordinary
 * shuffles at any scale (no broadcast-nested-loop range explosion, no
 * per-key driver state).
 *
 * These are "beyond-reference" operators for the analytics plane: the
 * reference's log delivers time-ordered events per key
 * (`/root/reference/internal/producing/coalescer.go:166-167` monotone
 * offsets), and enriching such a stream with the latest dimension state
 * (as-of) or a sliding neighborhood (range) are the two standard temporal
 * joins over it.
 */
object TemporalJoins {

  /**
   * AS-OF JOIN: for each left row, the single latest right row with equal
   * `keys` and `right(timeCol) <= left(timeCol)`, ties broken by the
   * greatest `tiebreak` value.
   *
   * Plan shape: tag both sides, UNION, one window over (keys) ordered by
   * (time, side-marker, tiebreak), `last(payload, ignoreNulls)` carries the
   * most recent right payload forward into each left row. ONE shuffle (the
   * window partitioning); memory per task is one running payload per key —
   * the sort-merge formulation every scalable as-of join uses, vs the
   * quadratic theta-join a naive `t_r <= t_l` join plans.
   *
   * The marker orders right rows BEFORE left rows at the same timestamp, so
   * an exactly-simultaneous right row is matched (<= semantics). A right
   * row whose payload is genuinely NULL is looked through to the previous
   * one (`last(_, ignoreNulls = true)`) — document or pre-coalesce if that
   * distinction matters.
   */
  def asof(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      timeCol: String,
      payloadCols: Seq[String],
      tiebreak: String): DataFrame = {
    require(payloadCols.nonEmpty, "asof needs at least one payload column")
    val leftCols = left.columns.toSeq
    val keyCols = keys.map(col)

    val taggedLeft = left
      .withColumn("__marker", lit(1))
      .withColumn("__tie", lit(null).cast(right.schema(tiebreak).dataType))
      .select(keyCols ++ Seq(col(timeCol).as("__t"), col("__marker"), col("__tie")) ++
        payloadCols.map(c => lit(null).cast(right.schema(c).dataType).as(s"__p_$c")) ++
        leftCols.map(c => col(c).as(s"__l_$c")): _*)
    val taggedRight = right
      .withColumn("__marker", lit(0))
      .withColumn("__tie", col(tiebreak))
      .select(keyCols ++ Seq(col(timeCol).as("__t"), col("__marker"), col("__tie")) ++
        payloadCols.map(c => col(c).as(s"__p_$c")) ++
        leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(s"__l_$c")): _*)

    val w = Window.partitionBy(keyCols: _*)
      .orderBy(col("__t"), col("__marker"), col("__tie"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    taggedLeft.unionByName(taggedRight)
      .select(Seq(col("__marker")) ++ leftCols.map(c => col(s"__l_$c")) ++
        payloadCols.map(c =>
          last(col(s"__p_$c"), ignoreNulls = true).over(w).as(s"asof_$c")): _*)
      .filter(col("__marker") === 1)
      .select(leftCols.map(c => col(s"__l_$c").as(c)) ++
        payloadCols.map(c => col(s"asof_$c")): _*)
  }

  /**
   * [[asof]] with a TOLERANCE (pandas `merge_asof(tolerance=...)`): the
   * match is kept only when the right row is no older than `toleranceMicros`
   * at the left row's timestamp; staler matches surface as NULL payloads.
   * Same single-shuffle plan — the matched right timestamp rides along as
   * one more carried payload and the tolerance check is a stateless
   * post-filter projection.
   */
  def asofWithin(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      timeCol: String,
      payloadCols: Seq[String],
      tiebreak: String,
      toleranceMicros: Long): DataFrame = {
    // timeCol always rides along for the freshness check; if the caller
    // ALSO listed it as a payload, don't carry it twice (duplicate
    // asof_<timeCol> columns make every later reference ambiguous) and
    // keep it in the output instead of dropping it
    val wantsTime = payloadCols.contains(timeCol)
    val carried = payloadCols.filterNot(_ == timeCol)
    val out = asof(left, right, keys, timeCol, carried :+ timeCol, tiebreak)
    val fresh =
      unix_micros(col(timeCol)) - unix_micros(col(s"asof_$timeCol")) <= toleranceMicros
    val nulled = carried.foldLeft(out) { (df, c) =>
      df.withColumn(s"asof_$c", when(fresh, col(s"asof_$c")))
    }
    if (wantsTime) nulled.withColumn(s"asof_$timeCol", when(fresh, col(s"asof_$timeCol")))
    else nulled.drop(s"asof_$timeCol")
  }

  /**
   * Binned RANGE JOIN: pairs (l, r) with equal `keys` and
   * `r(timeCol) ∈ [l(timeCol) - before, l(timeCol) + after)`.
   *
   * Plan shape: right rows are exploded into the fixed-width time bins they
   * can affect, then an EQUI-join on (keys, bin) + exact range filter. The
   * bin explode is a constant ≤ (span/binWidth + 2)× row multiplier before
   * a hash shuffle — the canonical way to keep a range join out of
   * broadcast-nested-loop at scale. `binMicros` should be ≥ the window
   * span so the multiplier stays ≤ 2-3×.
   */
  def rangeJoinBinned(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      timeCol: String,
      beforeMicros: Long,
      afterMicros: Long,
      binMicros: Long): DataFrame = {
    require(beforeMicros + afterMicros > 0, "range window must be non-empty")
    // floor(x/y) on epoch-micros is exact here: x < 2^53 is an exact
    // double, and for integer x,y the error |x/y - round(x/y)| ≥ 1/y
    // exceeds the quotient's half-ulp, so the floor can't cross an integer
    def binOf(c: Column): Column = floor(c / binMicros).cast("long")
    val l = left.withColumn("__lt", unix_micros(col(timeCol)))
      .withColumn("__bin", binOf(col("__lt")))
    // a right row at rt can match left times in (rt - after, rt + before]
    // => it must appear in every bin of that span
    val r = right.withColumn("__rt", unix_micros(col(timeCol)))
      .withColumn("__bin", explode(sequence(
        binOf(col("__rt") - afterMicros + 1),
        binOf(col("__rt") + beforeMicros))))
    l.as("l").join(r.as("r"),
      keys.map(k => col(s"l.$k") === col(s"r.$k")).reduce(_ && _) &&
        col("l.__bin") === col("r.__bin") &&
        col("r.__rt") >= col("l.__lt") - beforeMicros &&
        col("r.__rt") < col("l.__lt") + afterMicros)
  }
}
