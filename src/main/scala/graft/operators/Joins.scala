package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Temporal join operators Spark lacks as builtins (brief: as-of join,
 * range/interval join, sessionization). All three are expressed as
 * single-shuffle window/join plans — no per-key loops, no custom
 * physical operator needed; the DuckDB oracle twins use DuckDB's
 * native ASOF JOIN / BETWEEN joins, so the semantics are
 * cross-checked against an independent implementation.
 */
object Joins {

  /**
   * As-of join: for every left row, the LATEST right row with
   * `right.ts <= left.ts` in the same series. The classic union
   * trick: tag the sides, sort by (ts, side) within series (right
   * sorts first on ties so an exactly-simultaneous right row is
   * visible, i.e. inclusive <=), then `last(..., ignoreNulls)` over a
   * running frame carries the most recent right values forward. ONE
   * shuffle on series_id, one sort — no join node at all, so there is
   * no skew amplification however many left rows share a right match.
   *
   * With a tolerance, a match STALER than `toleranceUs` microseconds
   * nulls out (pandas `merge_asof` `direction='backward'`,
   * `tolerance` — the row itself survives, left-join semantics);
   * the tolerance is a post-carry projection, so the plan is
   * unchanged: same single shuffle, no join node.
   *
   * Output: left columns + `asof_ts`, `asof_value` (null when no
   * right row precedes / none within tolerance).
   */
  def asofJoin(
      left: DataFrame, right: DataFrame, toleranceUs: Option[Long] = None): DataFrame = {
    val l = left.select(col("series_id"), col("ts"), col("value"),
      lit(1).as("side"), lit(null).cast("timestamp").as("r_ts"),
      lit(null).cast("double").as("r_val"))
    val r = right.select(col("series_id"), col("ts"),
      lit(null).cast("double").as("value"),
      lit(0).as("side"), col("ts").as("r_ts"), col("value").as("r_val"))
    val w = Window.partitionBy("series_id").orderBy(col("ts"), col("side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // ONE selection for both outputs: the carried value is a struct
    // that is null exactly on left rows (r_ts is never null on right
    // rows), so asof_ts and asof_value always come from the SAME
    // right row — selecting them with two independent ignoreNulls
    // scans would let a null-VALUED nearest row pair its timestamp
    // with a different row's value
    val joined = l.unionByName(r)
      .withColumn("m", last(
        when(col("side") === 0, struct(col("r_ts"), col("r_val"))),
        ignoreNulls = true).over(w))
      .where(col("side") === 1)
    val inTol = toleranceUs match {
      case Some(tol) =>
        col("m.r_ts").isNotNull &&
          unix_micros(col("ts")) - unix_micros(col("m.r_ts")) <= tol
      case None => col("m.r_ts").isNotNull
    }
    joined.select(col("series_id"), col("ts"), col("value"),
      when(inTol, col("m.r_ts")).as("asof_ts"),
      when(inTol, col("m.r_val")).as("asof_value"))
  }

  /**
   * Forward as-of join with optional tolerance (pandas `merge_asof`
   * `direction='forward'`): for every left row, the EARLIEST right
   * row with `right.ts >= left.ts` in the same series; with a
   * tolerance, a match farther than `toleranceUs` microseconds nulls
   * out (the row itself survives — left-join semantics). The union
   * trick mirrored by REVERSING the sort: descending (ts, side) with
   * right rows first on ties, so "the latest previously-seen right
   * row" in the descending walk IS the earliest right row at-or-after
   * the left ts (inclusive >=), carried by `last(..., ignoreNulls)`
   * over the same O(n) running frame the backward form uses — not a
   * (currentRow, unboundedFollowing) frame, which Spark executes by
   * re-scanning current-to-end per output row (O(n²) on a hot
   * series). Same single shuffle, one sort, no join node. The carried
   * value is one struct so ts and value always come from the SAME
   * right row (see [[asofJoin]]).
   */
  def asofJoinForward(
      left: DataFrame, right: DataFrame, toleranceUs: Option[Long] = None): DataFrame = {
    val l = left.select(col("series_id"), col("ts"), col("value"),
      lit(0).as("side"), lit(null).cast("timestamp").as("r_ts"),
      lit(null).cast("double").as("r_val"))
    val r = right.select(col("series_id"), col("ts"),
      lit(null).cast("double").as("value"),
      lit(1).as("side"), col("ts").as("r_ts"), col("value").as("r_val"))
    val w = Window.partitionBy("series_id").orderBy(col("ts").desc, col("side").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val joined = l.unionByName(r)
      .withColumn("m", last(
        when(col("side") === 1, struct(col("r_ts"), col("r_val"))),
        ignoreNulls = true).over(w))
      .where(col("side") === 0)
    val inTol = toleranceUs match {
      case Some(tol) =>
        col("m.r_ts").isNotNull &&
          unix_micros(col("m.r_ts")) - unix_micros(col("ts")) <= tol
      case None => col("m.r_ts").isNotNull
    }
    joined.select(col("series_id"), col("ts"), col("value"),
      when(inTol, col("m.r_ts")).as("asof_ts"),
      when(inTol, col("m.r_val")).as("asof_value"))
  }

  /**
   * Nearest as-of join (pandas `merge_asof` `direction='nearest'`),
   * completing the backward/forward pair: for every left row, the
   * right row minimizing |right.ts − left.ts| within the same series;
   * equal distances resolve BACKWARD (the ≤ side), documented rather
   * than inherited — and `direction` rides along so callers can see
   * which side won. Tolerance applies per side before the pick.
   *
   * Execution: the same union trick as the directional forms, but
   * BOTH carried structs come from one union frame — one exchange on
   * series_id, two sorts (ascending for the backward carry,
   * descending for the forward carry), zero join nodes. The
   * two-window form beats composing asofJoin + asofJoinForward and
   * re-joining their outputs: that shape unions the inputs twice and
   * adds a (series_id, ts) join against itself.
   */
  def asofJoinNearest(
      left: DataFrame, right: DataFrame, toleranceUs: Option[Long] = None): DataFrame = {
    val l = left.select(col("series_id"), col("ts"), col("value"),
      lit(1).as("side"), lit(null).cast("timestamp").as("r_ts"),
      lit(null).cast("double").as("r_val"))
    val r = right.select(col("series_id"), col("ts"),
      lit(null).cast("double").as("value"),
      lit(0).as("side"), col("ts").as("r_ts"), col("value").as("r_val"))
    // backward walk: right rows sort BEFORE a left row at the same ts
    // (side 0 < 1 ascending) → inclusive <=; forward walk: descending
    // ts with ascending side keeps right rows first on ties → the
    // carried "last seen" is the earliest right row at-or-after.
    val wB = Window.partitionBy("series_id").orderBy(col("ts"), col("side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wF = Window.partitionBy("series_id").orderBy(col("ts").desc, col("side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = when(col("side") === 0, struct(col("r_ts"), col("r_val")))
    val joined = l.unionByName(r)
      .withColumn("mb", last(carried, ignoreNulls = true).over(wB))
      .withColumn("mf", last(carried, ignoreNulls = true).over(wF))
      .where(col("side") === 1)
    def inTol(dist: Column): Column = toleranceUs match {
      case Some(tol) => dist <= tol
      case None => lit(true)
    }
    val db = unix_micros(col("ts")) - unix_micros(col("mb.r_ts"))
    val df = unix_micros(col("mf.r_ts")) - unix_micros(col("ts"))
    val okB = col("mb.r_ts").isNotNull && inTol(db)
    val okF = col("mf.r_ts").isNotNull && inTol(df)
    val pickB = okB && (!okF || db <= df)   // tie → backward
    val pickF = okF && !pickB
    joined.select(col("series_id"), col("ts"), col("value"),
      when(pickB, col("mb.r_ts")).when(pickF, col("mf.r_ts")).as("asof_ts"),
      when(pickB, col("mb.r_val")).when(pickF, col("mf.r_val")).as("asof_value"),
      when(pickB, lit("backward")).when(pickF, lit("forward")).as("direction"))
  }

  /**
   * Interval containment join: each point against the intervals of
   * its series with `start <= ts <= stop` (pandas inclusive label
   * slice, SURVEY.md §2.3), aggregated to per-interval stats. The
   * equi-key is series_id; the interval side is aggregated output so
   * AQE broadcast-plans it at runtime (same shape the storm stats
   * pass uses).
   */
  def intervalStats(points: DataFrame, intervals: DataFrame): DataFrame = {
    val iv = intervals.select(col("series_id").as("iv_sid"),
      col("start"), col("stop"))
    points
      .join(iv,
        col("series_id") === col("iv_sid") &&
          col("ts") >= col("start") && col("ts") <= col("stop"))
      .groupBy(col("series_id"), col("start"), col("stop"))
      .agg(
        count(lit(1)).as("n_points"),
        round(coalesce(sum(Kernels.nanToNull(col("value"))), lit(0.0)), 6).as("total"),
        round(avg(Kernels.nanToNull(col("value"))), 6).as("mean"))
  }

  /**
   * Gap-based sessionization as a first-class batch operator: a new
   * session starts where `ts − lag(ts) > gap`. The session id is the
   * running count of gap-exceeding steps (gaps-and-islands shape,
   * same one-shuffle plan as [[Kernels.withRunId]]).
   */
  def sessionize(ts: DataFrame, gap: String): DataFrame = {
    val gapUs = Steps.parseMicros(gap)
    val w = Window.partitionBy("series_id").orderBy("ts")
    val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ts.withColumn("prev_us", unix_micros(lag(col("ts"), 1).over(w)))
      .withColumn("is_new",
        when(col("prev_us").isNull ||
          unix_micros(col("ts")) - col("prev_us") > gapUs, 1L).otherwise(0L))
      .withColumn("session_id", sum(col("is_new")).over(wRun))
      .drop("prev_us", "is_new")
  }

  /** Session summaries: one row per (series, session). */
  def sessionStats(ts: DataFrame, gap: String): DataFrame =
    sessionize(ts, gap)
      .groupBy(col("series_id"), col("session_id"))
      .agg(
        min(col("ts")).as("start"),
        max(col("ts")).as("stop"),
        count(lit(1)).as("n_points"),
        round(coalesce(sum(Kernels.nanToNull(col("value"))), lit(0.0)), 6).as("total"))
}
