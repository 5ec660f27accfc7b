package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import Kernels._

/** Per-(series, run) summary of one contiguous above-threshold "mass
  * group" — the unit the storm fold iterates over. All timestamps are
  * epoch micros; `cumExclStart`/`cumInclStop` are prefix sums of the
  * NaN-as-zero value so any inclusive label-slice total
  * `data.loc[a:b].sum()` (metevents/events.py:100,118) is O(1):
  * `cumInclStop(b) - cumExclStart(a)`. */
private[operators] case class StormGroup(
    series_id: String,
    g_start_us: Long,
    g_stop_us: Long,
    rn_start: Long,
    cum_excl_start: Double,
    cum_incl_stop: Double,
    step_us: Option[Long])

/** A delineated storm interval, pre stats-pass. `span_start_us` already
  * carries the one-tstep back-extension (metevents/events.py:116). */
private[operators] case class StormSpan(
    series_id: String,
    span_start_us: Long,
    span_stop_us: Long)

/**
 * Storm delineation — StormEvents.find (metevents/events.py:54-121).
 *
 * A storm starts at the first above-threshold group and closes at group
 * i iff ((gap to next group > hours_to_stop) OR (duration since
 * candidate start > max_storm_hours)) AND running total >=
 * min_storm_total; the final group always closes
 * (metevents/events.py:114). The emitted span is back-extended one time
 * step unless the candidate start is the series' first row
 * (metevents/events.py:116). Totals re-sum the RAW data over the
 * inclusive span — sub-threshold rows inside the span count
 * (metevents/events.py:100,118).
 *
 * Spark shape (SURVEY.md §3.2): a relational prefix (mask → run-id →
 * per-group summaries with prefix sums, one shuffle on series_id), an
 * order-dependent fold over the tiny per-series summaries via
 * `groupByKey.flatMapGroups` — the only step outside Catalyst — and a
 * final interval join of the resulting spans back to the points for
 * exact pandas `.loc[a:b]` stats. The span side is aggregated output
 * (orders of magnitude smaller than the points), so it is broadcast;
 * totals come from the join rather than the prefix sums so that
 * back-extension onto irregular timestamps matches the label-slice
 * semantics exactly.
 *
 * The reference crashes on series with no inferable frequency
 * (`to_offset(None)`, metevents/events.py:77); we instead skip such
 * series (documented divergence) unless an explicit `frequency` is
 * supplied, which also extends the operator to irregular series.
 */
object StormEvents {
  /** StormEvents.from_station parity (metevents/events.py:123-165):
    * resolve the source, pull daily accumulated precipitation, convert
    * to increments, detect. The registry maps source names to
    * [[graft.sources.StationSource]]s (recorded fixtures in tests —
    * FIXTURES.md §3; a live HTTP client implements the same trait). */
  def fromStation(
      registry: Map[String, graft.sources.StationSource],
      spark: org.apache.spark.sql.SparkSession,
      stationId: String,
      start: String,
      stop: String,
      source: String = "NRCS",
      params: StormEvents = StormEvents()): DataFrame =
    params.detect(
      graft.sources.StationSources.fromStation(registry, spark, stationId, start, stop, source))
}

case class StormEvents(
    instantMassToStart: Double = 0.1,
    minStormTotal: Double = 0.5,
    hoursToStop: Double = 24,
    maxStormHours: Double = 336,
    frequency: Option[String] = None)
    extends Detector {

  val eventType = "storm"

  def detect(ts: DataFrame): DataFrame = {
    val spark = ts.sparkSession
    import spark.implicits._

    val w = seriesWindow()
    val wCum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)

    // nanToNull first: pandas `NaN >= x` is False (events.py:73); Spark
    // orders NaN above all numerics, which would start a storm on NaN.
    val prepped = withRunId(ts, nanToNull(col("value")) >= instantMassToStart)
      .withColumn("value0", coalesce(nanToNull(col("value")), lit(0.0)))
      .withColumn("cum_incl", sum(col("value0")).over(wCum))
      .withColumn("rn", row_number().over(w))

    val summaries = prepped
      .where(col("cond"))
      .groupBy(col("series_id"), col("run_id"))
      .agg(
        min(unix_micros(col("ts"))).as("g_start_us"),
        max(unix_micros(col("ts"))).as("g_stop_us"),
        min(col("rn")).as("rn_start"),
        min_by(col("cum_incl") - col("value0"), col("ts")).as("cum_excl_start"),
        max_by(col("cum_incl"), col("ts")).as("cum_incl_stop"))

    val withStep = frequency match {
      case Some(f) =>
        summaries.withColumn("step_us", lit(Steps.parseMicros(f)))
      case None =>
        // inferred freq goes through pandas' resolution_string: one unit
        // of the smallest nonzero component (metevents/utilities.py:14)
        val steps = Kernels
          .inferStep(ts)
          .select(col("series_id"), Steps.resolutionStepCol(col("step_us")).as("step_us"))
        summaries.join(steps, Seq("series_id"), "left")
    }

    val spans: Dataset[StormSpan] = withStep
      .select("series_id", "g_start_us", "g_stop_us", "rn_start", "cum_excl_start",
        "cum_incl_stop", "step_us")
      .as[StormGroup]
      .groupByKey(_.series_id)
      .flatMapGroups { (sid, it) =>
        val groups = it.toArray.sortBy(_.g_start_us)
        groups.headOption.flatMap(_.step_us) match {
          case None => Iterator.empty // irregular series, no explicit freq
          case Some(stepUs) =>
            val dtUs = (hoursToStop * Steps.Hour).toLong
            val maxUs = (maxStormHours * Steps.Hour).toLong
            val out = Array.newBuilder[StormSpan]
            var candStart = 0L
            var candCumExcl = 0.0
            var candRnStart = 0L
            var haveCand = false
            var i = 0
            while (i < groups.length) {
              val g = groups(i)
              if (!haveCand) {
                candStart = g.g_start_us
                candCumExcl = g.cum_excl_start
                candRnStart = g.rn_start
                haveCand = true
              }
              val last = i == groups.length - 1
              val nextStart = if (last) g.g_stop_us else groups(i + 1).g_start_us
              val total = g.cum_incl_stop - candCumExcl
              val durationUs = g.g_stop_us - candStart
              val close = ((nextStart - g.g_stop_us > dtUs) || (durationUs > maxUs)) &&
                total >= minStormTotal
              if (close || last) {
                val spanStart =
                  if (candRnStart > 1L) candStart - stepUs else candStart
                out += StormSpan(sid, spanStart, g.g_stop_us)
                haveCand = false // next group becomes the new candidate
              }
              i += 1
            }
            out.result().iterator
        }
      }

    // Exact pandas label-slice stats: every point with
    // span_start <= ts <= span_stop belongs to the event
    // (metevents/events.py:118, periods.py:12-45). Spans are aggregated
    // output — usually far smaller than the points — but they scale with
    // series_count × storms_per_series, so no unconditional broadcast
    // hint: AQE picks broadcast when the span side is actually small and
    // falls back to a sort-merge equi-join on series_id otherwise.
    // total coalesces to 0.0 on an all-missing span: CumulativePeriod's
    // NaN-skipping sum returns 0.0 there (periods.py:43).
    val pts = ts.select(col("series_id"), col("ts"), col("value"))
    pts
      .join(
        spans.toDF(),
        pts("series_id") === spans("series_id") &&
          unix_micros(col("ts")) >= col("span_start_us") &&
          unix_micros(col("ts")) <= col("span_stop_us"))
      .groupBy(pts("series_id"), col("span_start_us"), col("span_stop_us"))
      .agg(
        min(col("ts")).as("start"),
        max(col("ts")).as("stop"),
        count(lit(1)).as("n_points"),
        coalesce(sum(nanToNull(col("value"))), lit(0.0)).as("total"))
      .select(
        pts("series_id"),
        lit(eventType).as("event_type"),
        col("start"),
        col("stop"),
        (unix_micros(col("stop")) - unix_micros(col("start"))).as("duration_us"),
        col("n_points"),
        col("total"))
  }
}
