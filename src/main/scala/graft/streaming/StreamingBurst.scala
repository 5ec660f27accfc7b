package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/**
 * Streaming burst detection — the continuous twin of
 * [[graft.queries.TimeSeriesQueries.bd1BurstDetection]]: as events
 * arrive, each event type's DAY closes the moment a LATER day's
 * event for that type arrives (the in-order contract the detectors
 * share — route unruly feeds through [[StreamingReorder]]), and the
 * closed day is emitted append-mode with its count, trailing
 * 7-day-window baseline (days with no events shrink the baseline
 * exactly as the batch RANGE frame does) and burst flag. The still
 * OPEN day per type lives in state and is deliberately not emitted —
 * its count can still grow; the batch operator owns it in the lambda
 * layout (the [[StreamingScd]] open-version posture).
 *
 * State per type is O(8): the open (day, count) plus up to 7 trailing
 * closed (day, count) pairs — constant regardless of stream lifetime.
 */
object StreamingBurst {

  final case class ClosedDay(
      event_type: String, day_idx: Long, n: Long,
      trail_n: Long, trail_days: Long, is_burst: Boolean)

  final case class BurstState(
      openDay: Long, openN: Long, trail: List[(Long, Long)])

  /** `events` must carry (event_type, day_idx); emits each closed
    * (type, day) with the batch bd1 columns (factor = 3.0). */
  def closedDays(events: DataFrame): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    events.select("event_type", "day_idx")
      .as[(String, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(
        OutputMode.Append(), GroupStateTimeout.NoTimeout())(
        (typ: String, rows: Iterator[(String, Long)],
         state: GroupState[BurstState]) => {
          val days = rows.map(_._2).toArray.sorted
          val out = Array.newBuilder[ClosedDay]
          var st = state.getOption.getOrElse(BurstState(Long.MinValue, 0L, Nil))
          def close(): Unit = if (st.openDay != Long.MinValue) {
            val window = st.trail.filter { case (d, _) =>
              d >= st.openDay - 7 && d <= st.openDay - 1 }
            val trailN = window.map(_._2).sum
            val trailDays = window.size.toLong
            // the batch expressions verbatim: base = trail_n/trail_days,
            // burst iff n > 3.0 * base (no-history days not flaggable)
            val isBurst = trailDays > 0 &&
              st.openN > 3.0 * (trailN.toDouble / trailDays)
            out += ClosedDay(typ, st.openDay, st.openN, trailN, trailDays, isBurst)
            st = BurstState(Long.MinValue, 0L,
              ((st.openDay, st.openN) :: st.trail)
                .filter(_._1 >= st.openDay - 6).take(8))
          }
          days.foreach { d =>
            if (st.openDay == Long.MinValue) st = st.copy(openDay = d, openN = 1L)
            else if (d == st.openDay) st = st.copy(openN = st.openN + 1L)
            else { // d > openDay under the in-order contract
              close()
              st = st.copy(openDay = d, openN = 1L)
            }
          }
          state.update(st)
          out.result().iterator
        })
      .toDF()
  }
}
