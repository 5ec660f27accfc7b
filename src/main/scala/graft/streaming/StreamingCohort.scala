package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/**
 * Streaming cohort-activity tracking — the continuous twin of
 * [[graft.queries.Relational.ch1CohortRetention]]: as events arrive,
 * each user's cohort day (the epoch day of their first event) pins on
 * first sight, and a row is EMITTED once per NEW (user, day) with the
 * cohort and the day offset. The retention matrix is then an ordinary
 * aggregate over this feed — `groupBy(cohort_day, day_offset)
 * .agg(countDistinct(user_id))` — batch or streaming.
 *
 * State per user is the cohort day plus the set of active days —
 * bounded by the retention horizon (a product metric measured over
 * days-to-weeks), NOT by event volume; no event is retained. Same
 * in-order-per-user arrival contract as [[StreamingFunnel]] /
 * [[StreamingDetectors.runEvents]]; out-of-order feeds compose with
 * [[StreamingReorder]] first. Day indexing matches the batch
 * operator: floor(epoch_us / 86400e6) — computed here from epoch
 * millis, identical because flooring to day granularity cannot be
 * changed by sub-millisecond truncation.
 */
object StreamingCohort {

  final case class CohortReach(
      user_id: Long, cohort_day: Long, day_idx: Long, day_offset: Long)

  final case class CohortState(cohortDay: Long, seen: Array[Long])

  /** `events` must carry (user_id, ts); returns the append-mode
    * (user_id, cohort_day, day_idx, day_offset) activity feed. */
  def cohortActivity(events: DataFrame): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    events.select("user_id", "ts").as[(Long, java.sql.Timestamp)]
      .map { case (u, ts) => (u, Math.floorDiv(ts.getTime, 86400000L)) }
      .groupByKey(_._1)
      .flatMapGroupsWithState(
        OutputMode.Append(), GroupStateTimeout.NoTimeout())(
        (uid: Long, rows: Iterator[(Long, Long)],
         state: GroupState[CohortState]) => {
          val days = rows.map(_._2).toArray.sorted
          val prev = state.getOption
          val cohort = prev.map(_.cohortDay).getOrElse(days.head)
          var seen = prev.map(_.seen.toSet).getOrElse(Set.empty[Long])
          val out = Array.newBuilder[CohortReach]
          days.foreach { d =>
            if (!seen.contains(d)) {
              seen += d
              out += CohortReach(uid, cohort, d, d - cohort)
            }
          }
          state.update(CohortState(cohort, seen.toArray))
          out.result().iterator
        })
      .toDF()
  }
}
