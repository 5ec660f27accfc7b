package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/**
 * Streaming path analysis — the continuous twin of
 * [[graft.queries.TemporalQueries.transitionMatrix]]: as events
 * arrive, each user's (from_type → to_type) STEPS are emitted
 * append-mode, including the step that SPANS a micro-batch boundary
 * (the carried state makes the feed exactly the batch operator's
 * transition multiset). The transition matrix is then an ordinary
 * aggregate over this feed — `groupBy(from_type, to_type).count()` —
 * batch or streaming, which is why the operator emits the raw steps
 * rather than running counts: counts are trivially mergeable, the
 * steps are the part that needs state.
 *
 * State per user is ONE (type) string: under the
 * in-order-per-user arrival contract (the [[StreamingCohort]] /
 * [[StreamingFunnel]] posture; compose with [[StreamingReorder]] for
 * disordered feeds) only the most recent event can pair with a future
 * arrival, so state is O(1) regardless of stream lifetime. Within a
 * batch, rows sort by (ts, event_id) — the batch operator's exact
 * tie rule.
 */
object StreamingPaths {

  final case class Transition(user_id: Long, from_type: String, to_type: String)

  /** `events` must carry (user_id, ts, event_id, event_type); returns
    * the append-mode (user_id, from_type, to_type) step feed,
    * spec-proven count-equal to the batch transitionMatrix on a
    * replayed corpus (StreamingSpec). */
  def transitionSteps(events: DataFrame): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    events.select("user_id", "ts", "event_id", "event_type")
      .as[(Long, java.sql.Timestamp, Long, String)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(
        OutputMode.Append(), GroupStateTimeout.NoTimeout())(
        (uid: Long, rows: Iterator[(Long, java.sql.Timestamp, Long, String)],
         state: GroupState[String]) => {
          // full-microsecond ordering (getTime alone is millis and
          // would let event_id tiebreak sub-ms pairs differently from
          // the batch twin's exact-ts order)
          val sorted = rows.toArray.sortBy(r => (EventTime.toUs(r._2), r._3))
          val out = Array.newBuilder[Transition]
          var last = state.getOption.orNull
          sorted.foreach { r =>
            if (last != null) out += Transition(uid, last, r._4)
            last = r._4
          }
          if (last != null) state.update(last)
          out.result().iterator
        })
      .toDF()
  }
}
