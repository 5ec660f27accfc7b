package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/**
 * Streaming ordered-funnel tracking — the continuous twin of
 * [[graft.queries.TemporalQueries.funnel]]: as events arrive, each
 * user's progress through the stage sequence advances in
 * `flatMapGroupsWithState` state, and a row is EMITTED the moment a
 * stage is first reached (live conversion feed; downstream counts per
 * stage are an ordinary streaming aggregate over this output).
 *
 * State per user is one boolean per stage — O(#stages) bytes, the
 * smallest state any funnel can carry; no event is ever retained.
 * Semantics match the batch operator exactly: stage k+1 is reached at
 * the first stage-(k+1) event at-or-after stage k's reach, ties
 * within a timestamp resolve by event_id (rows are sorted by
 * (ts, event_id) inside each micro-batch). Same ordering assumption
 * as [[StreamingDetectors.runEvents]], documented there: batches
 * arrive in event-time order per user; out-of-order feeds compose
 * with [[StreamingReorder]] first.
 */
object StreamingFunnel {

  final case class FunnelReach(
      user_id: Long, stage: String, stage_idx: Int,
      reached_at: java.sql.Timestamp)

  /** Per-user progress: reached(i) = stage i has been reached. */
  final case class FunnelState(reached: Array[Boolean])

  /** `events` must carry (user_id, ts, event_id, event_type); returns
    * the append-mode (user_id, stage, stage_idx, reached_at) feed. */
  def funnelReaches(events: DataFrame, stages: Seq[String]): DataFrame = {
    require(stages.nonEmpty && stages.distinct == stages,
      s"funnel: stages must be non-empty and distinct: $stages")
    val spark = events.sparkSession
    import spark.implicits._
    val stageIdx = stages.zipWithIndex.toMap
    events
      .select(col("user_id").cast("long"), col("ts"),
        col("event_id").cast("long"), col("event_type"))
      .as[(Long, java.sql.Timestamp, Long, String)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(
        OutputMode.Append(), GroupStateTimeout.NoTimeout())(
        (uid: Long,
         rows: Iterator[(Long, java.sql.Timestamp, Long, String)],
         state: GroupState[FunnelState]) => {
          val reached = state.getOption.map(_.reached.clone())
            .getOrElse(Array.fill(stages.length)(false))
          val out = Array.newBuilder[FunnelReach]
          rows.toArray.sortBy(r => (r._2.getTime, r._3)).foreach {
            case (_, ts, _, typ) =>
              stageIdx.get(typ).foreach { k =>
                if (!reached(k) && (k == 0 || reached(k - 1))) {
                  reached(k) = true
                  out += FunnelReach(uid, stages(k), k, ts)
                }
              }
          }
          state.update(FunnelState(reached))
          out.result().iterator
        })
      .toDF()
  }
}
