package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/**
 * Watermark-buffered event-time reorder. The stateful detectors
 * ([[StreamingDetectors]] storms/runEvents, [[StreamingStations]]
 * increments) assume rows arrive in event-time order per series
 * ACROSS micro-batches — true for station polls, not for general
 * feeds. This stage lifts that contract: rows buffer in per-series
 * state and release in event-time order only once the watermark has
 * passed them, so everything downstream sees an in-order stream.
 *
 * Mechanics: input must carry `withWatermark("ts", delay)`. Each
 * trigger folds new rows into the buffer and emits the sorted prefix
 * with `ts <= current watermark`; an event-time timeout is armed at
 * the earliest still-buffered timestamp so a series with no new rows
 * still flushes as the watermark advances past its buffer. Rows later
 * than the watermark when they arrive are by definition within the
 * delay, so nothing is dropped that the watermark contract keeps;
 * rows later than the delay are the watermark's documented loss mode,
 * same as any windowed aggregation.
 *
 * State per series is O(rows inside the watermark delay), the same
 * bound a session/window aggregation holds.
 *
 * Chaining a detector after this stage trips Spark's GLOBAL
 * correctness check ("stateful operation which can emit rows older
 * than the current watermark"): released rows sit at/just below the
 * watermark by design. The graft detectors downstream are safe —
 * they use NoTimeout state with no event-time eviction, so a
 * sub-watermark row is processed, never dropped — which is exactly
 * the case the check's escape hatch exists for: set
 * `spark.sql.streaming.statefulOperator.checkCorrectness.enabled=false`
 * for the chained query (spec-tested end-to-end in StreamingSpec).
 * Do NOT chain this into watermark-evicting sinks (windowed aggs,
 * dropDuplicatesWithinWatermark) without re-deriving their lateness
 * budget: rows arrive up to one full delay "late" by construction.
 */
object StreamingReorder {

  /** Buffered (tsMicros, value) rows awaiting watermark release. */
  final case class ReorderState(buffered: List[(Long, Option[Double])])

  /** (series_id, ts, value) stream → same rows, per-series event-time
    * ordered across batches once the watermark passes them. */
  def reorderByEventTime(ts: DataFrame): DataFrame = {
    val spark = ts.sparkSession
    import spark.implicits._

    ts.select(col("series_id"), col("ts"), col("value"))
      .as[(String, java.sql.Timestamp, Option[Double])]
      .groupByKey(_._1)
      .flatMapGroupsWithState(
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(
        (sid: String,
         rows: Iterator[(String, java.sql.Timestamp, Option[Double])],
         state: GroupState[ReorderState]) => {
          val wmMs = state.getCurrentWatermarkMs()
          // full-precision micros — sub-ms event times must survive
          // the buffer round-trip or same-ms rows lose their true order
          val incoming = rows.map { case (_, t, v) =>
            (graft.operators.TimeMicros.micros(t), v)
          }.toList
          val all = (state.getOption.map(_.buffered).getOrElse(Nil) ++ incoming)
            .sortBy(_._1)
          val (release, keep) = all.partition(_._1 <= wmMs * 1000L)
          if (keep.isEmpty) {
            if (state.exists) state.remove()
          } else {
            state.update(ReorderState(keep))
            // flush when the watermark REACHES the earliest held row,
            // even if this series gets no further input: timeouts fire
            // on wm > ts, so arm 1 ms before the row (clamped above
            // the current watermark, as the API requires)
            state.setTimeoutTimestamp(math.max(
              Math.floorDiv(keep.head._1, 1000L) - 1L, wmMs + 1L))
          }
          release.iterator.map { case (us, v) =>
            (sid, graft.operators.TimeMicros.timestamp(us), v)
          }
        })
      .toDF("series_id", "ts", "value")
  }
}
