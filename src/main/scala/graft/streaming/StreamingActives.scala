package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Streaming DAILY ACTIVE USERS — the continuous form of
 * [[graft.queries.TemporalQueries.activeUsers]]' DAU column, built
 * from the two CANONICAL Structured Streaming building blocks rather
 * than custom state: watermarked `dropDuplicates` bounds the
 * per-(user, day) dedup state to the watermark horizon, and the
 * watermarked 1-day window aggregate emits each day's distinct-user
 * count EXACTLY ONCE, when the watermark passes the day's end
 * (append mode — no retractions, no open-day estimates; the still
 * open day belongs to the batch layer, the StreamingScd posture).
 *
 * State: O(active users per in-flight day) dedup keys + O(1) count
 * per open window — both watermark-evicted. The rolling 7/28-day
 * counts stay BATCH (au1's expansion form needs each user-day in w
 * windows; the lambda layout computes them over the closed-day
 * store this feed lands in).
 */
object StreamingActives {

  /** `events` must carry (user_id, ts). Emits (day, dau) per CLOSED
    * day; `lateness` is the out-of-order tolerance (watermark). */
  def dailyActive(events: DataFrame, lateness: String = "1 day"): DataFrame =
    events
      .select(col("user_id"), date_trunc("DAY", col("ts")).as("day"))
      .withWatermark("day", lateness)
      .dropDuplicates("user_id", "day")
      .groupBy(window(col("day"), "1 day"))
      .agg(count(lit(1)).as("dau"))
      .select(col("window.start").as("day"), col("dau"))
}
