package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Streaming temporal joins — the continuous twin of
 * [[graft.operators.Joins]] (the one operator family that had no
 * streaming counterpart through round 9). First increment:
 * stream-vs-STATIC as-of, the production shape where the right side
 * is a slowly-changing reference (calibration tables, sensor
 * metadata, exchange rates) that changes on deploy cadence, not row
 * cadence.
 *
 * Design: because the right side is static, the join needs NO state
 * store and no watermark at all — each arriving left row resolves
 * independently against the frozen right index, so the query is
 * STATELESS append mode (the same posture as
 * [[StreamingDedup.streamingDecontaminate]]: broadcast reference +
 * per-row lookup). A watermark only becomes necessary for the
 * stream-vs-stream form, where the right side itself arrives late —
 * that form composes Spark's interval join (`right.ts BETWEEN
 * left.ts - staleness AND left.ts` under watermarks) with a
 * latest-match selection, and its batch semantics are already owned
 * by [[graft.operators.Joins.asofJoin]] run per micro-batch via
 * foreachBatch; the guard message below names that route.
 *
 * Semantics match [[graft.operators.Joins.asofJoin]] exactly
 * (spec-proven equal on a replayed corpus, StreamingSpec): for each
 * left row the LATEST right row with `right.ts <= left.ts` in the
 * same series (inclusive on ties; with several right rows at one
 * (series, ts) the last in storage order wins — feed a
 * one-row-per-(series, ts) right frame for determinism, the same
 * contract the aj1 gate key establishes with its pre-aggregation),
 * nulled when staler than `toleranceUs`.
 */
object StreamingJoins {

  /** The static right side at or below this many rows may be
    * collected and broadcast as the per-series sorted lookup index
    * (~24 B/row → 5M rows ≈ 120 MB). LOUD BOUND, same shape as
    * [[StreamingDedup.maxDriverGramSet]]: above it the collect
    * REFUSES with the foreachBatch alternative named, instead of
    * silently OOMing the driver on a fact-sized right side. */
  val maxStaticRightRows: Long = 5000000L

  /** Per-series right index: event-time micros (sorted ascending, the
    * binary-search key), the original timestamp, and the (nullable)
    * value at that timestamp. */
  private final case class RightIndex(
      tsUs: Array[Long], ts: Array[java.sql.Timestamp], value: Array[java.lang.Double])

  private def toUs(t: java.sql.Timestamp): Long =
    Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L

  /**
   * Stream-vs-static as-of join. `left` is a streaming frame with the
   * canonical (series_id, ts, value) columns; `right` is a STATIC
   * frame of the same shape. Output matches the batch
   * [[graft.operators.Joins.asofJoin]]: left columns + `asof_ts`,
   * `asof_value` (null when no right row precedes / none within
   * `toleranceUs`).
   *
   * Scale posture: the broadcast index is O(right) and guarded by
   * `maxRightRows`; per-row cost is one binary search (O(log r) in
   * the series' right rows); zero exchanges, zero state store — the
   * stream side never shuffles and nothing accumulates across
   * micro-batches.
   */
  def streamingAsofJoinStatic(
      left: DataFrame, right: DataFrame,
      toleranceUs: Option[Long] = None,
      maxRightRows: Long = maxStaticRightRows): DataFrame = {
    val spark = left.sparkSession
    import spark.implicits._
    val n = right.count()
    require(n <= maxRightRows,
      s"streamingAsofJoinStatic: static right side has $n rows > " +
        s"maxStaticRightRows=$maxRightRows — too large to broadcast as a " +
        "driver index; run the batch as-of join per micro-batch via " +
        "foreachBatch instead (graft.operators.Joins.asofJoin)")
    val rows = right
      .select(col("series_id").cast("string"), col("ts"), col("value"))
      .as[(String, java.sql.Timestamp, Option[Double])].collect()
    val index: Map[String, RightIndex] = rows.groupBy(_._1).map {
      case (sid, rs) =>
        // stable sort: equal-ts right rows keep storage order, and the
        // search below picks the LAST at-or-before match — the batch
        // last(...) carry's tie behavior
        val sorted = rs.sortBy(r => toUs(r._2))
        sid -> RightIndex(
          sorted.map(r => toUs(r._2)),
          sorted.map(_._2),
          sorted.map(r => r._3.map(Double.box).orNull))
    }
    val bc = spark.sparkContext.broadcast(index)
    val tol = toleranceUs
    left.select(col("series_id").cast("string"), col("ts"), col("value"))
      .as[(String, java.sql.Timestamp, Option[Double])]
      .map { case (sid, ts, v) =>
        val hit: Option[Int] = bc.value.get(sid).flatMap { idx =>
          val t = toUs(ts)
          // last position with tsUs <= t (upper bound - 1)
          var lo = 0
          var hi = idx.tsUs.length // exclusive
          while (lo < hi) {
            val mid = (lo + hi) >>> 1
            if (idx.tsUs(mid) <= t) lo = mid + 1 else hi = mid
          }
          if (lo == 0) None
          else if (tol.exists(tl => t - idx.tsUs(lo - 1) > tl)) None
          else Some(lo - 1)
        }
        val m = hit.map { i =>
          val idx = bc.value(sid)
          (idx.ts(i), Option(idx.value(i)).map(_.doubleValue))
        }
        (sid, ts, v, m.map(_._1), m.flatMap(_._2))
      }
      .toDF("series_id", "ts", "value", "asof_ts", "asof_value")
  }
}
