package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.Joins
import graft.operators.Kernels.nanToNull
import graft.sources.Tables

/** Driver-contract queries for the temporal join operators (as-of,
  * interval containment, sessionization), cross-checked against
  * DuckDB's native ASOF JOIN / BETWEEN semantics. */
object TemporalQueries {

  /** One event_type slice of the events table as a canonical series
    * frame, pre-aggregated to one row per (series, ts) so as-of tie
    * behavior is deterministic. */
  private def typedSeries(spark: SparkSession, dir: String, typ: String): DataFrame =
    Tables.read(spark, dir, "events")
      .where(col("event_type") === typ)
      .select(col("user_id").cast("string").as("series_id"), col("ts"),
        nanToNull(col("value")).as("value"))
      .groupBy("series_id", "ts")
      .agg(max(col("value")).as("value"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "aj1_asof_join" -> ((s, dir) =>
      Joins.asofJoin(
        typedSeries(s, dir, "click"), typedSeries(s, dir, "purchase"))),
    // forward direction with a 3-day tolerance — matches farther out
    // null (pandas merge_asof direction='forward', tolerance)
    "aj2_asof_forward" -> ((s, dir) =>
      Joins.asofJoinForward(
        typedSeries(s, dir, "click"), typedSeries(s, dir, "purchase"),
        toleranceUs = Some(3L * 86400L * 1000000L))),
    // backward direction with the same 3-day staleness bound — the
    // pandas merge_asof (backward, tolerance) pair to aj2
    "aj3_asof_tolerance" -> ((s, dir) =>
      Joins.asofJoin(
        typedSeries(s, dir, "click"), typedSeries(s, dir, "purchase"),
        toleranceUs = Some(3L * 86400L * 1000000L))),
    "ij1_interval_stats" -> ((s, dir) =>
      Joins.intervalStats(
        SparkEntryBridge.canonical(s, dir),
        graft.operators.ExtremeValueEvents(expectedMax = 300.0, expectedMin = 0.05)
          .detect(SparkEntryBridge.canonical(s, dir)))),
    "ss1_session_stats" -> ((s, dir) =>
      Joins.sessionStats(SparkEntryBridge.canonical(s, dir), gap = "6H"))
  )

  private val typedCte = (typ: String) =>
    s"""SELECT series_id, ts, max(value) AS value FROM (
       |  SELECT CAST(user_id AS VARCHAR) AS series_id, ts,
       |    CASE WHEN isnan(value) THEN NULL ELSE value END AS value
       |  FROM events WHERE event_type = '$typ') GROUP BY series_id, ts""".stripMargin

  private val ptsCte =
    """SELECT CAST(user_id AS VARCHAR) AS series_id, ts,
      | CASE WHEN isnan(value) THEN NULL ELSE value END AS value FROM events""".stripMargin

  /** The d6 oracle (extreme-value events) inlined as a subquery for
    * the interval join twin. */
  private def d6Sql: String = graft.SparkEntry.detectorOracle("d6_extreme_value")

  val oracle: Map[String, String] = Map(
    "aj1_asof_join" ->
      s"""WITH l AS (${typedCte("click")}),
         |r AS (SELECT series_id, ts AS r_ts, value AS r_val FROM (${typedCte("purchase")}))
         |SELECT l.series_id, l.ts, l.value, r.r_ts AS asof_ts, r.r_val AS asof_value
         |FROM l ASOF LEFT JOIN r
         |ON l.series_id = r.series_id AND r.r_ts <= l.ts""".stripMargin,
    "aj2_asof_forward" -> {
      val tol = 3L * 86400L * 1000000L
      s"""WITH l AS (${typedCte("click")}),
         |r AS (SELECT series_id, ts AS r_ts, value AS r_val FROM (${typedCte("purchase")})),
         |j AS (SELECT l.series_id, l.ts, l.value, r.r_ts, r.r_val
         |  FROM l ASOF LEFT JOIN r
         |  ON l.series_id = r.series_id AND r.r_ts >= l.ts)
         |SELECT series_id, ts, value,
         |  CASE WHEN r_ts IS NOT NULL AND epoch_us(r_ts) - epoch_us(ts) <= $tol
         |    THEN r_ts END AS asof_ts,
         |  CASE WHEN r_ts IS NOT NULL AND epoch_us(r_ts) - epoch_us(ts) <= $tol
         |    THEN r_val END AS asof_value
         |FROM j""".stripMargin
    },
    "aj3_asof_tolerance" -> {
      val tol = 3L * 86400L * 1000000L
      s"""WITH l AS (${typedCte("click")}),
         |r AS (SELECT series_id, ts AS r_ts, value AS r_val FROM (${typedCte("purchase")})),
         |j AS (SELECT l.series_id, l.ts, l.value, r.r_ts, r.r_val
         |  FROM l ASOF LEFT JOIN r
         |  ON l.series_id = r.series_id AND r.r_ts <= l.ts)
         |SELECT series_id, ts, value,
         |  CASE WHEN r_ts IS NOT NULL AND epoch_us(ts) - epoch_us(r_ts) <= $tol
         |    THEN r_ts END AS asof_ts,
         |  CASE WHEN r_ts IS NOT NULL AND epoch_us(ts) - epoch_us(r_ts) <= $tol
         |    THEN r_val END AS asof_value
         |FROM j""".stripMargin
    },
    "ij1_interval_stats" ->
      s"""WITH pts AS ($ptsCte),
         |ev AS (SELECT * FROM ($d6Sql))
         |SELECT pts.series_id, "start", "stop",
         |  count(*) AS n_points,
         |  ROUND(COALESCE(SUM(value), 0.0), 6) AS total,
         |  ROUND(AVG(value), 6) AS mean
         |FROM pts JOIN ev ON pts.series_id = ev.series_id
         |  AND pts.ts BETWEEN "start" AND "stop"
         |GROUP BY 1, 2, 3""".stripMargin,
    "ss1_session_stats" ->
      s"""WITH t AS ($ptsCte),
         |s AS (SELECT *, CAST(SUM(is_new) OVER (PARTITION BY series_id ORDER BY ts
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
         |  FROM (SELECT *, CASE WHEN prev_us IS NULL
         |      OR epoch_us(ts) - prev_us > ${6L * 3600L * 1000000L} THEN 1 ELSE 0 END AS is_new
         |    FROM (SELECT *, epoch_us(lag(ts) OVER (PARTITION BY series_id ORDER BY ts)) AS prev_us
         |      FROM t)))
         |SELECT series_id, session_id, min(ts) AS "start", max(ts) AS "stop",
         |  count(*) AS n_points, ROUND(COALESCE(SUM(value), 0.0), 6) AS total
         |FROM s GROUP BY series_id, session_id""".stripMargin
  )
}

/** Small indirection to avoid a circular val-initialization between
  * SparkEntry.queries and this object (SparkEntry references
  * TemporalQueries.queries; our queries only need the canonical
  * loader, resolved at call time). */
private object SparkEntryBridge {
  def canonical(s: SparkSession, dir: String): DataFrame =
    graft.SparkEntry.canonicalEvents(s, dir)
}
