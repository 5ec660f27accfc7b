package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Station source adapter — StormEvents.from_station
 * (metevents/events.py:123-165). The reference resolves a source name
 * to a metloom HTTP client (NRCS/CDEC/MESOWEST), pulls daily
 * accumulated precipitation, and feeds the first difference (per-step
 * increments) to the storm detector.
 *
 * Engine shape: the fetch is behind [[StationSource]] so live HTTP
 * clients and recorded fixtures are interchangeable (FIXTURES.md §3 —
 * CI never touches the network). The fetched frame enters Spark via
 * one `spark.read`/`createDataFrame` at the driver boundary; the
 * accumulated→increment conversion is the same lag-diff the detectors
 * use, partitioned by series.
 */
trait StationSource extends Serializable {

  /** Daily accumulated-precipitation series for one station:
    * (ts TIMESTAMP, accum DOUBLE). Empty result is the caller's error
    * case, matching the reference (events.py:156-161). */
  def fetchDailyAccum(
      spark: SparkSession, stationId: String, start: String, stop: String): DataFrame
}

/** Recorded-fixture source: a CSV with `datetime` and an accumulation
  * column — the replacement for the reference's live CDEC/NRCS tests. */
final class CsvStationSource(path: String, accumCol: String = "PRECIPITATIONACCUM")
    extends StationSource {
  def fetchDailyAccum(
      spark: SparkSession, stationId: String, start: String, stop: String): DataFrame =
    spark.read.option("header", "true").csv(path)
      .where(col("datetime") >= start && col("datetime") <= stop)
      .select(
        to_timestamp(col("datetime"), "yyyy-MM-dd HH:mm:ssXXX").as("ts"),
        col(accumCol).cast("double").as("accum"))
}

object StationSources {

  /** Known source names, mirroring the reference's registry
    * (events.py:139-143); fixtures register under the same keys. */
  def fromStation(
      registry: Map[String, StationSource],
      spark: SparkSession,
      stationId: String,
      start: String,
      stop: String,
      source: String = "NRCS"): DataFrame = {
    val src = registry.getOrElse(source.toUpperCase,
      throw new IllegalArgumentException(
        s"Datasource $source is not recognized. Valid options are: " +
          registry.keys.toSeq.sorted.mkString(", ")))
    val accum = src.fetchDailyAccum(spark, stationId, start, stop)
    if (accum.isEmpty)
      throw new IllegalArgumentException(
        s"Station $stationId has no data between $start and $stop")

    // accumulated → per-step increments: pandas `accum.diff()`
    // (events.py:165) = value − lag(value) per series
    import org.apache.spark.sql.expressions.Window
    accum
      .select(lit(stationId).as("series_id"), col("ts"), col("accum"))
      .withColumn("value",
        col("accum") - lag(col("accum"), 1)
          .over(Window.partitionBy("series_id").orderBy("ts")))
      .select("series_id", "ts", "value")
  }
}
