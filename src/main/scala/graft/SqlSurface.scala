package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators._

/**
 * SQL surface: registers the canonical frame and lazy detector views
 * so the whole engine is reachable from `spark.sql(...)` (SURVEY.md
 * §7.3 — views rather than UDTFs: detectors are window-shaped, not
 * row-generators, so a view over the lazy DataFrame plan is the
 * faithful exposure; Catalyst still optimizes through it). Also
 * registers the native `graft_dot` / `graft_isect` functions.
 */
object SqlSurface {

  /** View names created, for discovery. */
  val Views: Seq[String] = Seq(
    "graft_series",
    "graft_extreme_value_events", "graft_flat_line_events",
    "graft_extreme_change_events", "graft_data_gap_events",
    "graft_storm_events", "graft_spike_valley_events",
    "graft_inferred_steps")

  def register(
      ts: DataFrame,
      storm: StormEvents = StormEvents(frequency = Some("1D")),
      extremeValue: ExtremeValueEvents = ExtremeValueEvents(),
      flatLine: FlatLineEvents = FlatLineEvents(),
      extremeChange: ExtremeChangeEvents = ExtremeChangeEvents(),
      dataGap: DataGapEvents = DataGapEvents(),
      spikeValley: SpikeValleyEvents = SpikeValleyEvents()): Unit = {
    graft.functions.GraftFunctions.register(ts.sparkSession)
    ts.createOrReplaceTempView("graft_series")
    extremeValue.detect(ts).createOrReplaceTempView("graft_extreme_value_events")
    flatLine.detect(ts).createOrReplaceTempView("graft_flat_line_events")
    extremeChange.detect(ts).createOrReplaceTempView("graft_extreme_change_events")
    dataGap.detect(ts).createOrReplaceTempView("graft_data_gap_events")
    storm.detect(ts).createOrReplaceTempView("graft_storm_events")
    spikeValley.detect(ts).createOrReplaceTempView("graft_spike_valley_events")
    Kernels.inferStep(ts).createOrReplaceTempView("graft_inferred_steps")
  }
}
