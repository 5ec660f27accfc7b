package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.StormEvents
import graft.sources.{CsvStationSource, StationSources}

class StationSourcesSpec extends AnyFunSuite with SparkTestBase {

  private def registry = Map(
    "NRCS" -> new CsvStationSource(getClass.getResource("/station_tum.csv").getPath))

  test("unknown source name raises with valid options listed") {
    val e = intercept[IllegalArgumentException] {
      StationSources.fromStation(registry, spark, "TUM",
        "2022-12-01", "2022-12-20", source = "BOGUS")
    }
    assert(e.getMessage.contains("BOGUS") && e.getMessage.contains("NRCS"))
  }

  test("empty pull raises like the reference") {
    val e = intercept[IllegalArgumentException] {
      StationSources.fromStation(registry, spark, "TUM",
        "1990-01-01", "1990-01-02", source = "NRCS")
    }
    assert(e.getMessage.contains("no data"))
  }

  test("StormEvents.fromStation: reference-shaped entry point end-to-end") {
    val storms = collectEvents(
      graft.operators.StormEvents.fromStation(
        registry, spark, "TUM", "2022-12-01", "2022-12-31", source = "NRCS",
        params = graft.operators.StormEvents(instantMassToStart = 0.1,
          minStormTotal = 0.5, hoursToStop = 24, maxStormHours = 336)))
    assert(storms.length == 2)
  }

  test("toFreqStr round-trips parseMicros for common steps") {
    import graft.operators.Steps
    Seq("D", "2D", "H", "6H", "min", "S", "ms").foreach { f =>
      assert(Steps.parseMicros(Steps.toFreqStr(Steps.parseMicros(f))) == Steps.parseMicros(f))
    }
  }

  test("accumulated precip becomes increments; storms detected end-to-end") {
    val ts = StationSources.fromStation(registry, spark, "TUM",
      "2022-12-01", "2022-12-31", source = "NRCS")
    val rows = ts.collect()
    assert(rows.length == 20)
    // first row's diff is null (pandas diff), day 4 increment = 0.4
    assert(rows.map(r => Option(r.get(2))).count(_.isEmpty) == 1)

    val storms = collectEvents(
      StormEvents(instantMassToStart = 0.1, minStormTotal = 0.5,
        hoursToStop = 24, maxStormHours = 336).detect(ts))
    // two storms: days 4-6 (total 1.3) and days 13-14 (total 1.3);
    // each span back-extends one step (events.py:116)
    assert(storms.length == 2)
    assert(storms(0).total.contains(1.3) && storms(1).total.contains(1.3))
  }
}
