package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators._

/** Ports of the reference storm goldens (tests/test_events.py:26-79,
  * BASELINE.md): counts {2,1,1,2}, totals {[2,2],[4]}, durations
  * {[2,2],[1,3],[3]} over tiny daily series. */
class StormsSpec extends AnyFunSuite with SparkTestBase {

  private def storms(
      data: Seq[Double],
      startMass: Double = 0.1,
      stopHours: Double = 24,
      totalMass: Double = 0.5,
      maxHours: Double = 336,
      freq: Option[String] = None): Seq[Event] =
    collectEvents(
      StormEvents(startMass, totalMass, stopHours, maxHours, freq)
        .detect(dailySeries(data)))

  // --- counts (tests/test_events.py:26-47) ---------------------------
  test("storm count: two clear storms") {
    assert(storms(Seq(0, 1, 1, 0, 0, 1, 1), 0.1, 24, 1, 300).size == 2)
  }
  test("storm count: stopping hours merge") {
    assert(storms(Seq(0, 0.1, 0.1, 0, 0.1, 0.1), 0.1, 48, 0.1, 300).size == 1)
  }
  test("storm count: min storm total carries candidate across quiet gap") {
    assert(storms(Seq(0.1, 0, 0.1, 0.1), 0.1, 24, 0.2, 300).size == 1)
  }
  test("storm count: max storm hours splits") {
    assert(storms(Seq(0, 0.1, 0, 0.1, 0.1, 0), 0.1, 24, 0.1, 24).size == 2)
  }

  // --- totals (tests/test_events.py:49-62) ---------------------------
  test("storm totals: [2,2] with 24h stop") {
    assert(storms(Seq(0, 1, 1, 0, 0, 1, 1), stopHours = 24)
      .map(_.total.get) == Seq(2.0, 2.0))
  }
  test("storm totals: [4] when 72h stop merges") {
    assert(storms(Seq(0, 1, 1, 0, 0, 1, 1), stopHours = 72)
      .map(_.total.get) == Seq(4.0))
  }

  // --- durations (tests/test_events.py:64-79) ------------------------
  test("storm durations: [2,2] days with back-extension") {
    assert(storms(Seq(0, 1, 1, 0, 0, 1, 1)).map(_.duration_us) ==
      Seq(2 * DayUs, 2 * DayUs))
  }
  test("storm durations: [1,3] days, no back-extension at series head") {
    assert(storms(Seq(0.2, 1, 0, 1, 0.2, 1)).map(_.duration_us) ==
      Seq(1 * DayUs, 3 * DayUs))
  }
  test("storm durations: [3] days single storm") {
    assert(storms(Seq(1, 1, 1, 1)).map(_.duration_us) == Seq(3 * DayUs))
  }

  // --- engine extensions ---------------------------------------------
  test("explicit frequency overrides inference") {
    assert(storms(Seq(0, 1, 1, 0, 0, 1, 1), freq = Some("1D")).size == 2)
  }
  test("irregular series without explicit frequency is skipped, not crashed") {
    // diffs 1d,2d,5d — inference (which skips the final interval,
    // metevents/utilities.py:12) sees {1d,2d} -> None -> reference
    // would crash at to_offset(None); we skip the series.
    val irregular = seriesAt(
      Seq((day(0), 1.0), (day(1), 1.0), (day(3), 1.0), (day(8), 1.0)), "irr")
    assert(collectEvents(StormEvents().detect(irregular)).isEmpty)
  }
  test("last-interval-only irregularity still infers a step (reference quirk)") {
    // day0, day1, day5: the 4-day final interval is excluded from
    // inference -> step 1d; all rows flagged -> one positional run ->
    // one storm spanning the whole series.
    val s = seriesAt(Seq((day(0), 1.0), (day(1), 1.0), (day(5), 1.0)), "tail")
    val ev = collectEvents(StormEvents().detect(s))
    assert(ev.size == 1 && ev.head.duration_us == 5 * DayUs)
  }
  test("multi-series: storms delineated independently per series") {
    val df = dailySeries(Seq(0, 1, 1, 0, 0, 1, 1), "a")
      .unionByName(dailySeries(Seq(1, 1, 1, 1), "b"))
    val ev = collectEvents(StormEvents().detect(df))
    assert(ev.count(_.series_id == "a") == 2 && ev.count(_.series_id == "b") == 1)
  }
}
