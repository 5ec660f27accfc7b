package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators._

/** Kernel-level parity tests for the find_peaks port, against
  * hand-derivable cases and the scipy-documented semantics. */
class FindPeaksSpec extends AnyFunSuite {
  import FindPeaks._

  test("local maxima: simple, plateau midpoint, edges excluded") {
    assert(localMaxima(Array(0, 1, 0).map(_.toDouble)).toSeq == Seq(1))
    // plateau [2,2] at idx 2..3 → midpoint (2+3)/2 = 2
    assert(localMaxima(Array(0.0, 1.0, 2.0, 2.0, 1.0, 0.0)).toSeq == Seq(2))
    // rising to the edge is not a peak; first/last samples excluded
    assert(localMaxima(Array(0.0, 1.0, 2.0)).isEmpty)
    assert(localMaxima(Array(2.0, 1.0, 0.0)).isEmpty)
    // plateau touching the edge is not a peak
    assert(localMaxima(Array(0.0, 2.0, 2.0)).isEmpty)
  }

  test("NaN never forms a peak and breaks plateaus") {
    assert(localMaxima(Array(0.0, Double.NaN, 0.0)).isEmpty)
    assert(localMaxima(Array(0.0, 1.0, Double.NaN, 1.0, 0.0)).isEmpty)
  }

  test("prominence: bounded by nearest higher sample") {
    // x = [0,5,1,3,1] — peak at 1: windows run to both edges, minima
    // 0 (left) and 1 (right) → prom = 5 − max(0,1) = 4; peak at 3:
    // left window stops at the higher 5, min is 1 → prom = 2.
    val x = Array(0.0, 5.0, 1.0, 3.0, 1.0)
    val pk = localMaxima(x)
    assert(pk.toSeq == Seq(1, 3))
    val pr = prominences(x, pk)
    assert(pr(0).value == 4.0)
    assert(pr(1).value == 2.0)
  }

  test("width at half prominence with interpolation") {
    // symmetric triangle 0,2,0: prom 2, eval height 1, crossings at
    // ±0.5 → width 1.0
    val x = Array(0.0, 2.0, 0.0)
    val pks = findPeaks(x, Params(prominence = Some(0.1), widthMax = 100))
    assert(pks.length == 1)
    assert(math.abs(pks(0).width - 1.0) < 1e-12)
  }

  test("height and threshold filters") {
    val x = Array(0.0, 1.0, 0.0, 3.0, 0.0)
    assert(findPeaks(x, Params(height = Some(2.0), prominence = None, widthMax = 100))
      .map(_.midpoint).toSeq == Seq(3))
    assert(findPeaks(x, Params(threshold = Some(2.0), prominence = None, widthMax = 100))
      .map(_.midpoint).toSeq == Seq(3))
  }

  test("width filter keeps narrow peaks only (reference default (0,3))") {
    // wide plateau-ish peak: 0,1,2,3,3.5,3,2,1,0 → width ≈ wide → dropped
    val wide = Array(0.0, 1.0, 2.0, 3.0, 3.5, 3.0, 2.0, 1.0, 0.0)
    assert(findPeaks(wide, Params(prominence = Some(1.0))).isEmpty)
    val narrow = Array(0.0, 0.0, 5.0, 0.0, 0.0)
    assert(findPeaks(narrow, Params(prominence = Some(1.0))).length == 1)
  }
}

/** flv.csv golden conformance — the reference's 33 SpikeValley
  * assertions (tests/test_events.py:98-176): 11 events with exact
  * start/stop/duration under default parameters. */
class SpikeValleySpec extends AnyFunSuite with SparkTestBase {

  private lazy val flv = {
    val path = getClass.getResource("/flv.csv").getPath
    spark.read
      .option("header", "true")
      .csv(path)
      .select(
        lit("FLV").as("series_id"),
        to_timestamp(col("datetime"), "yyyy-MM-dd HH:mm:ssXXX").as("ts"),
        col("SNOWDEPTH").cast("double").as("value"))
  }

  private val golden = Seq(
    // (start, stop, duration days)
    ("2022-11-01T08:00:00", "2022-11-04T08:00:00", 3),
    ("2022-11-11T08:00:00", "2022-11-14T08:00:00", 3),
    ("2022-11-30T08:00:00", "2022-12-14T08:00:00", 14),
    ("2022-12-29T08:00:00", "2023-01-02T08:00:00", 4),
    ("2023-01-04T08:00:00", "2023-01-07T08:00:00", 3),
    ("2023-01-15T08:00:00", "2023-01-20T08:00:00", 5),
    ("2023-01-28T08:00:00", "2023-01-31T08:00:00", 3),
    ("2023-02-04T08:00:00", "2023-02-07T08:00:00", 3),
    ("2023-02-12T08:00:00", "2023-02-17T08:00:00", 5),
    ("2023-02-19T08:00:00", "2023-03-05T08:00:00", 14),
    ("2023-04-23T08:00:00", "2023-04-26T08:00:00", 3))

  test("flv.csv produces the reference's 11 golden events") {
    val events = collectEvents(SpikeValleyEvents().detect(flv))
    assert(events.length == 11)
    events.zip(golden).foreach { case (e, (start, stop, days)) =>
      assert(e.start == ts(start), s"start mismatch vs $start")
      assert(e.stop == ts(stop), s"stop mismatch vs $stop")
      assert(e.duration_us == days.toLong * DayUs, s"duration mismatch vs $days d")
    }
  }

  test("multi-series: kernel is independent per series_id") {
    val two = flv.union(flv.withColumn("series_id", lit("FLV2")))
    val events = collectEvents(SpikeValleyEvents().detect(two))
    assert(events.length == 22)
    assert(events.count(_.series_id == "FLV2") == 11)
  }
}
