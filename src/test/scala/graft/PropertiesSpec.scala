package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators._

/** Property tests over seeded random series (SURVEY.md §5): structural
  * invariants every detector must hold regardless of input. Seeds are
  * fixed for reproducibility. */
class PropertiesSpec extends AnyFunSuite with SparkTestBase {

  private def randomSeries(seed: Long, n: Int = 40): List[Double] = {
    val r = new scala.util.Random(seed)
    List.fill(n) {
      r.nextInt(10) match {
        case 0 | 1  => Double.NaN
        case 2 | 3  => 500.0 + r.nextDouble() * 500.0
        case _      => -5.0 + r.nextDouble() * 10.0
      }
    }
  }

  private def checkInvariants(events: Seq[Event], nPoints: Long): Unit = {
    events.groupBy(_.series_id).values.foreach { evs =>
      val sorted = evs.sortBy(_.start.getTime)
      sorted.sliding(2).foreach {
        case Seq(a, b) => assert(a.stop.getTime < b.start.getTime,
          s"overlapping events: $a / $b")
        case _ =>
      }
    }
    events.foreach { e =>
      assert(e.start.getTime <= e.stop.getTime)
      assert(e.duration_us == (e.stop.getTime - e.start.getTime) * 1000L)
      assert(e.n_points >= 1 && e.n_points <= nPoints)
    }
  }

  test("extreme-value events: disjoint maximal runs inside flagged support") {
    (1L to 8L).foreach { seed =>
      val vals = randomSeries(seed)
      val events = collectEvents(ExtremeValueEvents(400.0, -10.0).detect(dailySeries(vals)))
      checkInvariants(events, vals.length.toLong)
      val flagged = vals.zipWithIndex.collect {
        case (v, i) if !v.isNaN && (v > 400.0 || v < -10.0) => day(i).getTime
      }.toSet
      events.foreach { e =>
        var t = e.start.getTime
        while (t <= e.stop.getTime) {
          assert(flagged.contains(t), s"unflagged point inside event at $t (seed $seed)")
          t += 86400000L
        }
      }
      assert(events.map(_.n_points).sum == flagged.size.toLong, s"non-maximal runs (seed $seed)")
    }
  }

  test("flat-line events: at least minLen points") {
    (1L to 8L).foreach { seed =>
      val r = new scala.util.Random(seed)
      val vals = List.fill(30)(r.nextInt(4) match {
        case 0 => Double.NaN
        case 1 => 2.0
        case _ => 1.0
      })
      val events = collectEvents(FlatLineEvents(minLen = 3, slopeThresh = 0.0)
        .detect(dailySeries(vals)))
      checkInvariants(events, vals.length.toLong)
      events.foreach(e => assert(e.n_points >= 3))
    }
  }

  test("storm events: every non-final storm total >= minStormTotal") {
    (1L to 8L).foreach { seed =>
      val r = new scala.util.Random(seed)
      val vals = List.fill(30)(r.nextDouble())
      val events = collectEvents(
        StormEvents(instantMassToStart = 0.5, minStormTotal = 2.0,
          hoursToStop = 24, maxStormHours = 72, frequency = Some("1D"))
          .detect(dailySeries(vals)))
      checkInvariants(events, vals.length.toLong)
      events.dropRight(1).foreach { e =>
        assert(e.total.exists(_ >= 2.0 - 1e-9), s"storm below min total: $e (seed $seed)")
      }
    }
  }

  test("data-gap events: duration >= min_len * step") {
    (1L to 8L).foreach { seed =>
      val r = new scala.util.Random(seed)
      val vals = List.fill(30)(if (r.nextInt(3) == 0) Double.NaN else r.nextDouble() * 10)
      val events = collectEvents(DataGapEvents(minLen = 2, expectedFrequency = "1D")
        .detect(dailySeries(vals)))
      events.foreach(e => assert(e.duration_us >= 2L * DayUs))
    }
  }
}
