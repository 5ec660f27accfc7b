package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Joins

class JoinsSpec extends AnyFunSuite with SparkTestBase {
  import org.apache.spark.sql.functions._

  test("asof join: latest right row at or before each left ts") {
    val left = seriesAt(Seq(day(1) -> 10.0, day(3) -> 30.0, day(5) -> 50.0), "a")
    val right = seriesAt(Seq(day(0) -> 1.0, day(3) -> 3.0, day(4) -> 4.0), "a")
    val r = Joins.asofJoin(left, right)
      .orderBy("ts")
      .select("asof_value").collect().map(x => Option(x.get(0)))
    // day1 → right day0 (1.0); day3 → right day3 inclusive (3.0); day5 → day4 (4.0)
    assert(r.toSeq == Seq(Some(1.0), Some(3.0), Some(4.0)))
  }

  test("asof join: no preceding right row yields null") {
    val left = seriesAt(Seq(day(0) -> 10.0), "a")
    val right = seriesAt(Seq(day(1) -> 1.0), "a")
    val r = Joins.asofJoin(left, right).collect()
    assert(r.length == 1 && r(0).isNullAt(r(0).fieldIndex("asof_value")))
  }

  test("backward asof: tolerance nulls stale matches, row survives") {
    val left = seriesAt(Seq(day(1) -> 10.0, day(9) -> 90.0), "a")
    val right = seriesAt(Seq(day(0) -> 1.0), "a")
    val r = Joins.asofJoin(left, right, toleranceUs = Some(2 * DayUs))
      .orderBy("ts")
      .select("asof_value").collect().map(x => Option(x.get(0)))
    // day1 → day0 is 1 day stale (within 2d); day9 → day0 is 9 days
    // stale → nulled, but the left row itself survives
    assert(r.toSeq == Seq(Some(1.0), None))
  }

  test("asof join is per-series") {
    val left = seriesAt(Seq(day(2) -> 1.0), "a").union(seriesAt(Seq(day(2) -> 2.0), "b"))
    val right = seriesAt(Seq(day(1) -> 11.0), "a") // series b has no right rows
    val r = Joins.asofJoin(left, right).collect()
      .map(x => (x.getString(0), Option(x.get(x.fieldIndex("asof_value"))))).toMap
    assert(r("a") == Some(11.0) && r("b").isEmpty)
  }

  test("forward asof: earliest right at or after, tolerance nulls far matches") {
    val left = seriesAt(Seq(day(1) -> 10.0, day(3) -> 30.0, day(5) -> 50.0), "a")
    val right = seriesAt(Seq(day(3) -> 3.0, day(9) -> 9.0), "a")
    val r = Joins.asofJoinForward(left, right)
      .orderBy("ts")
      .select("asof_value").collect().map(x => Option(x.get(0)))
    // day1 → day3 (3.0); day3 → day3 inclusive (3.0); day5 → day9 (9.0)
    assert(r.toSeq == Seq(Some(3.0), Some(3.0), Some(9.0)))
    // 3-day tolerance: day5's match at day9 is 4 days out → nulls,
    // the row itself survives (left-join semantics)
    val tol = Joins.asofJoinForward(left, right,
        toleranceUs = Some(3L * 86400L * 1000000L))
      .orderBy("ts")
      .select("asof_value").collect().map(x => Option(x.get(0)))
    assert(tol.toSeq == Seq(Some(3.0), Some(3.0), None))
    // no following right row at all → null
    val none = Joins.asofJoinForward(
        seriesAt(Seq(day(9) -> 1.0), "a"), seriesAt(Seq(day(1) -> 2.0), "a"))
      .collect()
    assert(none.length == 1 && none(0).isNullAt(none(0).fieldIndex("asof_value")))
  }

  test("nearest asof: smaller distance wins, ties go backward, tolerance per side") {
    import org.apache.spark.sql.functions.col
    val left = seriesAt(Seq(day(2) -> 20.0, day(6) -> 60.0, day(10) -> 100.0), "a")
    val right = seriesAt(Seq(day(1) -> 1.0, day(3) -> 3.0, day(20) -> 20.0), "a")
    def run(tol: Option[Long]) = Joins.asofJoinNearest(left, right, tol)
      .orderBy("ts")
      .select("asof_value", "direction").collect()
      .map(r => (Option(r.get(0)), Option(r.get(1))))
    val noTol = run(None)
    // day2: day1 and day3 both 1 day away → TIE → backward (1.0)
    assert(noTol(0) == ((Some(1.0), Some("backward"))))
    // day6: day3 is 3 days back, day20 is 14 ahead → backward (3.0)
    assert(noTol(1) == ((Some(3.0), Some("backward"))))
    // day10: day3 is 7 back, day20 is 10 ahead → backward (3.0)
    assert(noTol(2) == ((Some(3.0), Some("backward"))))
    // 8-day tolerance: day10's backward match (7d) survives; with a
    // 5-day tolerance BOTH sides fail → null, row survives
    assert(run(Some(8 * DayUs))(2) == ((Some(3.0), Some("backward"))))
    assert(run(Some(5 * DayUs))(2) == ((None, None)))
    // when only the forward side is in tolerance, it wins
    val l2 = seriesAt(Seq(day(10) -> 1.0), "a")
    val r2 = seriesAt(Seq(day(0) -> 5.0, day(12) -> 12.0), "a")
    val got = Joins.asofJoinNearest(l2, r2, Some(3 * DayUs)).collect()
    assert(Option(got(0).get(got(0).fieldIndex("asof_value"))) == Some(12.0))
    assert(got(0).getString(got(0).fieldIndex("direction")) == "forward")
  }

  test("asof both directions: null-valued nearest right row pairs its OWN null value") {
    // right day3 has a null value (all-NaN observation); the nearest
    // match must carry (day3, null) — never day3's ts with a value
    // taken from a different row
    val left = seriesAt(Seq(day(2) -> 10.0, day(4) -> 40.0), "a")
    val right = seriesAt(Seq(day(3) -> Double.NaN, day(9) -> 9.0), "a")
    val fwd = Joins.asofJoinForward(left, right).orderBy("ts").collect()
    // day2 → day3 (null value, not day9's 9.0); day4 → day9 (9.0)
    assert(fwd(0).getTimestamp(fwd(0).fieldIndex("asof_ts")) == day(3))
    assert(fwd(0).isNullAt(fwd(0).fieldIndex("asof_value")), fwd(0).toString)
    assert(Option(fwd(1).get(fwd(1).fieldIndex("asof_value"))) == Some(9.0))
    val back = Joins.asofJoin(
        seriesAt(Seq(day(4) -> 40.0), "a"),
        seriesAt(Seq(day(1) -> 1.0, day(3) -> Double.NaN), "a"))
      .collect()
    // backward: nearest is day3 with null value — not day1's 1.0
    assert(back(0).getTimestamp(back(0).fieldIndex("asof_ts")) == day(3))
    assert(back(0).isNullAt(back(0).fieldIndex("asof_value")), back(0).toString)
  }

  test("asof joins match a brute-force reference on random series (property)") {
    val rnd = new scala.util.Random(7)
    // several series, duplicate timestamps across sides, null values
    val left = (0 until 120).map { i =>
      (s"s${i % 3}", day(rnd.nextInt(30)), rnd.nextDouble())
    }
    val right = (0 until 80).map { i =>
      (s"s${i % 3}", day(rnd.nextInt(30)),
        if (rnd.nextInt(5) == 0) Double.NaN else rnd.nextDouble())
    }.distinct
    import spark.implicits._
    val lDf = left.toDF("series_id", "ts", "value")
    val rDf = right.map(r => (r._1, r._2, if (r._3.isNaN) None else Some(r._3)))
      .toDF("series_id", "ts", "value")
    // brute force: nearest by |gap| with deterministic direction
    def expect(forward: Boolean, tolUs: Option[Long]): Map[(String, Long, Int), Option[Long]] =
      left.zipWithIndex.map { case ((sid, ts, _), i) =>
        val cands = right.filter(r => r._1 == sid &&
          (if (forward) r._2.getTime >= ts.getTime else r._2.getTime <= ts.getTime))
        val best =
          if (cands.isEmpty) None
          else Some(if (forward) cands.minBy(_._2.getTime) else cands.maxBy(_._2.getTime))
        val kept = best.filter(b => tolUs.forall(t =>
          math.abs(b._2.getTime - ts.getTime) * 1000L <= t))
        (sid, ts.getTime, i) -> kept.map(_._2.getTime)
      }.toMap
    def got(df: org.apache.spark.sql.DataFrame): Seq[(String, Long, Option[Long])] =
      df.collect().map(r => (r.getString(0), r.getTimestamp(1).getTime,
        Option(r.getTimestamp(r.fieldIndex("asof_ts"))).map(_.getTime))).toSeq
    // backward
    val b = got(Joins.asofJoin(lDf, rDf))
    val eb = expect(forward = false, None)
    assert(b.size == left.size)
    b.groupBy(x => (x._1, x._2)).foreach { case ((sid, ts), rows) =>
      val want = eb.collect { case ((s, t, _), v) if s == sid && t == ts => v }.head
      rows.foreach(r => assert(r._3 == want, s"backward mismatch at ($sid, $ts)"))
    }
    // forward with and without tolerance
    val tol = 5L * 86400L * 1000000L
    Seq(None, Some(tol)).foreach { t =>
      val f = got(Joins.asofJoinForward(lDf, rDf, t))
      val ef = expect(forward = true, t)
      f.groupBy(x => (x._1, x._2)).foreach { case ((sid, ts), rows) =>
        val want = ef.collect { case ((s, t0, _), v) if s == sid && t0 == ts => v }.head
        rows.foreach(r => assert(r._3 == want, s"forward(tol=$t) mismatch at ($sid, $ts)"))
      }
    }
  }

  test("sessionize: gap splits sessions, stats aggregate per session") {
    val ts = seriesAt(Seq(day(0) -> 1.0, day(1) -> 2.0, day(5) -> 3.0, day(6) -> 4.0), "a")
    val sessions = Joins.sessionStats(ts, gap = "2D")
      .orderBy("session_id").collect()
    assert(sessions.length == 2)
    assert(sessions(0).getAs[Long]("n_points") == 2 && sessions(0).getAs[Double]("total") == 3.0)
    assert(sessions(1).getAs[Long]("n_points") == 2 && sessions(1).getAs[Double]("total") == 7.0)
  }

  test("interval stats: inclusive bounds, per-series containment") {
    val pts = seriesAt(Seq(day(0) -> 1.0, day(1) -> 2.0, day(2) -> 3.0, day(3) -> 4.0), "a")
    val iv = spark.createDataFrame(
      java.util.List.of[org.apache.spark.sql.Row](
        org.apache.spark.sql.Row("a", day(1), day(2))),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("series_id", org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("start", org.apache.spark.sql.types.TimestampType),
        org.apache.spark.sql.types.StructField("stop", org.apache.spark.sql.types.TimestampType))))
    val r = Joins.intervalStats(pts, iv).collect()
    assert(r.length == 1)
    assert(r(0).getAs[Long]("n_points") == 2 && r(0).getAs[Double]("total") == 5.0)
  }
}
