package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** r2_interpolate semantics against pandas `Series.interpolate()`
  * behavior: interior nulls time-weighted linear, trailing nulls carry
  * the last value, leading nulls stay null. (The DuckDB oracle gate
  * covers engine parity; this pins the pandas-faithful contract on a
  * hand-checked series, including irregular spacing.) */
class InterpolateSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def run(points: Seq[(Int, Double)]): Map[Int, Option[Double]] = {
    // write a small canonical-shaped frame through the real query path
    val df = points.map { case (d, v) =>
      (s"e$d", day(d), "7", "obs", v, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val dir = java.nio.file.Files.createTempDirectory("interp").toString
    df.write.mode("overwrite").parquet(s"$dir/events.parquet")
    graft.queries.TimeSeriesQueries.r2Interpolate(spark, dir)
      .select(dayofmonth(col("ts")).as("d"), col("value_interp"))
      .collect().map(r => (r.getInt(0) - 1,
        if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
  }

  test("interior linear, trailing ffill, leading null") {
    // days: 0=null(leading) 1=10 2=null 3=null 4=40 6=null(trailing after gap)
    val got = run(Seq(0 -> Double.NaN, 1 -> 10.0, 2 -> Double.NaN,
      3 -> Double.NaN, 4 -> 40.0, 6 -> Double.NaN))
    assert(got(0).isEmpty)                 // leading stays null
    assert(got(1).contains(10.0))
    assert(got(2).contains(20.0))          // 1/3 of the way 10 -> 40
    assert(got(3).contains(30.0))
    assert(got(4).contains(40.0))
    assert(got(6).contains(40.0))          // trailing carries last value
  }

  test("irregular spacing weights by time, not row position") {
    // values at day 0 (=0.0) and day 10 (=100.0); null at day 4 -> 40.0
    val got = run(Seq(0 -> 0.0, 4 -> Double.NaN, 10 -> 100.0))
    assert(got(4).contains(40.0))
  }
}
