package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators._
import graft.operators.Kernels._

/** The chunked kernel must be row-for-row identical to the standard
  * single-sort path for ANY chunk size — including runs spanning many
  * chunks, all-unflagged chunks, empty chunks, and NaN values. */
class ChunkedRunsSpec extends AnyFunSuite with SparkTestBase {

  private def standard(df: org.apache.spark.sql.DataFrame, cond: org.apache.spark.sql.Column,
      minPoints: Long) =
    collectEvents(assembleEvents(withRunId(df, cond), "t", minPoints))

  private def chunked(df: org.apache.spark.sql.DataFrame, cond: org.apache.spark.sql.Column,
      minPoints: Long, chunk: String) =
    collectEvents(ChunkedRuns.assembleEventsChunked(df, cond, "t", minPoints, chunk))

  test("run spanning several chunks merges exactly") {
    // flagged days 2..10 with 3-day chunks → run crosses 3 boundaries
    val vals = (0 until 14).map(i => if (i >= 2 && i <= 10) 5.0 else 0.0)
    val df = dailySeries(vals)
    val cond = col("value") > 1.0
    assert(chunked(df, cond, 1, "3D") == standard(df, cond, 1))
  }

  test("all-unflagged chunk breaks a run; empty chunk does not") {
    // flagged, then a full chunk of unflagged, then flagged again
    val a = dailySeries(Seq(5.0, 5.0, 5.0, 0.0, 0.0, 0.0, 5.0, 5.0, 5.0))
    val cond = col("value") > 1.0
    assert(chunked(a, cond, 1, "3D") == standard(a, cond, 1))
    // gap in TIME (missing rows) spanning whole chunks: days 0-2 and 9-11
    val b = seriesAt(
      (0 to 2).map(i => day(i) -> 5.0) ++ (9 to 11).map(i => day(i) -> 5.0), "s1")
    assert(chunked(b, cond, 1, "3D") == standard(b, cond, 1))
  }

  test("randomized equivalence across chunk sizes, series, NaN, minPoints") {
    (1L to 6L).foreach { seed =>
      val r = new scala.util.Random(seed)
      val df = (0 until 3).map { s =>
        seriesAt((0 until 60).flatMap { i =>
          if (r.nextInt(5) == 0) None // missing timestamp
          else Some(day(i) -> (r.nextInt(4) match {
            case 0 => Double.NaN
            case 1 => 9.0
            case _ => r.nextDouble()
          }))
        }, s"s$s")
      }.reduce(_ union _)
      val cond = col("value") > 1.0
      Seq("1D", "3D", "7D", "100D").foreach { chunk =>
        Seq(1L, 3L).foreach { mp =>
          assert(chunked(df, cond, mp, chunk) == standard(df, cond, mp),
            s"mismatch seed=$seed chunk=$chunk minPoints=$mp")
        }
      }
    }
  }
}
