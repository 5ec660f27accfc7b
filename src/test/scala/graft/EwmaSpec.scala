package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Ewma

/** Ewma vs hand-computed pandas `ewm(alpha=0.5, ignore_na=False)`
  * goldens on [1, 2, NaN, 4] — both adjust modes, NaN aging, leading
  * NaN behavior. */
class EwmaSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def got(values: Seq[Double], adjust: Boolean): Seq[Option[Double]] =
    Ewma.ewmaMean(dailySeries(values), alpha = 0.5, adjust = adjust)
      .orderBy("ts")
      .select("ewma").as[Option[Double]].collect().toSeq

  test("adjust=True matches pandas: weighted sums with per-row aging") {
    val e = got(Seq(1.0, 2.0, Double.NaN, 4.0), adjust = true)
    val expected = Seq(1.0, 5.0 / 3.0, 5.0 / 3.0, 4.625 / 1.375)
    e.zip(expected).foreach { case (g, x) =>
      assert(g.exists(v => math.abs(v - x) < 1e-12), s"$g != $x")
    }
  }

  test("adjust=False matches pandas recurrence incl. NaN aging") {
    val e = got(Seq(1.0, 2.0, Double.NaN, 4.0), adjust = false)
    val expected = Seq(1.0, 1.5, 1.5, 2.375 / 0.75)
    e.zip(expected).foreach { case (g, x) =>
      assert(g.exists(v => math.abs(v - x) < 1e-12), s"$g != $x")
    }
  }

  test("leading NaNs emit null until the first observation") {
    val e = got(Seq(Double.NaN, Double.NaN, 3.0, 5.0), adjust = true)
    assert(e(0).isEmpty && e(1).isEmpty)
    assert(e(2).contains(3.0))
    // t3: num = 0.5*3 + 5 = 6.5, den = 0.5 + 1 = 1.5
    assert(e(3).exists(v => math.abs(v - 6.5 / 1.5) < 1e-12))
  }

  test("constant series is a fixpoint in both modes") {
    Seq(true, false).foreach { adj =>
      val e = got(Seq(7.0, 7.0, 7.0, 7.0), adjust = adj)
      assert(e.forall(_.exists(v => math.abs(v - 7.0) < 1e-12)))
    }
  }

  test("cp1 CUSUM: reflection identity == the sequential max(0, s+y) recursion, every row") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // the operator's two-window form vs a driver-side literal replay
    // of Page's recursion over the SAME ordered points — must agree
    // to the rounded digit on every row of the real fixture
    val dir = "/root/testdata/sf0.001"
    val got = graft.queries.TimeSeriesQueries.cp1Cusum(spark, dir)
      .select("series_id", "ts", "cusum6")
      .as[(String, java.sql.Timestamp, Double)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2.getTime).map(_._3).toSeq).toMap
    val pts = graft.sources.Tables.read(spark, dir, "events")
      .select(col("user_id").cast("string").as("s"), col("ts"), col("event_id"),
        graft.operators.Kernels.nanToNull(col("value")).as("v"))
      .where(col("v").isNotNull)
      .as[(String, java.sql.Timestamp, Long, Double)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(x => (x._2.getTime, x._3)).map(_._4).toSeq).toMap
    assert(got.keySet == pts.keySet && got.nonEmpty)
    pts.foreach { case (sid, vs) =>
      var s = 0.0
      val expect = vs.map { v =>
        s = math.max(0.0, s + (v - 150.0 - 10.0))
        BigDecimal(s).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      }
      // identity is algebraically exact; float path differs (running
      // min + subtract vs iterated max), so compare at 1e-6 scale
      got(sid).zip(expect).zipWithIndex.foreach { case ((a, b), i) =>
        assert(math.abs(a - b) < 1e-6, s"series $sid row $i: $a vs $b")
      }
    }
  }
}
