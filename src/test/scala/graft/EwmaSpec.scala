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
}
