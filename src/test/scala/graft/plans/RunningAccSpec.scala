package graft.plans

import org.scalatest.funsuite.AnyFunSuite

/** The 128-bit running long sum (review r16 finding): a per-PARTITION
  * subtotal may overflow 64 bits while the true running prefix never
  * does — overflow must be decided only at `value()`, where the plain
  * window decides it. */
class RunningAccSpec extends AnyFunSuite {

  test("job-1 subtotal overflow cancels through the prefix merge") {
    // partition A: [-100]; partition B: [MaxValue-50, 60] — B's local
    // subtotal exceeds 2^63-1, but the true totals never do
    val a = new SumLongAcc(exact = true); a.add(-100L)
    val b = new SumLongAcc(exact = true)
    b.add(java.lang.Long.valueOf(Long.MaxValue - 50L)); b.add(java.lang.Long.valueOf(60L))
    val combined = new SumLongAcc(exact = true)
    combined.merge(a); combined.merge(b)
    assert(combined.value == Long.MaxValue - 90L)
  }

  test("job-2 running values stay exact through an overflowing prefix") {
    val prefix = new SumLongAcc(exact = true); prefix.add(-100L)
    val run = new SumLongAcc(exact = true); run.merge(prefix)
    run.add(java.lang.Long.valueOf(Long.MaxValue - 50L))
    assert(run.value == Long.MaxValue - 150L)
    run.add(java.lang.Long.valueOf(60L))
    assert(run.value == Long.MaxValue - 90L)
  }

  test("a TRUE running overflow throws in ANSI mode and wraps in legacy") {
    val e = new SumLongAcc(exact = true)
    e.add(java.lang.Long.valueOf(Long.MaxValue)); e.add(java.lang.Long.valueOf(1L))
    intercept[ArithmeticException](e.value)
    val w = new SumLongAcc(exact = false)
    w.add(java.lang.Long.valueOf(Long.MaxValue)); w.add(java.lang.Long.valueOf(1L))
    assert(w.value == Long.MinValue)
  }

  test("decimal running sum: exact in unbounded space; overflow at value() — ANSI throws, legacy nulls (r17)") {
    import org.apache.spark.sql.types.{Decimal, DecimalType}
    val res = DecimalType(38, 0)
    val big = Decimal(new java.math.BigDecimal("9" * 38))
    val ansi = new SumDecimalAcc(res, exact = true)
    ansi.add(big)
    assert(ansi.value == big)
    ansi.add(Decimal(1L))                     // true prefix now exceeds 38 digits
    intercept[ArithmeticException](ansi.value)
    ansi.add(Decimal(-1L))                    // ...and cancels back: value decidable again
    assert(ansi.value == big)
    val legacy = new SumDecimalAcc(res, exact = false)
    legacy.add(big); legacy.add(Decimal(1L))
    assert(legacy.value == null)              // Spark's nullOnOverflow, decimals never wrap
  }

  test("Welford moments: Chan merge equals the sequential fold; n==1 semantics by flag (r17)") {
    // ill-conditioned data on purpose: mean 1e6, spread ~1 — a naive
    // (Σ, Σx²) state loses ~12 digits here
    val xs = (1 to 1000).map(i => 1.0e6 + (i % 37) * 0.25)
    val seq = new MomentsAcc(samp = true, sqrtOut = false, nullOnDiv = true)
    xs.foreach(x => seq.add(java.lang.Double.valueOf(x)))
    val (a, b) = (new MomentsAcc(true, false, true), new MomentsAcc(true, false, true))
    xs.take(400).foreach(x => a.add(java.lang.Double.valueOf(x)))
    xs.drop(400).foreach(x => b.add(java.lang.Double.valueOf(x)))
    val merged = new MomentsAcc(samp = true, sqrtOut = false, nullOnDiv = true)
    merged.merge(a); merged.merge(b)
    val (vs, vm) = (seq.value.asInstanceOf[Double], merged.value.asInstanceOf[Double])
    assert(math.abs(vs - vm) <= 1e-9 * math.max(vs, vm), s"$vs vs $vm")
    // n==1: sample variance is null under the modern flag, NaN legacy,
    // population variance 0
    val one = new MomentsAcc(samp = true, sqrtOut = false, nullOnDiv = true)
    one.add(java.lang.Double.valueOf(5.0))
    assert(one.value == null)
    val oneLegacy = new MomentsAcc(samp = true, sqrtOut = false, nullOnDiv = false)
    oneLegacy.add(java.lang.Double.valueOf(5.0))
    assert(oneLegacy.value.asInstanceOf[Double].isNaN)
    val onePop = new MomentsAcc(samp = false, sqrtOut = false, nullOnDiv = true)
    onePop.add(java.lang.Double.valueOf(5.0))
    assert(onePop.value == 0.0d)
  }

  test("reset() returns every accumulator to its empty state (r17)") {
    import org.apache.spark.sql.types.{Decimal, DecimalType, LongType}
    val accs: Seq[RunningAcc] = Seq(
      new SumLongAcc(exact = false), new SumDoubleAcc, new CountAcc, new AvgAcc,
      new MinMaxAcc(LongType, isMin = true),
      new FirstLastAcc(isFirst = true, ignoreNulls = false),
      new MomentsAcc(samp = false, sqrtOut = false, nullOnDiv = true),
      new SumDecimalAcc(DecimalType(38, 0), exact = false))
    accs.foreach { acc =>
      val feed: Any = acc match {
        case _: SumDecimalAcc => Decimal(7L)
        case _: SumDoubleAcc | _: AvgAcc | _: MomentsAcc => java.lang.Double.valueOf(7.0)
        case _ => java.lang.Long.valueOf(7L)
      }
      acc.add(feed)
      val afterOne = acc.value
      acc.reset()
      val empty = acc.value
      acc.add(feed)
      assert(acc.value == afterOne, s"${acc.getClass.getSimpleName}: reset+add != fresh add")
      acc.reset()
      assert(acc.value == empty || (acc.isInstanceOf[CountAcc] && acc.value == 0L))
    }
  }
}
