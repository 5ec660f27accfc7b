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
}
