package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.operators.RangeRank

/** The range-partitioned rank must be row-for-row identical to the
  * plain single-partition window on any TOTAL order — and its plan
  * must contain no single-partition stage. */
class RangeRankSpec extends AnyFunSuite with SparkTestBase {

  // adversarial frame: heavy value ties (the tiebreak column does the
  // total-ordering work), plus negative values and a non-round size
  private def frame(n: Int) = {
    import spark.implicits._
    (0 until n).map(i => (i.toLong, ((i * 31) % 7 - 3).toDouble)).toDF("k", "v")
  }

  private def forced[T](body: => T): T = {
    spark.conf.set(RangeRank.MinBytesKey, "0")
    try body finally spark.conf.unset(RangeRank.MinBytesKey)
  }

  test("global row number equals the plain window (asc, desc, ties)") {
    for (ord <- Seq(Seq(col("v"), col("k")), Seq(col("v").desc, col("k").desc))) {
      val df = frame(103)
      val plain = df.withColumn("rn",
        row_number().over(Window.orderBy(ord: _*)).cast("long"))
      val ranged = forced(RangeRank.withRowNumber(df, "rn", ord))
      assert(ranged.except(plain).isEmpty && plain.except(ranged).isEmpty)
    }
  }

  test("ntile equals the plain window for k not dividing n, k > n, k = 1") {
    val ord = Seq(col("v"), col("k"))
    for ((n, k) <- Seq((103, 10), (103, 5), (3, 10), (40, 1), (100, 100))) {
      val df = frame(n)
      val plain = df.withColumn("t",
        ntile(k).over(Window.orderBy(ord: _*)).cast("long"))
      val ranged = forced(RangeRank.withNtile(df, "t", k, ord))
      assert(ranged.except(plain).isEmpty && plain.except(ranged).isEmpty,
        s"ntile($k) over $n rows diverged")
    }
  }

  test("gate: small frames take the plain window path (no extra jobs)") {
    // default threshold: a 100-row local frame is far under 32 MB, so
    // the result must come back WITHOUT the barrier's eager jobs —
    // observable as plan equality with the plain window
    val df = frame(100)
    val gated = RangeRank.withRowNumber(df, "rn", Seq(col("v"), col("k")))
    assert(gated.queryExecution.executedPlan.toString.contains("SinglePartition"))
  }

  test("forced range path plan has no SinglePartition stage") {
    val df = frame(500)
    val ranged = forced(RangeRank.withRowNumber(df, "rn", Seq(col("v"), col("k"))))
    val plan = ranged.queryExecution.executedPlan.toString
    assert(!plan.contains("SinglePartition"), plan.take(2000))
  }

  test("empty partitions (numParts > n) and empty input are handled") {
    // shuffle.partitions = 4 in tests; 2 rows leave 2+ empty ranges
    val tiny = frame(2)
    val ord = Seq(col("v"), col("k"))
    val plain = tiny.withColumn("rn",
      row_number().over(Window.orderBy(ord: _*)).cast("long"))
    val ranged = forced(RangeRank.withRowNumber(tiny, "rn", ord))
    assert(ranged.except(plain).isEmpty && plain.except(ranged).isEmpty)
    assert(forced(RangeRank.withRowNumber(frame(0), "rn", ord)).count() == 0L)
  }

  test("range path stays correct under materialize persist mode (pin is truncating)") {
    // ADVICE r13 medium: under persist mode the pin must still
    // truncate lineage so offsets and rows describe one id assignment
    spark.conf.set(Materialize.ModeKey, "persist")
    try {
      val df = frame(103)
      val ord = Seq(col("v"), col("k"))
      val plain = df.withColumn("rn",
        row_number().over(Window.orderBy(ord: _*)).cast("long"))
      val ranged = forced(RangeRank.withRowNumber(df, "rn", ord))
      assert(ranged.except(plain).isEmpty && plain.except(ranged).isEmpty)
    } finally spark.conf.unset(Materialize.ModeKey)
  }

  test("w5/gn1/rfm1 stay hash-identical on the forced range path") {
    val dir = "/root/testdata/sf0.001"
    if (new java.io.File(s"$dir/orders.parquet").exists()) {
      for (key <- Seq("w5_spend_deciles", "gn1_gini_spend", "rfm1_rfm_segments",
          "qb1_quantile_bins")) {
        val q = SparkEntry.queries(key)
        val plain = q(spark, dir)
        val ranged = forced { q(spark, dir).collect().toSeq }
        assert(plain.collect().toSeq.sortBy(_.toString) ==
          ranged.sortBy(_.toString), s"$key diverged on the range path")
      }
    }
  }
}
