package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** [[graft.sources.IO.writeBucketed]] must buy the exchange-free
  * co-located join: two tables bucketed on the join key into the same
  * bucket count sort-merge-join with ZERO shuffle exchanges, and the
  * values equal the ordinary shuffled join's. */
class BucketedJoinSpec extends AnyFunSuite with SparkTestBase {

  private val dir = "/root/testdata/sf0.001"
  private def haveData = new java.io.File(s"$dir/orders.parquet").exists()

  private def withConf[T](k: String, v: String)(body: => T): T = {
    val prev = spark.conf.getOption(k)
    spark.conf.set(k, v)
    try body finally prev.fold(spark.conf.unset(k))(spark.conf.set(k, _))
  }

  test("same-bucketing join plans with no shuffle exchange, values identical") {
    assume(haveData)
    val orders = graft.sources.Tables.read(spark, dir, "orders")
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
    val customer = graft.sources.Tables.read(spark, dir, "customer")
      .select(col("c_custkey"), col("c_acctbal"))
    try {
      graft.sources.IO.writeBucketed(orders, "bj_orders", 8, Seq("o_custkey"))
      graft.sources.IO.writeBucketed(customer, "bj_customer", 8, Seq("c_custkey"))
      // force the sort-merge path: a broadcast join would trivially
      // have no shuffle and prove nothing about co-location
      withConf("spark.sql.autoBroadcastJoinThreshold", "-1") {
        val joined = spark.table("bj_orders")
          .join(spark.table("bj_customer"),
            col("o_custkey") === col("c_custkey"))
          .groupBy(col("o_custkey"))
          .agg(count(lit(1)).as("n"),
            round(sum(col("o_totalprice") * col("c_acctbal")), 2).as("v"))
        val plan = joined.queryExecution.executedPlan.toString
        assert(plan.contains("SortMergeJoin"), plan)
        // the join itself must be exchange-free; the groupBy above it
        // is ALSO exchange-free (already hash-distributed on the key)
        assert(!plan.contains("Exchange"),
          "bucketed co-located join still shuffles:\n" + plan)
        // value-equality with the ordinary shuffled join
        val shuffled = orders.join(customer,
            col("o_custkey") === col("c_custkey"))
          .groupBy(col("o_custkey"))
          .agg(count(lit(1)).as("n"),
            round(sum(col("o_totalprice") * col("c_acctbal")), 2).as("v"))
        assert(joined.collect().map(_.toSeq).toSet ==
          shuffled.collect().map(_.toSeq).toSet)
        assert(joined.count() > 0)
      }
      // mismatched bucket counts must NOT silently co-locate: Spark
      // re-shuffles one side (correct, just not free) — assert the
      // plan is still correct-by-exchange rather than wrong
      graft.sources.IO.writeBucketed(customer, "bj_customer4", 4, Seq("c_custkey"))
      withConf("spark.sql.autoBroadcastJoinThreshold", "-1") {
        val mixed = spark.table("bj_orders")
          .join(spark.table("bj_customer4"),
            col("o_custkey") === col("c_custkey"))
        assert(mixed.queryExecution.executedPlan.toString.contains("Exchange"))
        assert(mixed.count() > 0)
      }
    } finally {
      Seq("bj_orders", "bj_customer", "bj_customer4")
        .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    }
  }
}
