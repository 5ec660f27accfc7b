package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame

/** The automatic distributed-ranking promotion
  * ([[graft.plans.RangeRankRewrite]] + [[graft.plans.GlobalRankExec]]):
  * user SQL `rank-family OVER (ORDER BY ...)` with no partition key
  * must plan WITHOUT a single-partition window once the frame is above
  * the gate, and the values must be EXACTLY the plain window's. */
class RangeRankRuleSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  graft.functions.GraftFunctions.register(spark)

  private val GateKey = graft.operators.RangeRank.MinBytesKey

  private def withOpenGate[A](f: => A): A = {
    spark.conf.set(GateKey, "0")
    try f finally spark.conf.unset(GateKey)
  }

  private def frame: DataFrame = {
    // duplicate keys on purpose: rank/dense_rank/percent_rank tie
    // semantics must hold across range-partition boundaries
    val rows = (1 to 4000).map(i => (i.toLong, (i % 97).toLong, s"u${i % 7}"))
    rows.toDF("id", "score", "tag")
  }

  private def plan(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("below the gate the plain window plan is untouched") {
    frame.createOrReplaceTempView("rr_rule_t")
    val df = spark.sql(
      "SELECT id, ntile(10) OVER (ORDER BY score, id) AS t FROM rr_rule_t")
    val p = plan(df)
    assert(p.contains("Window"), p)
    assert(!p.contains("GlobalRank"), p)
  }

  test("above the gate: rank family rewrites to GlobalRankExec, no single-partition window") {
    frame.createOrReplaceTempView("rr_rule_t")
    val sql =
      """SELECT id, score,
        |  row_number()   OVER (ORDER BY score, id) AS rn,
        |  rank()         OVER (ORDER BY score, id) AS rk,
        |  dense_rank()   OVER (ORDER BY score, id) AS dr,
        |  percent_rank() OVER (ORDER BY score, id) AS pr,
        |  ntile(7)       OVER (ORDER BY score, id) AS nt
        |FROM rr_rule_t""".stripMargin
    val baseline = spark.sql(sql).collect().map(_.toSeq).toSet
    val (rewrittenPlan, rewritten) = withOpenGate {
      val df = spark.sql(sql)
      (plan(df), df.collect().map(_.toSeq).toSet)
    }
    assert(rewrittenPlan.contains("GlobalRank"), rewrittenPlan)
    assert(!rewrittenPlan.contains("Window"), rewrittenPlan)
    assert(rewrittenPlan.toLowerCase.contains("rangepartitioning"), rewrittenPlan)
    assert(!rewrittenPlan.contains("SinglePartition"), rewrittenPlan)
    // (score, id) is a TOTAL order -> every function is exact, so the
    // full row set matches the single-partition window bit for bit
    assert(rewritten == baseline)
  }

  test("tie semantics: rank/dense_rank/percent_rank exact under duplicate keys") {
    frame.createOrReplaceTempView("rr_rule_t")
    // order by score ONLY: 97 tie-runs of ~41 rows each, straddling
    // any 4-partition range split if ties were mishandled
    val sql =
      """SELECT score,
        |  rank()         OVER (ORDER BY score) AS rk,
        |  dense_rank()   OVER (ORDER BY score) AS dr,
        |  percent_rank() OVER (ORDER BY score) AS pr
        |FROM rr_rule_t""".stripMargin
    val baseline = spark.sql(sql).collect().map(_.toSeq)
      .sortBy(_.toString).toSeq
    val rewritten = withOpenGate {
      val df = spark.sql(sql)
      assert(plan(df).contains("GlobalRank"))
      df.collect().map(_.toSeq).sortBy(_.toString).toSeq
    }
    assert(rewritten == baseline)
  }

  test("row_number/ntile under ties: a valid assignment (set of values per tie-run)") {
    frame.createOrReplaceTempView("rr_rule_t")
    val sql =
      "SELECT score, row_number() OVER (ORDER BY score) AS rn FROM rr_rule_t"
    val rewritten = withOpenGate(spark.sql(sql).collect().map(r =>
      (r.getLong(0), r.getInt(1))))
    // global: rn is a permutation of 1..n
    assert(rewritten.map(_._2).sorted.toSeq == (1 to 4000).toSeq)
    // per tie-run: the assigned numbers are exactly the run's rank range
    val counts = rewritten.groupBy(_._1).view.mapValues(_.length).toMap
    val keys = counts.keys.toSeq.sorted
    val startByKey = keys.zip(
      keys.scanLeft(1)((acc, k) => acc + counts(k)).dropRight(1)).toMap
    rewritten.groupBy(_._1).foreach { case (k, rows) =>
      val rns = rows.map(_._2).sorted.toSeq
      val s = startByKey(k)
      assert(rns == (s until s + rns.length).toSeq,
        s"tie-run $k got ${rns.take(5)}..., expected contiguous from $s")
    }
  }

  test("partitioned, unsupported-function, and mixed windows are untouched") {
    frame.createOrReplaceTempView("rr_rule_t")
    withOpenGate {
      val p1 = plan(spark.sql(
        "SELECT row_number() OVER (PARTITION BY tag ORDER BY id) AS rn FROM rr_rule_t"))
      assert(p1.contains("Window") && !p1.contains("GlobalRank"), p1)
      val p2 = plan(spark.sql(
        "SELECT sum(score) OVER (ORDER BY id) AS s FROM rr_rule_t"))
      assert(p2.contains("Window") && !p2.contains("GlobalRank"), p2)
      // one supported + one unsupported in the SAME over clause set:
      // conservative skip (the single-partition sum would be needed anyway)
      val p3 = plan(spark.sql(
        """SELECT row_number() OVER (ORDER BY id) AS rn,
          |       sum(score)   OVER (ORDER BY id) AS s FROM rr_rule_t""".stripMargin))
      assert(p3.contains("Window"), p3)
    }
  }

  test("extensions-config path (injectPreCBORule + injectPlannerStrategy) rewrites too") {
    // the cluster deployment installs the rule via
    // spark.sql.extensions=graft.functions.GraftExtensions, not
    // register(); prove that placement fires on a fresh session
    val prevActive = org.apache.spark.sql.SparkSession.getActiveSession
    val prevDefault = org.apache.spark.sql.SparkSession.getDefaultSession
    org.apache.spark.sql.SparkSession.clearActiveSession()
    org.apache.spark.sql.SparkSession.clearDefaultSession()
    try {
      val s2 = org.apache.spark.sql.SparkSession.builder()
        .master("local[4]")
        .withExtensions(new graft.functions.GraftExtensions().apply(_))
        .getOrCreate()
      s2.conf.set(GateKey, "0")
      frame.createOrReplaceTempView("rr_rule_t") // registered on SharedSpark
      import s2.implicits._
      (1 to 100).map(i => (i, i % 5)).toDF("id", "v")
        .createOrReplaceTempView("rr_ext_t")
      val df = s2.sql(
        "SELECT id, ntile(3) OVER (ORDER BY v, id) AS t FROM rr_ext_t")
      val p = df.queryExecution.executedPlan.toString
      assert(p.contains("GlobalRank") && !p.contains("Window"), p)
      assert(df.collect().map(_.getInt(1)).sorted.toSeq ==
        (Seq.fill(34)(1) ++ Seq.fill(33)(2) ++ Seq.fill(33)(3)))
    } finally {
      prevDefault.foreach(org.apache.spark.sql.SparkSession.setDefaultSession)
      prevActive.foreach(org.apache.spark.sql.SparkSession.setActiveSession)
    }
  }

  test("downstream operators resolve over the rewritten node (filter + agg above)") {
    frame.createOrReplaceTempView("rr_rule_t")
    val sql =
      """SELECT tag, count(*) AS n FROM (
        |  SELECT tag, ntile(4) OVER (ORDER BY score, id) AS q FROM rr_rule_t
        |) WHERE q = 1 GROUP BY tag""".stripMargin
    val baseline = spark.sql(sql).collect().map(_.toSeq).toSet
    val rewritten = withOpenGate {
      val df = spark.sql(sql)
      assert(plan(df).contains("GlobalRank"))
      df.collect().map(_.toSeq).toSet
    }
    assert(rewritten == baseline)
  }
}
