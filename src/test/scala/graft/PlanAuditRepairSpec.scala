package graft

import org.scalatest.funsuite.AnyFunSuite

/** The opt-in duplicate-aggregate repair
  * ([[graft.plans.PlanAuditRepair]], VERDICT r15 item 3): a user query
  * whose consumers prune a shared aggregate differently must, with
  * `spark.graft.planaudit.repair=true`, execute the shared scan +
  * partial aggregate ONCE (exchange reuse asserted), with values
  * identical to the unrepaired plan, and the PlanAudit detector must
  * go quiet on the repaired plan. */
class PlanAuditRepairSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  graft.functions.GraftFunctions.register(spark)

  private val FlagKey = graft.plans.PlanAuditRepair.FlagKey

  private def withRepair[A](f: => A): A = {
    spark.conf.set(FlagKey, "true")
    try f finally spark.conf.unset(FlagKey)
  }

  private lazy val dir: String = {
    val d = java.nio.file.Files.createTempDirectory("graft_repair").toString
    (1 to 5000).map(i => (i % 50L, i.toLong, (i % 7).toLong))
      .toDF("g", "x", "y").write.mode("overwrite").parquet(d)
    d
  }

  // the defect shape: same view, same grouping, DIVERGENT pruning —
  // consumer a needs (g, x), consumer b needs (g, x, y), so the two
  // aggregate subtrees canonicalize differently and ReuseExchange
  // cannot collapse them
  private val sql =
    """SELECT a.g, a.s, b.m, b.s2 FROM
      |  (SELECT g, sum(x) AS s FROM repair_t GROUP BY g) a
      |  JOIN (SELECT g, max(y) AS m, sum(x) AS s2 FROM repair_t GROUP BY g) b
      |  ON a.g = b.g""".stripMargin

  // AQE plan strings append an "== Initial Plan ==" section after the
  // final plan — count scans in the FINAL section only
  private def scans(p: String): Int =
    "FileScan parquet".r.findAllIn(p.split("== Initial Plan ==")(0)).size

  test("flag off: detector warns, both aggregate variants scan the source") {
    spark.read.parquet(dir).createOrReplaceTempView("repair_t")
    val off = spark.sql(sql)
    val findings = graft.tools.PlanAudit.audit(off.queryExecution.optimizedPlan)
    assert(findings.exists(_.severity == "warn"), findings.toString)
    off.collect()
    val p = off.queryExecution.executedPlan.toString
    assert(scans(p) == 2, p)
  }

  test("flag on: union aggregate, one scan, exchange reused, values unchanged, detector quiet") {
    spark.read.parquet(dir).createOrReplaceTempView("repair_t")
    val offRows = spark.sql(sql).collect().map(_.toSeq).toSet
    val before = graft.plans.PlanAuditRepair.repairCount.get()
    val (rows, plan, findings) = withRepair {
      val on = spark.sql(sql)
      val f = graft.tools.PlanAudit.audit(on.queryExecution.optimizedPlan)
      val r = on.collect().map(_.toSeq).toSet
      (r, on.queryExecution.executedPlan.toString, f)
    }
    assert(graft.plans.PlanAuditRepair.repairCount.get() > before,
      "repair did not fire")
    assert(findings.forall(_.severity != "warn"),
      s"repaired plan still warns: $findings")
    assert(rows == offRows, "repair changed query results")
    assert(scans(plan) == 1, plan)
    assert(plan.contains("ReusedExchange") || plan.contains("reuses"), plan)
  }

  test("idempotent and conservative: already-equal duplicates and lone aggregates untouched") {
    spark.read.parquet(dir).createOrReplaceTempView("repair_t")
    withRepair {
      // reuse-ELIGIBLE duplicates (identical pruning on both sides):
      // not a divergent group — left alone, and ReuseExchange already
      // handles them
      val same = spark.sql(
        """SELECT a.g FROM
          |  (SELECT g, sum(x) AS s FROM repair_t GROUP BY g) a
          |  JOIN (SELECT g, sum(x) AS s FROM repair_t GROUP BY g) b
          |  ON a.g = b.g""".stripMargin)
      assert(!same.queryExecution.optimizedPlan.toString.contains("RepairProject"),
        same.queryExecution.optimizedPlan.toString)
      // single aggregate: no group at all
      val lone = spark.sql("SELECT g, sum(x) AS s FROM repair_t GROUP BY g")
      assert(!lone.queryExecution.optimizedPlan.toString.contains("RepairProject"))
      assert(lone.collect().length == 50)
    }
  }

  test("extensions-config path: repair survives the late ColumnPruning/CollapseProject batch") {
    // the cluster deployment installs rules via spark.sql.extensions;
    // the preCBO slot runs BEFORE the RewriteSubquery batch whose
    // ColumnPruning/CollapseProject would narrow a plain Project —
    // RepairProject must come out the other side intact
    val prevActive = org.apache.spark.sql.SparkSession.getActiveSession
    val prevDefault = org.apache.spark.sql.SparkSession.getDefaultSession
    org.apache.spark.sql.SparkSession.clearActiveSession()
    org.apache.spark.sql.SparkSession.clearDefaultSession()
    try {
      val s2 = org.apache.spark.sql.SparkSession.builder()
        .master("local[4]")
        .withExtensions(new graft.functions.GraftExtensions().apply(_))
        .getOrCreate()
      s2.conf.set(FlagKey, "true")
      s2.read.parquet(dir).createOrReplaceTempView("repair_t")
      val df = s2.sql(sql)
      val opt = df.queryExecution.optimizedPlan.toString
      assert(opt.contains("RepairProject"), opt)
      df.collect()
      val p = df.queryExecution.executedPlan.toString
      assert(scans(p) == 1, p)
    } finally {
      prevDefault.foreach(org.apache.spark.sql.SparkSession.setDefaultSession)
      prevActive.foreach(org.apache.spark.sql.SparkSession.setActiveSession)
    }
  }
}
