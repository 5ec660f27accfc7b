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

  private def scans(df: org.apache.spark.sql.DataFrame): Int =
    graft.tools.PlanAudit.fileScanCount(df)

  test("flag off: detector warns, both aggregate variants scan the source") {
    spark.read.parquet(dir).createOrReplaceTempView("repair_t")
    val off = spark.sql(sql)
    val findings = graft.tools.PlanAudit.audit(off.queryExecution.optimizedPlan)
    assert(findings.exists(_.severity == "warn"), findings.toString)
    off.collect()
    assert(scans(off) == 2, off.queryExecution.executedPlan.toString)
  }

  test("flag on: union aggregate, one scan, exchange reused, values unchanged, detector quiet") {
    spark.read.parquet(dir).createOrReplaceTempView("repair_t")
    val offRows = spark.sql(sql).collect().map(_.toSeq).toSet
    val before = graft.plans.PlanAuditRepair.repairCount.get()
    val (rows, nScans, plan, findings) = withRepair {
      val on = spark.sql(sql)
      val f = graft.tools.PlanAudit.audit(on.queryExecution.optimizedPlan)
      val r = on.collect().map(_.toSeq).toSet
      (r, scans(on), on.queryExecution.executedPlan.toString, f)
    }
    assert(graft.plans.PlanAuditRepair.repairCount.get() > before,
      "repair did not fire")
    assert(findings.forall(_.severity != "warn"),
      s"repaired plan still warns: $findings")
    assert(rows == offRows, "repair changed query results")
    assert(nScans == 1, plan)
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

  test("nested groups: inner unifies through divergent null guards; one scan total") {
    // the realistic nested shape: the optimizer infers isnotnull(g%10)
    // on SOME consumers only (the au1 asymmetry), so the four inner
    // aggregates differ by guards AND output lists. The repair keeps
    // the COMMON guard below the wide aggregate (pushdown preserved)
    // and lifts each member's residual guard above its RepairProject.
    // The OUTER pair stays unrepaired by design: its members' chains
    // now contain RepairProjects with divergent restore lists —
    // unifying those would mean fusing whole chains, and the residual
    // duplicate is post-shuffle compute over already-aggregated rows
    // (PlanAudit's documented accepted class).
    spark.read.parquet(dir).createOrReplaceTempView("repair_t")
    val nested =
      """WITH j1 AS (
        |  SELECT a.g, a.s, b.m FROM
        |    (SELECT g, sum(x) AS s FROM repair_t GROUP BY g) a
        |    JOIN (SELECT g, max(y) AS m, sum(x) AS s2 FROM repair_t GROUP BY g) b
        |    USING (g))
        |SELECT x1.h, x1.t, x2.u FROM
        |  (SELECT g % 10 AS h, sum(s) AS t FROM j1 GROUP BY g % 10) x1
        |  JOIN (SELECT g % 10 AS h, max(m) AS u, sum(s) AS t2 FROM j1 GROUP BY g % 10) x2
        |  USING (h)""".stripMargin
    val offRows = spark.sql(nested).collect().map(_.toSeq).toSet
    withRepair {
      val on = spark.sql(nested)
      val opt = on.queryExecution.optimizedPlan.toString
      // all FOUR inner members unified; common isnotnull(g) kept below
      // the wide aggregate, residual isnotnull(g%10) lifted above
      assert("RepairProject".r.findAllIn(opt).size == 4, opt)
      assert(opt.contains("Filter isnotnull") , opt)
      assert(graft.tools.PlanAudit.audit(on.queryExecution.optimizedPlan)
        .forall(_.severity != "warn"), opt)
      assert(on.collect().map(_.toSeq).toSet == offRows,
        "nested repair changed query results")
      assert(scans(on) == 1, on.queryExecution.executedPlan.toString)
    }
  }

  // ---- Window/Join extension (VERDICT r16 item 4) -------------------

  private val windowSql =
    """WITH w AS (SELECT g, x, y,
      |             sum(x) OVER (PARTITION BY g ORDER BY x) AS cs,
      |             avg(y) OVER (PARTITION BY g ORDER BY x) AS ay
      |           FROM repair_t)
      |SELECT a.g, a.tot, b.m FROM
      |  (SELECT g, sum(cs) AS tot FROM w GROUP BY g) a
      |  JOIN (SELECT g, max(ay + y) AS m FROM w GROUP BY g) b ON a.g = b.g
      |""".stripMargin

  test("window repair: equalized children, one scan, exchange reused, values unchanged") {
    spark.read.parquet(dir).createOrReplaceTempView("repair_t")
    val off = spark.sql(windowSql)
    assert(graft.tools.PlanAudit.audit(off.queryExecution.optimizedPlan)
      .exists(f => f.kind == "window" && f.severity == "warn"))
    val offRows = off.collect().map(_.toSeq).toSet
    assert(scans(off) == 2, off.queryExecution.executedPlan.toString)
    withRepair {
      val on = spark.sql(windowSql)
      val opt = on.queryExecution.optimizedPlan.toString
      assert(opt.contains("RepairProject"), opt)
      val findings = graft.tools.PlanAudit.audit(on.queryExecution.optimizedPlan)
      assert(findings.forall(_.severity != "warn"), s"repaired plan still warns: $findings")
      assert(on.collect().map(_.toSeq).toSet == offRows, "window repair changed results")
      assert(scans(on) == 1, on.queryExecution.executedPlan.toString)
      val plan = on.queryExecution.executedPlan.toString
      assert(plan.contains("ReusedExchange") || plan.contains("reuses"), plan)
    }
  }

  private lazy val dirU: String = {
    val d = java.nio.file.Files.createTempDirectory("graft_repair_u").toString
    (1 to 1000).map(i => (i % 50L, i * 3L)).toDF("g", "z")
      .write.mode("overwrite").parquet(d)
    d
  }

  private val joinSql =
    """WITH j AS (SELECT t.g AS g, t.x AS x, t.y AS y, u.z AS z
      |           FROM repair_t t JOIN repair_u u ON t.g = u.g)
      |SELECT a.g, a.sx, b.mz FROM
      |  (SELECT g, sum(x) AS sx FROM j GROUP BY g) a
      |  JOIN (SELECT g, max(z + y) AS mz FROM j GROUP BY g) b ON a.g = b.g
      |""".stripMargin

  test("join repair: both sides equalized, two scans total, exchanges reused, values unchanged") {
    spark.read.parquet(dir).createOrReplaceTempView("repair_t")
    spark.read.parquet(dirU).createOrReplaceTempView("repair_u")
    // force SMJ so both sides carry shuffle exchanges (the broadcast
    // variant reuses only the BroadcastExchange; the streamed-side
    // scan has no exchange boundary to share)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val off = spark.sql(joinSql)
      assert(graft.tools.PlanAudit.audit(off.queryExecution.optimizedPlan)
        .exists(f => f.kind == "join" && f.severity == "warn"))
      val offRows = off.collect().map(_.toSeq).toSet
      assert(scans(off) == 4, off.queryExecution.executedPlan.toString)
      withRepair {
        val on = spark.sql(joinSql)
        val opt = on.queryExecution.optimizedPlan.toString
        assert(opt.contains("RepairProject"), opt)
        val findings = graft.tools.PlanAudit.audit(on.queryExecution.optimizedPlan)
        assert(findings.forall(_.severity != "warn"), s"repaired plan still warns: $findings")
        assert(on.collect().map(_.toSeq).toSet == offRows, "join repair changed results")
        assert(scans(on) == 2, on.queryExecution.executedPlan.toString)
        val plan = on.queryExecution.executedPlan.toString
        assert(plan.contains("ReusedExchange") || plan.contains("reuses"), plan)
      }
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("semi-join repair: divergent left pruning equalized, one scan per table") {
    spark.read.parquet(dir).createOrReplaceTempView("repair_t")
    spark.read.parquet(dirU).createOrReplaceTempView("repair_u")
    val semiSql =
      """WITH j AS (SELECT g, x, y FROM repair_t t
        |           WHERE EXISTS (SELECT 1 FROM repair_u u WHERE u.g = t.g))
        |SELECT a.g, a.sx, b.my FROM
        |  (SELECT g, sum(x) AS sx FROM j GROUP BY g) a
        |  JOIN (SELECT g, max(y) AS my, sum(x) AS s2 FROM j GROUP BY g) b
        |  ON a.g = b.g""".stripMargin
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val offRows = spark.sql(semiSql).collect().map(_.toSeq).toSet
      withRepair {
        val on = spark.sql(semiSql)
        val opt = on.queryExecution.optimizedPlan.toString
        assert(opt.contains("RepairProject"), opt)
        assert(on.collect().map(_.toSeq).toSet == offRows,
          "semi-join repair changed results")
        assert(scans(on) == 2, on.queryExecution.executedPlan.toString)
      }
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("left-outer join repair: null-padding preserved, scans halved") {
    // the LeftOuter lift rules: left-side residuals commute, right-side
    // residuals would change which rows null-pad (unifyJoins refuses
    // them); this shape has common guards only, so the repair fires and
    // the null-padded rows must come out identical
    spark.read.parquet(dir).createOrReplaceTempView("repair_t")
    // a dim that only covers HALF the keys, so null-padding is real
    val dHalf = java.nio.file.Files.createTempDirectory("graft_repair_h").toString
    (1 to 500).map(i => (i % 25L, i * 3L)).toDF("g", "z")
      .write.mode("overwrite").parquet(dHalf)
    spark.read.parquet(dHalf).createOrReplaceTempView("repair_h")
    val loSql =
      """WITH j AS (SELECT t.g AS g, t.x AS x, t.y AS y, u.z AS z
        |           FROM repair_t t LEFT JOIN repair_h u ON t.g = u.g)
        |SELECT a.g, a.sx, b.mz FROM
        |  (SELECT g, sum(x) AS sx FROM j GROUP BY g) a
        |  JOIN (SELECT g, max(coalesce(z, -1) + y) AS mz FROM j GROUP BY g) b
        |  ON a.g = b.g""".stripMargin
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val offRows = spark.sql(loSql).collect().map(_.toSeq).toSet
      withRepair {
        val on = spark.sql(loSql)
        assert(on.queryExecution.optimizedPlan.toString.contains("RepairProject"),
          on.queryExecution.optimizedPlan.toString)
        assert(on.collect().map(_.toSeq).toSet == offRows,
          "left-outer repair changed results")
        assert(scans(on) == 2, on.queryExecution.executedPlan.toString)
      }
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("duplicates inside a scalar subquery are repaired too (r17)") {
    // the detector walks plan.subqueries, so the repairer must as
    // well — otherwise subquery-hosted duplicates warn forever with
    // the flag on (review r17 finding)
    spark.read.parquet(dir).createOrReplaceTempView("repair_t")
    val subSql =
      """SELECT g, x FROM repair_t WHERE x >= (
        |  SELECT CAST(a.s / 5000 + b.m AS BIGINT) FROM
        |    (SELECT sum(x) AS s FROM repair_t) a
        |    CROSS JOIN (SELECT max(y) AS m, sum(x) AS s2 FROM repair_t) b)""".stripMargin
    val offRows = spark.sql(subSql).collect().map(_.toSeq).toSet
    assert(offRows.nonEmpty)
    withRepair {
      val on = spark.sql(subSql)
      val subPlans = on.queryExecution.optimizedPlan.subqueriesAll
      assert(subPlans.exists(_.toString.contains("RepairProject")),
        on.queryExecution.optimizedPlan.toString)
      assert(on.collect().map(_.toSeq).toSet == offRows,
        "subquery repair changed results")
    }
  }

  test("window repair conservative: identically-pruned duplicates untouched") {
    spark.read.parquet(dir).createOrReplaceTempView("repair_t")
    withRepair {
      // both consumers keep (g, x, y): children already canonical-equal,
      // the exchange below is reuse-eligible as-is — repair must not fire
      val same = spark.sql(
        """WITH w AS (SELECT g, x, y,
          |             sum(x) OVER (PARTITION BY g ORDER BY x) AS cs,
          |             avg(y) OVER (PARTITION BY g ORDER BY x) AS ay
          |           FROM repair_t)
          |SELECT a.g, a.tot, b.m FROM
          |  (SELECT g, sum(cs + y) AS tot FROM w GROUP BY g) a
          |  JOIN (SELECT g, max(ay + y) AS m FROM w GROUP BY g) b ON a.g = b.g
          |""".stripMargin)
      assert(!same.queryExecution.optimizedPlan.toString.contains("RepairProject"),
        same.queryExecution.optimizedPlan.toString)
    }
  }

  test("generate repair: two-consumer shared explode, one scan, values unchanged (r18)") {
    val gdir = java.nio.file.Files.createTempDirectory("graft_repair_g").toString
    (1 to 4000).map(i => (i % 100L, s"tok${i % 17} tok${i % 23} tok${i % 31}"))
      .toDF("g", "txt").write.mode("overwrite").parquet(gdir)
    spark.read.parquet(gdir).createOrReplaceTempView("repair_g")
    // consumer a prunes g away below its explode, consumer b keeps it:
    // the duplicate Generate subtrees canonicalize differently, which
    // also blocks the AGGREGATE unification above them — the fixpoint
    // must first equalize the generates, then union the aggregates
    val gsql =
      """SELECT a.w, a.n, b.mx FROM
        |  (SELECT w, count(*) AS n FROM
        |     (SELECT explode(split(txt, ' ')) AS w, g FROM repair_g) GROUP BY w) a
        |  JOIN (SELECT w, max(g) AS mx FROM
        |     (SELECT explode(split(txt, ' ')) AS w, g FROM repair_g) GROUP BY w) b
        |  ON a.w = b.w""".stripMargin
    val off = spark.sql(gsql)
    val findings = graft.tools.PlanAudit.audit(off.queryExecution.optimizedPlan)
    assert(findings.exists(f => f.kind == "generate" && f.severity == "warn"),
      findings.toString)
    val offRows = off.collect().map(_.toSeq).toSet
    assert(scans(off) == 2, off.queryExecution.executedPlan.toString)
    val (rows, nScans, plan, onFindings) = withRepair {
      val on = spark.sql(gsql)
      val f = graft.tools.PlanAudit.audit(on.queryExecution.optimizedPlan)
      val r = on.collect().map(_.toSeq).toSet
      (r, scans(on), on.queryExecution.executedPlan.toString, f)
    }
    assert(onFindings.forall(_.severity != "warn"), s"still warns: $onFindings")
    assert(rows == offRows, "generate repair changed query results")
    assert(nScans == 1, plan)
    assert(plan.contains("ReusedExchange") || plan.contains("reuses"), plan)
    // idempotence guard: rebuilt members must canonicalize equal, or
    // the fixpoint (and the outer batch) would re-wrap every pass
    withRepair {
      val opt = spark.sql(gsql).queryExecution.optimizedPlan.toString
      assert("RepairProject".r.findAllIn(opt).size <= 4, opt.take(3000))
    }
  }

  test("expand repair: divergently-pruned rollups unified by column union (r18)") {
    val edir = java.nio.file.Files.createTempDirectory("graft_repair_e").toString
    (1 to 4000).map(i => (i % 20L, i % 7L, i.toLong, (i * 3).toLong))
      .toDF("g", "y", "x", "z").write.mode("overwrite").parquet(edir)
    spark.read.parquet(edir).createOrReplaceTempView("repair_e")
    // consumer a's rollup reads (g, y, x), consumer b's (g, y, z):
    // pruning reaches INSIDE the Expand projections, so the union
    // rebuild must align columns semantically (pass-through vs
    // rolled-up vs gid), not by name/position
    val esql =
      """SELECT a.g, a.y, a.s, b.t FROM
        |  (SELECT g, y, sum(x) AS s FROM repair_e GROUP BY ROLLUP(g, y)) a
        |  JOIN (SELECT g, y, sum(z) AS t FROM repair_e GROUP BY ROLLUP(g, y)) b
        |  ON a.g <=> b.g AND a.y <=> b.y""".stripMargin
    val off = spark.sql(esql)
    val findings = graft.tools.PlanAudit.audit(off.queryExecution.optimizedPlan)
    assert(findings.exists(f => f.kind == "expand" && f.severity == "warn"),
      findings.toString)
    val offRows = off.collect().map(_.toSeq).toSet
    assert(scans(off) == 2, off.queryExecution.executedPlan.toString)
    val (rows, nScans, plan, onFindings) = withRepair {
      val on = spark.sql(esql)
      val f = graft.tools.PlanAudit.audit(on.queryExecution.optimizedPlan)
      val r = on.collect().map(_.toSeq).toSet
      (r, scans(on), on.queryExecution.executedPlan.toString, f)
    }
    assert(onFindings.forall(_.severity != "warn"), s"still warns: $onFindings")
    assert(rows == offRows, "expand repair changed query results")
    assert(nScans == 1, plan)
    assert(plan.contains("ReusedExchange") || plan.contains("reuses"), plan)
    withRepair {
      val opt = spark.sql(esql).queryExecution.optimizedPlan.toString
      assert("RepairProject".r.findAllIn(opt).size <= 4, opt.take(3000))
    }
  }

  test("generate repair conservative: different generators / identically-pruned untouched (r18)") {
    val gdir = java.nio.file.Files.createTempDirectory("graft_repair_g2").toString
    (1 to 1000).map(i => (i % 100L, s"a${i % 5} b${i % 3}"))
      .toDF("g", "txt").write.mode("overwrite").parquet(gdir)
    spark.read.parquet(gdir).createOrReplaceTempView("repair_g2")
    withRepair {
      // different generators (split on different separators): the loose
      // keys differ, no group forms, no RepairProject appears
      val diff = spark.sql(
        """SELECT a.w, b.v FROM
          |  (SELECT explode(split(txt, ' ')) AS w FROM repair_g2) a
          |  JOIN (SELECT explode(split(txt, 'b')) AS v FROM repair_g2) b
          |  ON a.w = b.v""".stripMargin)
      assert(!diff.queryExecution.optimizedPlan.toString.contains("RepairProject"),
        diff.queryExecution.optimizedPlan.toString)
      // identically-pruned duplicates: canonical-equal as-is, untouched
      val same = spark.sql(
        """SELECT a.w, b.w2 FROM
          |  (SELECT explode(split(txt, ' ')) AS w, g FROM repair_g2) a
          |  JOIN (SELECT explode(split(txt, ' ')) AS w2, g FROM repair_g2) b
          |  ON a.g = b.g AND a.w = b.w2""".stripMargin)
      assert(!same.queryExecution.optimizedPlan.toString.contains("RepairProject"),
        same.queryExecution.optimizedPlan.toString)
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
      assert(scans(df) == 1, df.queryExecution.executedPlan.toString)
    } finally {
      prevDefault.foreach(org.apache.spark.sql.SparkSession.setDefaultSession)
      prevActive.foreach(org.apache.spark.sql.SparkSession.setActiveSession)
    }
  }
}
