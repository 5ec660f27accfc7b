package graft.plans

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule

/**
 * Opt-in CONTINUOUS plan hygiene — [[graft.tools.PlanAudit]]'s
 * reuse-defeated-duplicate detector wired into the optimizer, so it
 * fires on USER queries, not just the shipped keys (the build-gate
 * sweep, PlanAuditSweepSpec, covers those): with
 * `spark.graft.planaudit.log=true`, every distinct optimized plan is
 * swept once and any WARN finding — a duplicated aggregate subtree
 * whose consumers' divergent pruning defeats ReuseExchange, i.e. a
 * query that will silently re-run shared work at scale — is logged
 * with the barrier remedy named.
 *
 * Cost posture: one plan walk per DISTINCT plan (dedup by
 * `semanticHash`, bounded memory), zero when the flag is off
 * (default). Never transforms the plan — a pure observer in rule
 * clothing, the same trick Spark's own logging rules use. The 100 TB
 * deployment turns it on ([[graft.GraftConf.cluster]]): at that scale
 * a silent double scan costs more than every sweep this will ever
 * run.
 */
object PlanAuditLog extends Rule[LogicalPlan] {

  val FlagKey = "spark.graft.planaudit.log"

  /** Observability for specs (and curious operators): total WARN
    * findings logged by this JVM. */
  val warnCount = new java.util.concurrent.atomic.AtomicLong(0L)

  private val slog = org.slf4j.LoggerFactory.getLogger(getClass)

  private val seen = java.util.Collections.newSetFromMap(
    new java.util.concurrent.ConcurrentHashMap[Integer, java.lang.Boolean]())
  private val MaxSeen = 8192

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val enabled = scala.util.Try(
      conf.getConfString(FlagKey, "false").toBoolean).getOrElse(false)
    if (enabled) {
      if (seen.size > MaxSeen) seen.clear()
      if (seen.add(plan.semanticHash())) {
        graft.tools.PlanAudit.audit(plan)
          .filter(_.severity == "warn")
          .foreach { f =>
            warnCount.incrementAndGet()
            slog.warn(s"graft plan audit: ${f.toString.take(400)}")
          }
      }
    }
    plan
  }
}
