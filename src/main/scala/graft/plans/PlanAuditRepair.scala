package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule

/**
 * Opt-in REPAIR of the reuse-defeated duplicate-aggregate
 * anti-pattern — the promotion of [[graft.tools.PlanAudit]] from
 * observer to fixer (VERDICT r15 item 3).
 *
 * The defect class (PLANS.md round-12 lesson): Spark's ReuseExchange
 * collapses duplicate subtrees ONLY when they canonicalize EXACTLY
 * equal. Column pruning gives each consumer of a shared aggregate a
 * different output list, the canonical forms diverge, and the shared
 * scan + partial aggregate silently execute once per consumer.
 * [[PlanAuditLog]] warns about it; with
 * `spark.graft.planaudit.repair=true` this rule FIXES it, in plan
 * space, with no materialization job:
 *
 *  1. group Aggregate subtrees by [[graft.tools.PlanAudit.loose]]'s
 *     identity-modulo-pruning signature; keep groups whose canonical
 *     forms diverge (the reuse-defeated class);
 *  2. verify real (not string) equivalence: every member's chain
 *     below its pruning Projects canonicalizes equal to the donor's,
 *     and the grouping lists translate to the same canonical multiset
 *     (the loose key is only the grouping heuristic — all semantic
 *     checks here are canonical-exact, so key collisions cannot
 *     produce a wrong repair, only a skipped one);
 *  3. rebuild every member as the UNION aggregate — the deduplicated
 *     union of all members' aggregate expressions, in one shared
 *     deterministic order, translated into each member's own
 *     attribute space (positional correspondence of the
 *     canonical-equal chains) — under a [[RepairProject]] that
 *     restores the member's exact original output list and exprIds,
 *     so every parent resolves unchanged.
 *
 * The rebuilt members are structurally identical modulo exprIds, so
 * they canonicalize EQUAL and ReuseExchange (or AQE stage reuse)
 * executes the scan + partial aggregate + shuffle ONCE; only the
 * cheap post-shuffle final aggregate and the restoring projection run
 * per consumer. [[RepairProject]] is a custom node precisely so the
 * late RewriteSubquery batch's ColumnPruning/CollapseProject (which
 * run AFTER the Pre-CBO slot this rule occupies on the extensions
 * path) cannot narrow the union aggregate back into the divergent
 * originals — they match on the `Project` class, and this is not one.
 * At physical planning it becomes a plain ProjectExec.
 *
 * Idempotent by construction: rebuilt groups canonicalize equal, so a
 * second pass (the register() path hosts this rule in a fixed-point
 * batch) finds no divergent group and is a no-op. Streaming plans are
 * left alone. Cost: one plan walk per invocation when the flag is on,
 * zero when off (default).
 */
object PlanAuditRepair extends Rule[LogicalPlan] {

  val FlagKey = "spark.graft.planaudit.repair"

  /** Observability for specs: total aggregate groups unified by this
    * JVM. */
  val repairCount = new java.util.concurrent.atomic.AtomicLong(0L)

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val enabled = scala.util.Try(
      conf.getConfString(FlagKey, "false").toBoolean).getOrElse(false)
    if (!enabled || plan.isStreaming) return plan
    // internal fixpoint (bounded): repairing an INNER group rebuilds
    // the outer members via withNewChildren, so the identity map
    // misses them in the same pass — nested divergent groups need
    // another sweep over the rebuilt tree (review r16 finding). The
    // rebuilt inner subtrees canonicalize equal, so the outer group
    // becomes eligible on the next pass; no-replacement terminates.
    var p = plan
    var rounds = 0
    var changed = true
    while (changed && rounds < 4) {
      val next = repairOnce(p)
      changed = !(next eq p)
      p = next
      rounds += 1
    }
    p
  }

  private def repairOnce(plan: LogicalPlan): LogicalPlan = {
    val groups = scala.collection.mutable.LinkedHashMap.empty[String, List[Aggregate]]
    plan.foreach {
      case a: Aggregate =>
        val k = graft.tools.PlanAudit.loose(a)
        groups(k) = a :: groups.getOrElse(k, Nil)
      case _ =>
    }
    val replacements = new java.util.IdentityHashMap[Aggregate, LogicalPlan]()
    groups.values.foreach { members =>
      if (members.size >= 2 && members.map(_.canonicalized).distinct.size > 1) {
        unify(members.reverse.toIndexedSeq).foreach { rebuilt =>
          members.reverse.zip(rebuilt).foreach { case (m, r) => replacements.put(m, r) }
        }
      }
    }
    if (replacements.isEmpty) plan
    else {
      repairCount.incrementAndGet()
      logInfo(s"graft plan repair: unified ${replacements.size()} reuse-defeated " +
        "duplicate aggregates into canonical-equal union aggregates")
      plan.transformUp {
        case a: Aggregate if replacements.containsKey(a) => replacements.get(a)
      }
    }
  }

  /** Pure column-pruning Projects are transparent — the same skip
    * [[graft.tools.PlanAudit.loose]] applies. */
  private def stripPruning(p: LogicalPlan): LogicalPlan = p match {
    case Project(list, child) if list.forall(_.isInstanceOf[AttributeReference]) =>
      stripPruning(child)
    case other => other
  }

  private def conjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => conjuncts(l) ++ conjuncts(r)
    case other => Seq(other)
  }

  /** Peel pure null-guard Filters (all conjuncts IsNotNull) and
    * pruning Projects off the chain, returning (core, guards). The
    * optimizer INFERS these guards from join conditions on some
    * consumers and not others (the same asymmetry
    * [[graft.tools.PlanAudit.loose]] documents), so a guard-sensitive
    * canonical compare would skip exactly the groups users hit. */
  private def splitGuards(p: LogicalPlan): (LogicalPlan, Seq[Expression]) = p match {
    case Project(list, child) if list.forall(_.isInstanceOf[AttributeReference]) =>
      splitGuards(child)
    case Filter(cond, child) if conjuncts(cond).forall(_.isInstanceOf[IsNotNull]) =>
      val (core, gs) = splitGuards(child)
      (core, conjuncts(cond) ++ gs)
    case other => (other, Nil)
  }

  /** Rebuild every member over the union aggregate, or None when any
    * semantic precondition fails (conservative skip — the observer
    * still logs). */
  private def unify(members: IndexedSeq[Aggregate]): Option[IndexedSeq[LogicalPlan]] = {
    if (!members.forall(m => m.aggregateExpressions.forall(_.deterministic) &&
        m.groupingExpressions.forall(_.deterministic))) return None
    val split = members.map(m => splitGuards(m.child))
    val chains = split.map(_._1)
    val memberGuards = split.map(_._2)
    val c0 = chains.head
    if (!chains.forall(c => c.canonicalized == c0.canonicalized &&
        c.output.length == c0.output.length)) return None
    // positional attribute correspondence between canonical-equal chains
    val toDonor = chains.map(c => AttributeMap(c.output.zip(c0.output)))
    val fromDonor = chains.map(c => AttributeMap(c0.output.zip(c.output)))
    val refsOk = members.indices.forall { i =>
      (members(i).aggregateExpressions ++ members(i).groupingExpressions ++
        memberGuards(i))
        .forall(_.references.forall(toDonor(i).contains))
    }
    if (!refsOk) return None

    def translate(e: Expression, m: AttributeMap[Attribute]): Expression =
      e.transform { case a: Attribute if m.contains(a) => m(a) }

    // null guards: the COMMON conjuncts (canonical intersection in
    // donor space) stay below the wide aggregate, preserving the scan
    // pushdown; each member's RESIDUAL guards lift ABOVE its
    // RepairProject — sound only when they reference grouping
    // attributes the member outputs (a group-level predicate commutes
    // with grouping), so any other residual skips the group
    val guardKeys = members.indices.map(i =>
      memberGuards(i).map(g => translate(g, toDonor(i)).canonicalized))
    val commonKeys = guardKeys.reduce((a, b) => a.filter(b.contains)).distinct.toSet
    val residuals = members.indices.map { i =>
      memberGuards(i).zip(guardKeys(i)).collect {
        case (g, k) if !commonKeys.contains(k) => g
      }
    }
    val liftOk = members.indices.forall { i =>
      val groupRefs = AttributeSet(members(i).groupingExpressions.flatMap(_.references))
      residuals(i).forall(g => g.references.subsetOf(groupRefs) &&
        g.references.subsetOf(members(i).outputSet))
    }
    if (!liftOk) return None
    // one canonical-deduped common-guard list in donor space, in the
    // donor member's order (same order for every member => canonical
    // equality of the rebuilt Filters)
    val commonDonor: Seq[Expression] = {
      val seen = scala.collection.mutable.HashSet.empty[Expression]
      memberGuards(0).map(g => translate(g, toDonor(0)))
        .filter(g => commonKeys.contains(g.canonicalized) && seen.add(g.canonicalized))
    }

    // grouping: one shared order (the donor's); members must agree as
    // a canonical multiset
    val g0 = members(0).groupingExpressions
    val g0Key = g0.map(e => translate(e, toDonor(0)).canonicalized).groupBy(identity)
      .view.mapValues(_.size).toMap
    val groupingOk = members.indices.forall { i =>
      members(i).groupingExpressions.map(e => translate(e, toDonor(i)).canonicalized)
        .groupBy(identity).view.mapValues(_.size).toMap == g0Key
    }
    if (!groupingOk) return None
    val donorGrouping = g0.map(e => translate(e, toDonor(0)))

    // union aggregate list in donor space, deduplicated by the
    // canonical form of the unaliased computation, in first-seen order
    def strippedKey(ne: NamedExpression): Expression = ne match {
      case Alias(c, _) => c.canonicalized
      case other => other.canonicalized
    }
    val union = scala.collection.mutable.ArrayBuffer.empty[NamedExpression]
    val keyToIdx = scala.collection.mutable.HashMap.empty[Expression, Int]
    members.indices.foreach { i =>
      members(i).aggregateExpressions.foreach { ne =>
        val donorNe = translate(ne, toDonor(i)).asInstanceOf[NamedExpression]
        val k = strippedKey(donorNe)
        if (!keyToIdx.contains(k)) { keyToIdx(k) = union.length; union += donorNe }
      }
    }

    Some(members.indices.map { i =>
      // the member's union aggregate: donor entries translated into
      // its own attribute space, alias exprIds FRESH (the originals
      // are restored by RepairProject; fresh ids keep sibling members
      // exprId-disjoint, the Join.duplicateResolved invariant)
      val unionI: IndexedSeq[NamedExpression] = union.toIndexedSeq.map { ne =>
        translate(ne, fromDonor(i)) match {
          case al: Alias => al.copy()(exprId = NamedExpression.newExprId,
            qualifier = al.qualifier, explicitMetadata = al.explicitMetadata,
            nonInheritableMetadataKeys = al.nonInheritableMetadataKeys)
          case a: Attribute => a
          case other => Alias(other, "graft_repair")()
        }
      }
      val groupingI = donorGrouping.map(e => translate(e, fromDonor(i)))
      val guardedChain =
        if (commonDonor.isEmpty) chains(i)
        else Filter(commonDonor.map(g => translate(g, fromDonor(i))).reduce(And),
          chains(i))
      val needed = AttributeSet(unionI.flatMap(_.references) ++
        groupingI.flatMap(_.references))
      val prunedChild =
        if (chains(i).outputSet.subsetOf(needed)) guardedChain
        else Project(chains(i).output.filter(needed.contains), guardedChain)
      val wide = members(i).copy(groupingExpressions = groupingI,
        aggregateExpressions = unionI, child = prunedChild)
      // restore the member's EXACT original output (names + exprIds +
      // order), so every parent operator resolves unchanged
      val restore: Seq[NamedExpression] = members(i).aggregateExpressions.map { ne =>
        val k = strippedKey(translate(ne, toDonor(i)).asInstanceOf[NamedExpression])
        val src = unionI(keyToIdx(k)).toAttribute
        ne match {
          case a: Attribute if src.exprId == a.exprId => a
          case al: Alias => Alias(src, al.name)(exprId = al.exprId,
            qualifier = al.qualifier, explicitMetadata = al.explicitMetadata,
            nonInheritableMetadataKeys = al.nonInheritableMetadataKeys)
          case other => Alias(src, other.name)(exprId = other.exprId)
        }
      }
      val body = RepairProject(restore, wide)
      if (residuals(i).isEmpty) body
      else Filter(residuals(i).reduce(And), body)
    })
  }
}

/** A projection that later optimizer batches cannot collapse:
  * ColumnPruning / CollapseProject match on the `Project` class, and
  * the whole point of the repair is that the union aggregate below
  * must NOT be narrowed back into the divergent originals. Physically
  * it is a plain ProjectExec. */
case class RepairProject(projectList: Seq[NamedExpression], child: LogicalPlan)
  extends UnaryNode {
  override def output: Seq[Attribute] = projectList.map(_.toAttribute)
  override def maxRows: Option[Long] = child.maxRows
  override protected def withNewChildInternal(newChild: LogicalPlan): RepairProject =
    copy(child = newChild)
}

object RepairProjectStrategy extends org.apache.spark.sql.execution.SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[org.apache.spark.sql.execution.SparkPlan] =
    plan match {
      case RepairProject(list, child) =>
        org.apache.spark.sql.execution.ProjectExec(list, planLater(child)) :: Nil
      case _ => Nil
    }
}
