package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.{Cross, Inner, LeftAnti, LeftOuter, LeftSemi, RightOuter}
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
    val aggs = scala.collection.mutable.LinkedHashMap.empty[String, List[Aggregate]]
    val wins = scala.collection.mutable.LinkedHashMap.empty[String, List[Window]]
    val joins = scala.collection.mutable.LinkedHashMap.empty[String, List[Join]]
    val gens = scala.collection.mutable.LinkedHashMap.empty[String, List[Generate]]
    val exps = scala.collection.mutable.LinkedHashMap.empty[String, List[Expand]]
    // walk subquery plans too — the detector does (PlanAudit.audit
    // recurses into p.subqueries), so a repair that skipped them would
    // leave warn findings it can never fix (review r17 finding).
    // Duplicates that straddle a subquery boundary group together here
    // and unify fine: the replacement map is applied by
    // transformUpWithSubqueries below.
    def visit(p: LogicalPlan): Unit = {
      p match {
        case a: Aggregate =>
          val k = graft.tools.PlanAudit.loose(a)
          aggs(k) = a :: aggs.getOrElse(k, Nil)
        case w: Window =>
          val k = graft.tools.PlanAudit.loose(w)
          wins(k) = w :: wins.getOrElse(k, Nil)
        case j: Join =>
          val k = graft.tools.PlanAudit.loose(j)
          joins(k) = j :: joins.getOrElse(k, Nil)
        case g: Generate =>
          val k = graft.tools.PlanAudit.loose(g)
          gens(k) = g :: gens.getOrElse(k, Nil)
        case e: Expand =>
          val k = graft.tools.PlanAudit.loose(e)
          exps(k) = e :: exps.getOrElse(k, Nil)
        case _ =>
      }
      p.children.foreach(visit)
      p.subqueries.foreach(visit)
    }
    visit(plan)
    val replacements = new java.util.IdentityHashMap[LogicalPlan, LogicalPlan]()
    def record(ms: IndexedSeq[LogicalPlan], rs: IndexedSeq[LogicalPlan]): Unit =
      ms.zip(rs).foreach { case (m, r) => replacements.put(m, r) }
    aggs.values.foreach { members =>
      if (members.size >= 2 && members.map(_.canonicalized).distinct.size > 1) {
        val ms = members.reverse.toIndexedSeq
        unify(ms).foreach(record(ms, _))
      }
    }
    // Window/Join divergence is judged on the CHILD chains, matching
    // the detector: the exchange carries raw child rows, so a node
    // whose children already canonicalize equal is reuse-eligible
    // as-is and must be left alone.
    wins.values.foreach { members =>
      if (members.size >= 2 &&
          members.map(_.child.canonicalized).distinct.size > 1) {
        val ms = members.reverse.toIndexedSeq
        unifyWindows(ms).foreach(record(ms, _))
      }
    }
    joins.values.foreach { members =>
      if (members.size >= 2 &&
          (members.map(_.left.canonicalized).distinct.size > 1 ||
           members.map(_.right.canonicalized).distinct.size > 1)) {
        val ms = members.reverse.toIndexedSeq
        unifyJoins(ms).foreach(record(ms, _))
      }
    }
    // Generate/Expand divergence is whole-node like aggregates:
    // consumer pruning lands AT the node (unrequiredChildIndex /
    // projections) as well as below it, and the exchange reuse would
    // collapse sits ABOVE them, carrying their output rows (matching
    // the detector's judges).
    gens.values.foreach { members =>
      if (members.size >= 2 && members.map(_.canonicalized).distinct.size > 1) {
        val ms = members.reverse.toIndexedSeq
        unifyGenerates(ms).foreach(record(ms, _))
      }
    }
    exps.values.foreach { members =>
      if (members.size >= 2 && members.map(_.canonicalized).distinct.size > 1) {
        val ms = members.reverse.toIndexedSeq
        unifyExpands(ms).foreach(record(ms, _))
      }
    }
    if (replacements.isEmpty) plan
    else {
      repairCount.incrementAndGet()
      logInfo(s"graft plan repair: unified ${replacements.size()} reuse-defeated " +
        "duplicate aggregate/window/join subtrees into canonical-equal forms")
      plan.transformUpWithSubqueries {
        case p if replacements.containsKey(p) => replacements.get(p)
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
    // a pure-attribute RepairProject is this rule's OWN narrowing (the
    // Generate/Expand repairs wrap members in one) — transparent like
    // a pruning Project, so a later fixpoint round's aggregate/window/
    // join unification can see through to the now-equalized chain
    case rp: RepairProject if rp.projectList.forall(_.isInstanceOf[AttributeReference]) =>
      splitGuards(rp.child)
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
    if (!planDeterministic(c0)) return None
    // positional attribute correspondence between canonical-equal chains
    val toDonor = chains.map(c => AttributeMap(c.output.zip(c0.output)))
    val fromDonor = chains.map(c => AttributeMap(c0.output.zip(c.output)))
    val refsOk = members.indices.forall { i =>
      (members(i).aggregateExpressions ++ members(i).groupingExpressions ++
        memberGuards(i))
        .forall(_.references.forall(toDonor(i).contains))
    }
    if (!refsOk) return None

    // null guards: the COMMON conjuncts (canonical intersection in
    // donor space) stay below the wide aggregate, preserving the scan
    // pushdown; each member's RESIDUAL guards lift ABOVE its
    // RepairProject — sound only when they reference grouping
    // attributes the member outputs (a group-level predicate commutes
    // with grouping), so any other residual skips the group
    val guardKeys = members.indices.map(i =>
      memberGuards(i).map(g => translateTo(g, toDonor(i)).canonicalized))
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
      memberGuards(0).map(g => translateTo(g, toDonor(0)))
        .filter(g => commonKeys.contains(g.canonicalized) && seen.add(g.canonicalized))
    }

    // grouping: one shared order (the donor's); members must agree as
    // a canonical multiset
    val g0 = members(0).groupingExpressions
    val g0Key = g0.map(e => translateTo(e, toDonor(0)).canonicalized).groupBy(identity)
      .view.mapValues(_.size).toMap
    val groupingOk = members.indices.forall { i =>
      members(i).groupingExpressions.map(e => translateTo(e, toDonor(i)).canonicalized)
        .groupBy(identity).view.mapValues(_.size).toMap == g0Key
    }
    if (!groupingOk) return None
    val donorGrouping = g0.map(e => translateTo(e, toDonor(0)))

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
        val donorNe = translateTo(ne, toDonor(i)).asInstanceOf[NamedExpression]
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
        translateTo(ne, fromDonor(i)) match {
          case al: Alias => al.copy()(exprId = NamedExpression.newExprId,
            qualifier = al.qualifier, explicitMetadata = al.explicitMetadata,
            nonInheritableMetadataKeys = al.nonInheritableMetadataKeys)
          case a: Attribute => a
          case other => Alias(other, "graft_repair")()
        }
      }
      val groupingI = donorGrouping.map(e => translateTo(e, fromDonor(i)))
      val guardedChain =
        if (commonDonor.isEmpty) chains(i)
        else Filter(commonDonor.map(g => translateTo(g, fromDonor(i))).reduce(And),
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
        val k = strippedKey(translateTo(ne, toDonor(i)).asInstanceOf[NamedExpression])
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

  private def translateTo(e: Expression, m: AttributeMap[Attribute]): Expression =
    e.transform { case a: Attribute if m.contains(a) => m(a) }

  /** No expression anywhere in the chain is nondeterministic. The
    * originals were INDEPENDENT evaluations of e.g. rand(); unifying
    * them into one shared subtree would correlate draws that the user
    * wrote as uncorrelated, so such groups are skipped (Spark's own
    * ReuseExchange only ever collapses subtrees that were ALREADY
    * canonical-equal — a posture the user opted into by writing the
    * same nondeterministic subtree twice). */
  private def planDeterministic(p: LogicalPlan): Boolean = {
    var ok = true
    p.foreach { n => if (n.expressions.exists(e => !e.deterministic)) ok = false }
    ok
  }

  /** Per-member equalized child chain for a Window/Join group, plus
    * the residual guards the caller must lift (or reject). */
  private final case class Equalized(
      rebuilt: IndexedSeq[LogicalPlan],
      residuals: IndexedSeq[Seq[Expression]],
      donorPairs: IndexedSeq[Seq[(Attribute, Attribute)]])

  /** The Window/Join analogue of the aggregate union's donor
    * discipline, applied to the exchange INPUT instead of the node:
    * verify every member's chain below its pruning Projects / null
    * guards canonicalizes equal to the donor's, then rebuild each
    * member's child as `Project(neededDonorCols, Filter(commonGuards,
    * chain_i))` where the needed set and guard list are IDENTICAL in
    * donor space across members — so the rebuilt children canonicalize
    * EQUAL and the shuffle/broadcast exchange above them is executed
    * once. Member-specific residual guards are returned for the caller
    * to lift above the node (callers reject lifts their semantics
    * don't allow via `canLift`). */
  private def equalize(
      rawChildren: IndexedSeq[LogicalPlan],
      canLift: (Int, Expression) => Boolean): Option[Equalized] = {
    val split = rawChildren.map(splitGuards)
    val chains = split.map(_._1)
    val memberGuards = split.map(_._2)
    val c0 = chains.head
    if (!chains.forall(c => c.canonicalized == c0.canonicalized &&
        c.output.length == c0.output.length)) return None
    if (!planDeterministic(c0)) return None
    val toDonor = chains.map(c => AttributeMap(c.output.zip(c0.output)))
    // every retained column and guard must map into donor space
    // (pruned child outputs are chain outputs by construction, but be
    // conservative about anything exotic)
    val refsOk = rawChildren.indices.forall { i =>
      rawChildren(i).output.forall(toDonor(i).contains) &&
        memberGuards(i).forall(_.references.forall(toDonor(i).contains))
    }
    if (!refsOk) return None
    val guardKeys = rawChildren.indices.map(i =>
      memberGuards(i).map(g => translateTo(g, toDonor(i)).canonicalized))
    val commonKeys = guardKeys.reduce((a, b) => a.filter(b.contains)).distinct.toSet
    val residuals = rawChildren.indices.map { i =>
      memberGuards(i).zip(guardKeys(i)).collect {
        case (g, k) if !commonKeys.contains(k) => g
      }
    }
    if (!rawChildren.indices.forall(i => residuals(i).forall(g => canLift(i, g))))
      return None
    val commonDonor: Seq[Expression] = {
      val seen = scala.collection.mutable.HashSet.empty[Expression]
      memberGuards(0).map(g => translateTo(g, toDonor(0)))
        .filter(g => commonKeys.contains(g.canonicalized) && seen.add(g.canonicalized))
    }
    // donor-space needed set: every member's retained columns plus the
    // refs of every member's lifted guards — ONE set for all members,
    // so the rebuilt pruning Projects canonicalize equal
    val neededDonor = AttributeSet(rawChildren.indices.flatMap { i =>
      (rawChildren(i).output ++ residuals(i).flatMap(_.references.toSeq))
        .map(a => toDonor(i)(a))
    })
    val rebuilt = rawChildren.indices.map { i =>
      val fromDonor = AttributeMap(c0.output.zip(chains(i).output))
      val guarded =
        if (commonDonor.isEmpty) chains(i)
        else Filter(commonDonor.map(g => translateTo(g, fromDonor)).reduce(And),
          chains(i))
      if (chains(i).output.forall(a => neededDonor.contains(toDonor(i)(a)))) guarded
      else Project(chains(i).output.filter(a => neededDonor.contains(toDonor(i)(a))),
        guarded)
    }
    Some(Equalized(rebuilt, residuals,
      chains.map(c => c.output.zip(c0.output))))
  }

  /** Rebuild a divergent-children Window group over equalized chains.
    * Unlike the aggregate path there is NO expression union: the
    * exchange carries raw child rows, so making the CHILDREN
    * canonical-equal is what restores reuse — each member keeps its
    * own window expression list (and so computes only what its
    * consumer asked for, post-shuffle). Residual null guards may lift
    * above the window only when they reference partition keys alone:
    * a partition-level predicate drops whole partitions, which cannot
    * change any window value in the surviving ones. */
  private def unifyWindows(members: IndexedSeq[Window]): Option[IndexedSeq[LogicalPlan]] = {
    if (members.map(_.hint).distinct.size != 1) return None
    if (!members.forall(m => (m.windowExpressions ++ m.partitionSpec ++ m.orderSpec)
        .forall(_.deterministic))) return None
    if (!members.forall(_.windowExpressions.forall(_.isInstanceOf[Alias]))) return None
    // residual lift gate: each residual ref must ITSELF be a partition
    // key attribute — `references of partitionSpec` would be weaker
    // (partitioning on coalesce(g, 0) groups g-null rows into a live
    // partition, so a lifted IsNotNull(g) guard would change surviving
    // rows' window values; review r17 finding)
    val partAttrs = members.map(m =>
      AttributeSet(m.partitionSpec.collect { case a: Attribute => a }))
    equalize(members.map(_.child),
      (i, g) => g.references.subsetOf(partAttrs(i))).flatMap { eq =>
      // specs must agree positionally-canonically in donor space — the
      // loose key's normalized strings are only the grouping heuristic
      def specKey(i: Int): (Seq[Expression], Seq[Expression]) = {
        val m = AttributeMap(eq.donorPairs(i))
        (members(i).partitionSpec.map(e => translateTo(e, m).canonicalized),
          members(i).orderSpec.map(e => translateTo(e, m).canonicalized))
      }
      val s0 = specKey(0)
      if (!members.indices.forall(i => specKey(i) == s0)) None
      else Some(members.indices.map { i =>
        val w = members(i).copy(child = eq.rebuilt(i))
        val body: LogicalPlan =
          if (eq.residuals(i).isEmpty) w
          else Filter(eq.residuals(i).reduce(And), w)
        // pure narrowing back to the member's exact original output:
        // child attrs keep their exprIds through the wider Project,
        // window attrs keep theirs because the expression list is the
        // member's own
        RepairProject(members(i).output, body)
      })
    }
  }

  /** Rebuild a divergent duplicate-Generate group (round 18). Like
    * windows there is no expression union: equalizing the child chains
    * AND dropping the node-level pruning (`unrequiredChildIndex = Nil`
    * — every child column passes through; the RepairProject narrows
    * back) makes the rebuilt members canonicalize EQUAL, so an
    * exchange above them reuses — and the aggregate/window/join
    * repairs, whose chains must canonicalize equal BELOW their node,
    * become eligible on the next internal-fixpoint round. Residual
    * null guards always lift soundly: Generate is per-row (outer
    * included — a dropped input row contributes exactly its own output
    * rows), and the rebuilt node passes every child attribute a
    * residual could reference. */
  private def unifyGenerates(members: IndexedSeq[Generate]): Option[IndexedSeq[LogicalPlan]] = {
    if (!members.forall(_.generator.deterministic)) return None
    if (members.map(_.outer).distinct.size != 1 ||
        members.map(_.qualifier).distinct.size != 1) return None
    equalize(members.map(_.child), (_, _) => true).flatMap { eq =>
      def genKey(i: Int): Expression =
        translateTo(members(i).generator, AttributeMap(eq.donorPairs(i))).canonicalized
      val k0 = genKey(0)
      if (!members.indices.forall(i => genKey(i) == k0)) None
      else Some(members.indices.map { i =>
        val g = members(i).copy(unrequiredChildIndex = Nil, child = eq.rebuilt(i))
        val body: LogicalPlan =
          if (eq.residuals(i).isEmpty) g
          else Filter(eq.residuals(i).reduce(And), g)
        RepairProject(members(i).output, body)
      })
    }
  }

  /** Rebuild a divergent duplicate-Expand group (round 18) by COLUMN
    * UNION. Consumer pruning reaches INSIDE an Expand: each member's
    * projections replicate only the columns its consumer kept, so two
    * same-rollup Expands diverge structurally, not just below. Column
    * identity = the donor-canonical expression SEQUENCE down the
    * projection rows at one output position (a pass-through aggregate
    * input is `(x,x,x)`, a rolled-up grouping column is `(g,g,null)`,
    * the gid is its literal column — so positions align semantically,
    * never by name). Every member is rebuilt with the union of column
    * identities in one shared first-seen order — its own expressions
    * where it has the column, the representative member's (donor-
    * translated) where it doesn't — over equalized children, then
    * narrowed back by RepairProject. Residual guards do not lift
    * (grouping-set rows NULL OUT grouping columns by design — a
    * lifted IsNotNull would drop rollup rows), so any residual skips
    * the group. */
  private def unifyExpands(members: IndexedSeq[Expand]): Option[IndexedSeq[LogicalPlan]] = {
    if (!members.forall(_.projections.forall(_.forall(_.deterministic)))) return None
    val nRows = members.head.projections.length
    if (!members.forall(m => m.projections.length == nRows &&
        m.projections.forall(_.length == m.output.length))) return None
    equalize(members.map(_.child), (_, _) => false).flatMap { eq =>
      val toDonorMaps = members.indices.map(i => AttributeMap(eq.donorPairs(i)))
      val fromDonorMaps = members.indices.map(i =>
        AttributeMap(eq.donorPairs(i).map(_.swap)))
      def colKey(i: Int, p: Int): Seq[Expression] =
        members(i).projections.map(row => translateTo(row(p), toDonorMaps(i)).canonicalized)
      val memberKeys = members.indices.map(i =>
        members(i).output.indices.map(p => colKey(i, p)))
      // a member with two identical column identities would make the
      // position lookup ambiguous — conservative skip
      if (!memberKeys.forall(ks => ks.distinct.length == ks.length)) return None
      val unionKeys = scala.collection.mutable.ArrayBuffer.empty[Seq[Expression]]
      val rep = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
      val keyIdx = scala.collection.mutable.HashMap.empty[Seq[Expression], Int]
      members.indices.foreach { i =>
        memberKeys(i).zipWithIndex.foreach { case (k, p) =>
          if (!keyIdx.contains(k)) {
            keyIdx(k) = unionKeys.length; unionKeys += k; rep += ((i, p))
          }
        }
      }
      // a column some member LACKS must be a constant pass-through of
      // one child attribute (an aggregate-input column — `(x,x,x)`
      // down the rows): its rebuilt output can then BE the member's
      // own child attribute, which canonicalizes by child position
      // exactly like the owning member's, so the rebuilt Expands
      // canonicalize EQUAL (a fresh attribute would normalize as a
      // produced id on one member and a child position on the other —
      // the round-18 re-wrap bug). Grouping/gid columns exist in every
      // member by construction (same rollup), so only pass-throughs
      // are ever borrowed; anything else skips the group.
      // raw (uncanonicalized) donor-space expression of a union column,
      // from its representative member's first projection row
      def donorRaw(u: Int): Expression = {
        val (j, p) = rep(u)
        translateTo(members(j).projections(0)(p), toDonorMaps(j))
      }
      val borrowedOk = unionKeys.indices.forall { u =>
        val k = unionKeys(u)
        val passThrough = k.distinct.length == 1 && donorRaw(u).isInstanceOf[Attribute]
        passThrough || members.indices.forall(i => memberKeys(i).contains(k))
      }
      if (!borrowedOk) return None
      Some(members.indices.map { i =>
        val myIdx = memberKeys(i).zipWithIndex.toMap
        // the member's OWN child attribute for a borrowed pass-through
        def borrowAttr(u: Int): Attribute =
          translateTo(donorRaw(u), fromDonorMaps(i)).asInstanceOf[Attribute]
        val projections: Seq[Seq[Expression]] = (0 until nRows).map { r =>
          unionKeys.indices.map { u =>
            myIdx.get(unionKeys(u)) match {
              case Some(p) => members(i).projections(r)(p)
              case None => borrowAttr(u)
            }
          }.toSeq
        }
        val output: Seq[Attribute] = unionKeys.indices.map { u =>
          myIdx.get(unionKeys(u)) match {
            case Some(p) => members(i).output(p)
            case None => borrowAttr(u)
          }
        }.toSeq
        RepairProject(members(i).output,
          Expand(projections, output, eq.rebuilt(i)))
      })
    }
  }

  /** Rebuild a divergent-children Join group over per-side equalized
    * chains. As with windows there is no union step — the two child
    * exchanges (shuffle or broadcast) are what reuse collapses once
    * the sides canonicalize equal; the join itself is post-exchange
    * compute. Residual guards lift above the join only where a filter
    * commutes with the join type on that side's columns. */
  private def unifyJoins(members: IndexedSeq[Join]): Option[IndexedSeq[LogicalPlan]] = {
    if (members.map(_.hint).distinct.size != 1) return None
    if (members.map(_.joinType).distinct.size != 1) return None
    if (!members.forall(_.condition.forall(_.deterministic))) return None
    val (liftLeft, liftRight) = members.head.joinType match {
      case Inner | Cross => (true, true)
      case LeftOuter | LeftSemi | LeftAnti => (true, false)
      case RightOuter => (false, true)
      case _ => (false, false)
    }
    for {
      le <- equalize(members.map(_.left), (_, _) => liftLeft)
      re <- equalize(members.map(_.right), (_, _) => liftRight)
      condOk = {
        def key(i: Int): Option[Expression] = {
          val m = AttributeMap(le.donorPairs(i) ++ re.donorPairs(i))
          members(i).condition.map(c => translateTo(c, m).canonicalized)
        }
        val k0 = key(0)
        members.indices.forall(i => key(i) == k0)
      }
      if condOk
    } yield members.indices.map { i =>
      val j = members(i).copy(left = le.rebuilt(i), right = re.rebuilt(i))
      val res = le.residuals(i) ++ re.residuals(i)
      val body: LogicalPlan = if (res.isEmpty) j else Filter(res.reduce(And), j)
      RepairProject(members(i).output, body)
    }
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
