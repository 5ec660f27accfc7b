package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.{Alias, Expression}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.execution.LogicalRDD
import org.apache.spark.sql.execution.datasources.LogicalRelation
import org.apache.spark.sql.execution.datasources.v2.{DataSourceV2Relation, DataSourceV2ScanRelation}

/**
 * Static plan inspection for the "N consumers re-run the same
 * aggregate/scan" anti-pattern (PLANS.md round-12 lesson): Spark's
 * ReuseExchange collapses duplicate subtrees ONLY when they
 * canonicalize EXACTLY equal — column pruning gives each consumer a
 * different output list (or pushes a different projection below the
 * aggregate), the canonical forms diverge, and the shared upstream
 * work silently executes once per consumer. The shipped fix is a
 * lineage barrier ([[graft.Materialize]]); this audit is the
 * detector that says WHERE one is missing.
 *
 * Method: walk the OPTIMIZED logical plan (no job runs); key every
 * Aggregate, Window, and Join subtree (the three exchange carriers)
 * by a LOOSE signature — grouping/partition/join keys + the chain
 * below, with expression ids stripped and pure-pruning Projects
 * skipped, i.e. identity MODULO pruned output lists. A loose group
 * with ≥ 2 members splits two ways:
 *
 *  - all members' `canonicalized` plans equal → ReuseExchange-eligible
 *    (the mb1 self-join shape: same distinct on both sides) → silent;
 *  - canonical forms differ → the duplicates will EACH execute → WARN.
 *
 * A barriered plan cannot trip the audit below the barrier (the
 * subtree is a LogicalRDD leaf) — which is exactly the contract:
 * warnings mean "this plan re-runs shared work at every scale where
 * the barrier gate would have been open".
 *
 * Known blind spot, accepted: canonical-equal duplicates whose top is
 * NOT an exchange boundary still run twice (cheap post-shuffle
 * operators); the audit targets the expensive class — reuse-DEFEATED
 * duplicates — and stays silent on reuse-eligible ones.
 */
object PlanAudit {

  /** severity: `warn` when the duplicated chain bottoms out at a file
    * or v2 SOURCE (each variant re-runs the scan — the expensive
    * class); `info` when it bottoms at a materialized frame
    * (`rdd:`/`local:` — the variants re-read stored blocks, the
    * accepted cost a barrier already paid for). */
  final case class Finding(kind: String, n: Int, severity: String, signature: String) {
    override def toString: String =
      s"PLAN-AUDIT ${severity.toUpperCase}: $kind subtree appears ${n}x with " +
        s"reuse-defeating variants" +
        (if (severity == "warn")
          " (barrier it above the shared frame, or set spark.graft.planaudit.repair=true)"
        else "") +
        s": $signature"
  }

  def audit(df: DataFrame): Seq[Finding] = audit(df.queryExecution.optimizedPlan)

  /** FileScan count of the EXECUTED final plan — the reuse-visibility
    * helper the repair checks share. Two traps it encodes (round-16
    * lessons): AQE plan strings append an "== Initial Plan ==" section
    * after the final one (count only the final section), and exchange
    * reuse shows only in a plan that actually RAN — run `df.collect()`
    * first, not `df.head` (head spawns its own QueryExecution, so the
    * captured plan would be an unexecuted snapshot). */
  def fileScanCount(df: DataFrame): Int =
    "FileScan parquet".r.findAllIn(df.queryExecution.executedPlan
      .toString.split("== Initial Plan ==")(0)).size

  def audit(plan: LogicalPlan): Seq[Finding] = {
    // same defect class, three carriers: Aggregate, Window, and Join
    // subtrees all host an exchange (shuffle on grouping / partition /
    // join keys) that ReuseExchange collapses only under EXACT
    // canonical equality, so divergent pruning re-runs the shared
    // scan+shuffle once per consumer for any of them (VERDICT r16
    // item 4 extended the original aggregate-only detector).
    val groups = scala.collection.mutable.Map.empty[(String, String), List[LogicalPlan]]
    def add(kind: String, p: LogicalPlan): Unit = {
      val k = (kind, loose(p))
      groups(k) = p :: groups.getOrElse(k, Nil)
    }
    def visit(p: LogicalPlan): Unit = {
      p match {
        case a: Aggregate => add("aggregate", a)
        case w: Window => add("window", w)
        case j: Join => add("join", j)
        // round 18: Generate/Expand are the remaining shared-subtree
        // carriers — they host no exchange themselves, but a divergent
        // duplicate defeats reuse of whatever exchange sits ABOVE them
        // (and blocks the aggregate/window/join repairs, whose chains
        // must canonicalize equal below the node)
        case g: Generate => add("generate", g)
        case e: Expand => add("expand", e)
        case _ =>
      }
      p.children.foreach(visit)
      p.subqueries.foreach(visit)
    }
    visit(plan)
    groups.toSeq.collect {
      case ((kind, sig), nodes) if nodes.size >= 2 && diverges(kind, nodes) =>
        val sev = if (sig.contains("files:") || sig.contains("v2:")) "warn" else "info"
        Finding(kind, nodes.size, sev, sig.take(220))
    }.sortBy(f => (f.severity, f.kind, f.signature))
  }

  /** Kind-specific divergence test, targeting WHERE the exchange
    * lives. An Aggregate's shuffle carries the PARTIAL-aggregate rows,
    * so divergence anywhere in the node defeats reuse (the original
    * test). A Window's / Join's shuffle carries the raw CHILD rows —
    * the node itself is post-shuffle compute — so reuse survives any
    * difference in window expression lists, and only canonical
    * divergence of the child chains (per side, for joins) re-runs the
    * shared scan + shuffle. */
  private def diverges(kind: String, nodes: List[LogicalPlan]): Boolean = kind match {
    // Generate and Expand ride the whole-node default with aggregates:
    // consumer pruning lands AT the node (Generate's
    // unrequiredChildIndex, Expand's projections) as well as below it,
    // and the exchange that reuse would collapse sits ABOVE them,
    // carrying their output rows.
    case "window" =>
      nodes.map(_.children.head.canonicalized).distinct.size > 1
    case "join" =>
      nodes.map(_.asInstanceOf[Join].left.canonicalized).distinct.size > 1 ||
        nodes.map(_.asInstanceOf[Join].right.canonicalized).distinct.size > 1
    case _ =>
      nodes.map(_.canonicalized).distinct.size > 1
  }

  /** Structural signature modulo output lists: expression ids
    * stripped, pure-pruning Projects transparent, computed aliases
    * kept (sorted — alias order is presentation, not work). Shared
    * with [[graft.plans.PlanAuditRepair]], whose grouping must agree
    * with this detector's.
    *
    * TWO MODES (round 18): the grouped node's OWN key ignores its
    * output list (that is the whole point — pruning-divergent
    * duplicates must group), but a Window/Aggregate appearing INSIDE a
    * chain is someone else's INPUT, and there its computed outputs ARE
    * its identity: two aggregates over same-spec windows with
    * different window-expression lists read different data and must
    * not group (pre-round-18 this false positive was masked by
    * RepairProject's default-case key; with RepairProject transparent
    * it surfaced in the window-repair spec). Recursion therefore
    * passes asInput = true. */
  private[graft] def loose(p: LogicalPlan): String = loose(p, asInput = false)

  private def loose(p: LogicalPlan, asInput: Boolean): String = p match {
    case Project(list, child) =>
      val computed = list.collect { case a: Alias => norm(a.child) }.sorted
      // a pure pruning Project does not change the data's identity, so
      // the mode passes THROUGH; a computing Project's child is its
      // input
      if (computed.isEmpty) loose(child, asInput)
      else s"proj[${computed.mkString(",")}](${loose(child, asInput = true)})"
    // the repair rule's own narrowing projection: same output-list
    // transparency as Project (it would hit the default case and bake
    // its attribute list into the key, splitting groups the repair's
    // later fixpoint rounds must still see together)
    case rp: graft.plans.RepairProject =>
      val computed = rp.projectList.collect { case a: Alias => norm(a.child) }.sorted
      if (computed.isEmpty) loose(rp.child, asInput)
      else s"proj[${computed.mkString(",")}](${loose(rp.child, asInput = true)})"
    case Aggregate(g, out, child, _) =>
      val outs =
        if (asInput) s"<${out.collect { case a: Alias => norm(a.child) }.sorted.mkString(",")}>"
        else ""
      s"agg[${g.map(norm).sorted.mkString(",")}]$outs(${loose(child, asInput = true)})"
    case Filter(c, child) =>
      // drop IsNotNull conjuncts: the optimizer INFERS null guards
      // from join conditions on some consumers and not others (the
      // au1 case) — a pure null guard reads the same data, so it must
      // not split a loose group; real predicates still do
      val real = conjuncts(c).filterNot(
        _.isInstanceOf[org.apache.spark.sql.catalyst.expressions.IsNotNull])
      if (real.isEmpty) loose(child, asInput)
      else s"filter[${real.map(norm).sorted.mkString(" AND ")}](${loose(child, asInput)})"
    case j: Join =>
      s"join[${j.joinType}][${j.condition.map(norm).getOrElse("-")}]" +
        s"(${j.children.map(loose(_, asInput = true)).mkString(",")})"
    case g: Generate =>
      // outer and qualifier are part of the generator's semantics
      // (explode vs explode_outer emit different row sets), and the
      // repair's unifyGenerates refuses to merge across them
      // (PlanAuditRepair.scala:485) — keying them here keeps the
      // detector and the repair's groupings aligned instead of
      // reporting a divergent-duplicate warning the repair can never
      // fix (ADVICE r18)
      s"generate[${norm(g.generator)}][outer=${g.outer}]" +
        s"[q=${g.qualifier.getOrElse("-")}](${loose(g.child, asInput = true)})"
    // an Expand's projections ARE where consumer pruning lands (each
    // member replicates only the columns its consumer kept), so the
    // grouping key excludes them — only the grouping-set count and the
    // child identity group candidates; the repair's column-union
    // rebuild does all semantic verification canonically. As an INPUT
    // the projections are the identity, like window expression lists.
    case e: Expand =>
      val outs =
        if (asInput) s"<${e.projections.map(_.map(norm).mkString(";")).mkString("|")}>"
        else ""
      s"expand[${e.projections.length}]$outs(${loose(e.child, asInput = true)})"
    case w: Window =>
      val outs =
        if (asInput) s"<${w.windowExpressions.collect {
          case a: Alias => norm(a.child) }.sorted.mkString(",")}>"
        else ""
      s"window[${(w.partitionSpec.map(norm) ++ w.orderSpec.map(norm)).mkString(",")}]" +
        s"$outs(${loose(w.child, asInput = true)})"
    case l: LeafNode => leafId(l)
    case other =>
      // default nodes keep their expressions in the key (a Limit's
      // count, a Sort's order): sk3's three exact-audit branches are
      // limit(r)-distinct work, not duplicates — only Project/
      // Aggregate output lists are deliberately ignored above
      s"${other.nodeName}[${other.expressions.map(norm).mkString(",")}]" +
        s"(${other.children.map(loose(_, asInput = true)).mkString(",")})"
  }

  /** Stable identity for a source, ignoring the projected columns. */
  private def leafId(l: LeafNode): String = l match {
    case r: LogicalRelation =>
      r.relation match {
        case f: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
          s"files:${f.location.rootPaths.mkString(",")}"
        case other => s"rel:${other.getClass.getSimpleName}"
      }
    case r: DataSourceV2ScanRelation => s"v2:${r.relation.table.name}"
    case r: DataSourceV2Relation => s"v2:${r.table.name}"
    case r: LogicalRDD => s"rdd:${r.rdd.id}"
    case r: LocalRelation => s"local:rows=${r.data.size}:${r.schema.simpleString}"
    case other => s"leaf:${other.nodeName}"
  }

  /** Expression text with the per-instance `#id` suffixes removed —
    * the loose key must unify fresh-exprId copies of the same tree. */
  private def norm(e: Expression): String =
    e.toString.replaceAll("#\\d+L?", "")

  private def conjuncts(e: Expression): Seq[Expression] = e match {
    case org.apache.spark.sql.catalyst.expressions.And(l, r) =>
      conjuncts(l) ++ conjuncts(r)
    case other => Seq(other)
  }
}
