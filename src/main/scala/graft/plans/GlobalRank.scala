package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode, Window}
import org.apache.spark.sql.catalyst.plans.physical.{Distribution, OrderedDistribution, Partitioning}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.{SparkPlan, UnaryExecNode}
import org.apache.spark.sql.types.IntegerType

/**
 * AUTOMATIC distributed ranking — the planner promotion of
 * [[graft.operators.RangeRank]] (VERDICT r13/r14 item 1).
 *
 * `row_number()/rank()/dense_rank()/percent_rank()/ntile(k) OVER
 * (ORDER BY ...)` with NO partition key plans as a single-partition
 * window: every row of the frame moves to ONE task. The curated keys
 * route around that by calling RangeRank explicitly, but user SQL
 * through [[graft.SqlSurface]] still hit the ceiling. This file makes
 * the scale path fire on ANY query, lazily, with no pin barrier:
 *
 *  - [[RangeRankRewrite]] (a `Rule[LogicalPlan]`, late slot — after
 *    column pruning and filter pushdown have settled around the
 *    Window) swaps an eligible above-gate Window for
 *    [[GlobalRankPlan]].
 *  - [[GlobalRankStrategy]] plans it as [[GlobalRankExec]], whose
 *    `requiredChildDistribution = OrderedDistribution(order)` makes
 *    EnsureRequirements insert exactly ONE range exchange + local
 *    sort — the same physical shape RangeRank builds by hand.
 *  - [[GlobalRankExec]] then runs `RDD.zipWithIndex`'s own design:
 *    one bounded job collects per-partition (row, tie-run) counts
 *    (≤ numPartitions tuples on the driver), prefix-sums them, and a
 *    second pass emits global ranks as partition offset + local
 *    position. NO SinglePartition stage anywhere.
 *
 * Why no pin barrier, when the DataFrame-level RangeRank needs one:
 * both of the exec's jobs run over the SAME `child.execute()` RDD,
 * i.e. one ShuffleDependency — the range boundaries are sampled once
 * when the dependency materializes and shuffle files are reused, so
 * there is no second execution that could re-sample them, and the
 * reduce-side sort is deterministic under a lost-block recompute.
 * (The DataFrame path re-plans per action, so it must pin; the
 * physical node owns its RDD, so it need not.)
 *
 * Exactness: ranks computed this way are NOT approximations.
 * RangePartitioning maps each key to a partition deterministically,
 * so a tie-run never straddles a boundary — `rank`/`dense_rank`/
 * `percent_rank` are bit-identical to the single-partition window.
 * `row_number`/`ntile` agree whenever the order is total; under ties
 * they return A valid assignment, exactly as the single-partition
 * plan's tie order is itself arbitrary (it inherits shuffle order).
 *
 * Gated on the SAME conf key as the explicit operator
 * (`spark.graft.rangerank.minBytes`, registered with
 * [[graft.Materialize.registeredGateKeys]] so the AuditProbe sweep
 * forces it open): below the threshold the plain window is cheaper
 * and the plan is left alone.
 */
object RangeRankRewrite extends Rule[LogicalPlan] {

  import graft.operators.RangeRank.MinBytesKey

  private def aboveGate(child: LogicalPlan): Boolean = {
    graft.Materialize.registeredGateKeys.add(MinBytesKey)
    val minBytes = BigInt(scala.util.Try(
      conf.getConfString(MinBytesKey).toLong).getOrElse(32L * 1024 * 1024))
    child.stats.sizeInBytes >= minBytes
  }

  /** The supported rank family: (kind, ntile-k, output attribute).
    * Kinds are the [[GlobalRankExec]] evaluation tags. */
  private def asRank(orderSpec: Seq[SortOrder])(ne: NamedExpression): Option[GlobalRankFunction] =
    ne match {
      case a @ Alias(WindowExpression(f, WindowSpecDefinition(Seq(), os, _)), _)
          if os == orderSpec =>
        f match {
          case RowNumber() => Some(GlobalRankFunction("row_number", 0, a.toAttribute))
          case _: Rank => Some(GlobalRankFunction("rank", 0, a.toAttribute))
          case _: DenseRank => Some(GlobalRankFunction("dense_rank", 0, a.toAttribute))
          case _: PercentRank => Some(GlobalRankFunction("percent_rank", 0, a.toAttribute))
          case NTile(Literal(k: Int, IntegerType)) if k >= 1 =>
            Some(GlobalRankFunction("ntile", k, a.toAttribute))
          case _ => None
        }
      case _ => None
    }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case w @ Window(exprs, Seq(), orderSpec, child, _)
        if exprs.nonEmpty && orderSpec.nonEmpty && !w.isStreaming &&
          exprs.forall(asRank(orderSpec)(_).isDefined) && aboveGate(child) =>
      GlobalRankPlan(orderSpec, exprs.map(asRank(orderSpec)(_).get), child)
  }
}

/** One ranking output: `kind` ∈ row_number | rank | dense_rank |
  * percent_rank | ntile (with `k`); `attr` keeps the original window
  * alias's exprId so parent operators resolve unchanged. */
case class GlobalRankFunction(kind: String, k: Int, attr: Attribute)

/** Logical twin of [[GlobalRankExec]] — opaque to further rewrites by
  * design: it is created AFTER pruning/pushdown settled (late rule
  * slot), so nothing needs to traverse it. */
case class GlobalRankPlan(
    order: Seq[SortOrder],
    ranks: Seq[GlobalRankFunction],
    child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output ++ ranks.map(_.attr)
  override def producedAttributes: AttributeSet = AttributeSet(ranks.map(_.attr))
  override def maxRows: Option[Long] = child.maxRows
  override protected def withNewChildInternal(newChild: LogicalPlan): GlobalRankPlan =
    copy(child = newChild)
}

object GlobalRankStrategy extends org.apache.spark.sql.execution.SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case GlobalRankPlan(order, ranks, child) =>
      GlobalRankExec(order, ranks, planLater(child)) :: Nil
    case _ => Nil
  }
}

/**
 * Physical global ranking over a range-partitioned, locally-sorted
 * child (both REQUIRED below, both inserted by EnsureRequirements —
 * this node never shuffles or sorts itself):
 *
 *  - job 1 (bounded): per-partition row and tie-run counts —
 *    ≤ numPartitions tuples to the driver, prefix-summed there
 *    (`RDD.zipWithIndex`'s design; the shuffle's map side runs once
 *    and is REUSED by job 2, only the cheap local re-sort repeats).
 *  - job 2 (the output): per partition, global rank = offset + local
 *    position, ties detected with the generated SortOrder comparator
 *    (NOT UnsafeRow byte equality — -0.0/0.0 and NaN-bit ties must
 *    not split a run).
 *
 * Output types match Spark's window functions exactly (IntegerType
 * for the counts — including their documented wrap past 2^31 rows —
 * DoubleType for percent_rank).
 */
case class GlobalRankExec(
    order: Seq[SortOrder],
    ranks: Seq[GlobalRankFunction],
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output ++ ranks.map(_.attr)
  override def producedAttributes: AttributeSet = AttributeSet(ranks.map(_.attr))
  override lazy val metrics = Map(
    "numOutputRows" -> org.apache.spark.sql.execution.metric.SQLMetrics
      .createMetric(sparkContext, "number of output rows"))
  override def requiredChildDistribution: Seq[Distribution] =
    OrderedDistribution(order) :: Nil
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(order)
  override def outputOrdering: Seq[SortOrder] = order
  override def outputPartitioning: Partitioning = child.outputPartitioning
  override protected def withNewChildInternal(newChild: SparkPlan): GlobalRankExec =
    copy(child = newChild)

  private val needRuns = ranks.exists(r =>
    r.kind == "rank" || r.kind == "dense_rank" || r.kind == "percent_rank")

  /** Fresh attrs for the projected order keys, so the tie comparator
    * binds to the key row, not the full child row (no full-row copies
    * at run boundaries — only the key is retained). */
  private def keyAttrs: Seq[Attribute] = order.map(so =>
    AttributeReference("__grk", so.child.dataType, so.child.nullable)())

  protected override def doExecute(): RDD[InternalRow] = {
    val childRDD = child.execute()
    val orderExprs = order.map(_.child)
    val childOutput = child.output
    val ka = keyAttrs
    val keyOrder = order.zip(ka).map { case (so, a) => so.copy(child = a) }
    val trackRuns = needRuns

    // job 1: (rows, tieRuns) per physical partition
    val stats: Array[(Long, Long)] = childRDD
      .mapPartitionsWithIndex { (i, it) =>
        val keyProj = UnsafeProjection.create(orderExprs, childOutput)
        val cmp = RowOrdering.create(keyOrder, ka)
        var n = 0L; var runs = 0L
        var prev: UnsafeRow = null
        while (it.hasNext) {
          val k = keyProj(it.next())
          if (trackRuns && (prev == null || cmp.compare(prev, k) != 0)) {
            runs += 1; prev = k.copy()
          }
          n += 1
        }
        Iterator.single((i, (n, runs)))
      }
      .collect().sortBy(_._1).map(_._2)

    val rowOffsets = stats.scanLeft(0L)(_ + _._1)
    val runOffsets = stats.scanLeft(0L)(_ + _._2)
    val total = rowOffsets.last
    val kinds = ranks.map(r => (r.kind, r.k)).toArray

    // job 2: emit child row ++ rank columns (same shuffle, re-sorted)
    val numOutputRows = longMetric("numOutputRows")
    childRDD.mapPartitionsWithIndex { (i, it) =>
      val keyProj = UnsafeProjection.create(orderExprs, childOutput)
      val cmp = RowOrdering.create(keyOrder, ka)
      val rankRow = new GenericInternalRow(kinds.length)
      val joined = new JoinedRow
      val proj = UnsafeProjection.create(
        childOutput ++ ranks.map(_.attr), childOutput ++ ranks.map(_.attr))
      val rowOff = rowOffsets(i)
      val runOff = runOffsets(i)
      var localIdx = 0L; var runStart = 0L; var localRuns = 0L
      var prev: UnsafeRow = null
      it.map { row =>
        if (trackRuns) {
          val k = keyProj(row)
          if (prev == null || cmp.compare(prev, k) != 0) {
            runStart = localIdx; localRuns += 1; prev = k.copy()
          }
        }
        val rn = rowOff + localIdx + 1L
        var c = 0
        while (c < kinds.length) {
          kinds(c) match {
            case ("row_number", _) => rankRow.setInt(c, rn.toInt)
            case ("rank", _) => rankRow.setInt(c, (rowOff + runStart + 1L).toInt)
            case ("dense_rank", _) => rankRow.setInt(c, (runOff + localRuns).toInt)
            case ("percent_rank", _) => rankRow.update(c,
              if (total > 1L) (rowOff + runStart).toDouble / (total - 1L).toDouble
              else 0.0d)
            case ("ntile", k) =>
              // SQL-standard tiling (RangeRank.ntileFromRank's integer
              // arithmetic): first n%k tiles take one extra row
              val q = total / k; val r = total % k; val thr = r * (q + 1L)
              val tile = if (rn <= thr) (rn - 1L) / (q + 1L) + 1L
                         else r + (rn - thr - 1L) / q + 1L
              rankRow.setInt(c, tile.toInt)
            case (other, _) => throw new IllegalStateException(
              s"GlobalRankExec: unknown rank kind $other")
          }
          c += 1
        }
        localIdx += 1L
        numOutputRows += 1
        proj(joined(row, rankRow))
      }
    }
  }
}
