package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Average, Count, First, Last, Max, Min, Sum}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode, Window}
import org.apache.spark.sql.catalyst.plans.physical.{Distribution, OrderedDistribution, Partitioning}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * AUTOMATIC distributed global windows — the planner promotion of
 * [[graft.operators.RangeRank]] (VERDICT r13/r14 item 1), extended in
 * round 16 to global RUNNING AGGREGATES (VERDICT r15 item 1).
 *
 * `row_number()/rank()/dense_rank()/percent_rank()/ntile(k) OVER
 * (ORDER BY ...)` — and now `SUM/COUNT/AVG/MIN/MAX(x) OVER (ORDER BY
 * ... [ROWS|RANGE UNBOUNDED PRECEDING .. CURRENT ROW])`, the
 * cumulative-revenue shape every analyst writes — with NO partition
 * key plan as a single-partition window: every row of the frame moves
 * to ONE task. The curated keys route around that by calling RangeRank
 * explicitly, but user SQL through [[graft.SqlSurface]] still hit the
 * ceiling. This file makes the scale path fire on ANY query, lazily,
 * with no pin barrier:
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
 *    one bounded job collects per-partition (row, tie-run, aggregate
 *    total) states (≤ numPartitions tuples on the driver),
 *    prefix-combines them, and a second pass emits global ranks as
 *    partition offset + local position and running aggregates as
 *    prefix total + local running state. NO SinglePartition stage
 *    anywhere. All five aggregate kinds are prefix-combinable, so
 *    the rank family's two-job pattern extends verbatim.
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
 * `percent_rank` are bit-identical to the single-partition window,
 * and RANGE-framed running aggregates (the SQL default under ORDER
 * BY) see exactly their peer set: the whole tie run is absorbed
 * before any of its rows emit. `row_number`/`ntile`/ROWS-framed
 * aggregates agree whenever the order is total; under ties they
 * return A valid assignment, exactly as the single-partition plan's
 * tie order is itself arbitrary (it inherits shuffle order).
 * Floating-point running sums add partition prefix totals to local
 * sums, a different association order than the strictly sequential
 * single task — same ulp-level caveat as any partial aggregation,
 * and why this engine's oracle discipline rounds double sums.
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

  /** A running frame: UNBOUNDED PRECEDING .. CURRENT ROW (the resolved
    * default under ORDER BY is the RANGE form). */
  private def runningFrame(f: WindowFrame): Option[Boolean] = f match {
    case SpecifiedWindowFrame(RowFrame, UnboundedPreceding, CurrentRow) => Some(true)
    case SpecifiedWindowFrame(RangeFrame, UnboundedPreceding, CurrentRow) => Some(false)
    case _ => None
  }

  /** Aggregates with a prefix-combinable running accumulator. AVG over
    * DECIMAL (decimal result type) is excluded — its scale bookkeeping
    * belongs to Spark's own Average — as are interval types; MIN/MAX
    * accept any orderable ATOMIC type (array/struct orderings stay on
    * the plain window). */
  /** Leaf (non-nested) type — keeps the accumulator's retained-value
    * copy semantics trivial. */
  private def atomicLeaf(dt: DataType): Boolean =
    !dt.isInstanceOf[ArrayType] && !dt.isInstanceOf[StructType] &&
      !dt.isInstanceOf[MapType] && !dt.isInstanceOf[UserDefinedType[_]] &&
      dt != NullType

  /** Orderable leaf type — array/struct orderings stay on the plain
    * window. */
  private def atomicOrderable(dt: DataType): Boolean =
    RowOrdering.isOrderable(dt) && atomicLeaf(dt)

  private def asAgg(fn: aggregate.AggregateFunction, rowsFrame: Boolean,
      attr: Attribute): Option[GlobalRunningAgg] = fn match {
    // TRY mode (null-on-overflow) excluded — its overflow bookkeeping
    // belongs to Spark's own Sum; ANSI mode rides `exact` so a long
    // overflow throws here exactly as the plain window would
    case Sum(e, ctx) if (attr.dataType == LongType || attr.dataType == DoubleType) &&
        ctx.evalMode != EvalMode.TRY =>
      Some(GlobalRunningAgg("sum", e, rowsFrame, attr,
        exact = ctx.evalMode == EvalMode.ANSI))
    case Count(Seq(e)) =>
      Some(GlobalRunningAgg("count", e, rowsFrame, attr))
    case Average(e, _) if attr.dataType == DoubleType =>
      Some(GlobalRunningAgg("avg", e, rowsFrame, attr))
    case Min(e) if atomicOrderable(e.dataType) =>
      Some(GlobalRunningAgg("min", e, rowsFrame, attr))
    case Max(e) if atomicOrderable(e.dataType) =>
      Some(GlobalRunningAgg("max", e, rowsFrame, attr))
    // first_value/last_value resolve to the First/Last aggregates over
    // the running frame — both prefix-combinable (first: keep the
    // earliest state; last: the latest overrides). ignoreNulls rides
    // the accumulator. Non-nested types only (retained-value copy
    // discipline, same as min/max).
    case First(e, ignoreNulls) if atomicLeaf(e.dataType) =>
      Some(GlobalRunningAgg(if (ignoreNulls) "first_nn" else "first", e, rowsFrame, attr))
    case Last(e, ignoreNulls) if atomicLeaf(e.dataType) =>
      Some(GlobalRunningAgg(if (ignoreNulls) "last_nn" else "last", e, rowsFrame, attr))
    case _ => None
  }

  /** Offset functions: `lag(x, k, default)` / `lead(x, k, default)`
    * with literal offsets and foldable defaults. Normalized to a
    * signed SHIFT (positive = look behind, negative = ahead): the
    * exec carries at most `maxOffset` boundary rows per partition, so
    * huge offsets stay on the plain window. ignoreNulls needs
    * unbounded lookback — excluded. */
  private def asOffset(fn: Expression, attr: Attribute): Option[GlobalOffsetFunction] = {
    graft.Materialize.registeredGateKeys.add(GlobalRankExec.MaxOffsetKey)
    val maxOffset = scala.util.Try(
      conf.getConfString(GlobalRankExec.MaxOffsetKey).toInt).getOrElse(1024)
    // |shift| in LONG space: math.abs(Int.MinValue) is negative and
    // would bypass the cap (review r16 finding)
    def mk(e: Expression, shift: Int, default: Expression): Option[GlobalOffsetFunction] =
      if (math.abs(shift.toLong) > maxOffset || !atomicLeaf(e.dataType) ||
          !default.foldable ||
          !(default.dataType == e.dataType || default.dataType == NullType)) None
      else Some(GlobalOffsetFunction(e, shift, default.eval(), attr))
    fn match {
      case Lag(e, Literal(k: Int, IntegerType), default, false) => mk(e, k, default)
      case Lead(e, Literal(k: Int, IntegerType), default, false) =>
        if (k == Int.MinValue) None else mk(e, -k, default)
      case _ => None
    }
  }

  /** The supported window functions: the rank family (kinds are the
    * [[GlobalRankExec]] evaluation tags) and running aggregates over
    * UNBOUNDED PRECEDING .. CURRENT ROW frames. */
  private def asWinFunc(orderSpec: Seq[SortOrder])(ne: NamedExpression): Option[GlobalWinFunction] =
    ne match {
      case a @ Alias(WindowExpression(f, WindowSpecDefinition(Seq(), os, frame)), _)
          if os == orderSpec =>
        f match {
          case RowNumber() => Some(GlobalRankFunction("row_number", 0, a.toAttribute))
          case _: Rank => Some(GlobalRankFunction("rank", 0, a.toAttribute))
          case _: DenseRank => Some(GlobalRankFunction("dense_rank", 0, a.toAttribute))
          case _: PercentRank => Some(GlobalRankFunction("percent_rank", 0, a.toAttribute))
          case NTile(Literal(k: Int, IntegerType)) if k >= 1 =>
            Some(GlobalRankFunction("ntile", k, a.toAttribute))
          case CumeDist() => Some(GlobalRankFunction("cume_dist", 0, a.toAttribute))
          case AggregateExpression(fn, _, false, None, _) =>
            runningFrame(frame).flatMap(rows => asAgg(fn, rows, a.toAttribute))
          case o @ (_: Lag | _: Lead) => asOffset(o, a.toAttribute)
          case _ => None
        }
      case _ => None
    }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case w @ Window(exprs, Seq(), orderSpec, child, _)
        if exprs.nonEmpty && orderSpec.nonEmpty && !w.isStreaming &&
          exprs.forall(asWinFunc(orderSpec)(_).isDefined) && aboveGate(child) =>
      GlobalRankPlan(orderSpec, exprs.map(asWinFunc(orderSpec)(_).get), child)
  }
}

/** One global window output; `attr` keeps the original window alias's
  * exprId so parent operators resolve unchanged. */
sealed trait GlobalWinFunction { def attr: Attribute }

/** `kind` ∈ row_number | rank | dense_rank | percent_rank | ntile
  * (with `k`). */
case class GlobalRankFunction(kind: String, k: Int, attr: Attribute)
  extends GlobalWinFunction

/** `kind` ∈ sum | count | avg | min | max over `valueExpr`, running
  * frame; `rowsFrame` = ROWS (per-row) vs RANGE (peer rows share the
  * value — the resolved SQL default under ORDER BY); `exact` = ANSI
  * long-sum overflow throws instead of wrapping. */
case class GlobalRunningAgg(kind: String, valueExpr: Expression,
    rowsFrame: Boolean, attr: Attribute, exact: Boolean = false)
  extends GlobalWinFunction

/** `lag`/`lead` normalized to a signed `shift` over the global row
  * order: positive looks behind, negative ahead, zero is the row
  * itself; `default` is the pre-evaluated foldable fallback. The exec
  * carries `|shift|`-bounded boundary-row slices between partitions —
  * the only cross-partition state offset functions need. */
case class GlobalOffsetFunction(valueExpr: Expression, shift: Int,
    default: Any, attr: Attribute) extends GlobalWinFunction

/** Logical twin of [[GlobalRankExec]] — opaque to further rewrites by
  * design: it is created AFTER pruning/pushdown settled (late rule
  * slot), so nothing needs to traverse it. `references` is overridden
  * because aggregate value expressions live inside [[GlobalWinFunction]]
  * payloads, invisible to QueryPlan's product-based expression walk. */
case class GlobalRankPlan(
    order: Seq[SortOrder],
    funcs: Seq[GlobalWinFunction],
    child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output ++ funcs.map(_.attr)
  override def producedAttributes: AttributeSet = AttributeSet(funcs.map(_.attr))
  override def references: AttributeSet = AttributeSet(
    order.flatMap(_.references) ++
      funcs.collect {
        case a: GlobalRunningAgg => a.valueExpr
        case o: GlobalOffsetFunction => o.valueExpr
      }.flatMap(_.references))
  override def maxRows: Option[Long] = child.maxRows
  override protected def withNewChildInternal(newChild: LogicalPlan): GlobalRankPlan =
    copy(child = newChild)
}

object GlobalRankStrategy extends org.apache.spark.sql.execution.SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[org.apache.spark.sql.execution.SparkPlan] = plan match {
    case GlobalRankPlan(order, funcs, child) =>
      GlobalRankExec(order, funcs, planLater(child)) :: Nil
    case _ => Nil
  }
}

/** Prefix-combinable running-aggregate state: built per partition in
  * job 1, prefix-merged on the driver (all five kinds are commutative
  * monoids), then replayed per row in job 2. Values arrive boxed from
  * `InternalRow.get` (UTF8String retained values are copied — the
  * projection reuses its buffer). */
private[plans] sealed trait RunningAcc extends Serializable {
  def add(v: Any): Unit
  def merge(o: RunningAcc): Unit
  def value: Any
}

/** Long running sum in 128-bit space (low word + overflow carry), so
  * every intermediate state is exact regardless of combine order. A
  * per-PARTITION subtotal may overflow while the true running prefix
  * never does (negative values elsewhere cancel it — review r16
  * finding), so overflow is decided only where the plain window would
  * decide it: at `value()`, per emitted row. `exact` (ANSI) throws
  * there; legacy mode returns the wrapped low word, which is exactly
  * Java's wrap of the true sum. */
private[plans] final class SumLongAcc(exact: Boolean) extends RunningAcc {
  var s = 0L; var carry = 0L; var seen = false
  private def addRaw(x: Long): Unit = {
    val r = s + x
    if (((s ^ r) & (x ^ r)) < 0L) carry += (if (x > 0L) 1L else -1L)
    s = r
  }
  def add(v: Any): Unit = if (v != null) {
    addRaw(v.asInstanceOf[Number].longValue()); seen = true
  }
  def merge(o: RunningAcc): Unit = {
    val t = o.asInstanceOf[SumLongAcc]
    if (t.seen) { addRaw(t.s); carry += t.carry; seen = true }
  }
  def value: Any =
    if (!seen) null
    else if (carry != 0L && exact) throw new ArithmeticException(
      "long overflow in running SUM (ANSI mode)")
    else java.lang.Long.valueOf(s)
}

private[plans] final class SumDoubleAcc extends RunningAcc {
  var s = 0.0d; var seen = false
  def add(v: Any): Unit = if (v != null) { s += v.asInstanceOf[Number].doubleValue(); seen = true }
  def merge(o: RunningAcc): Unit = { val t = o.asInstanceOf[SumDoubleAcc]; if (t.seen) { s += t.s; seen = true } }
  def value: Any = if (seen) java.lang.Double.valueOf(s) else null
}

private[plans] final class CountAcc extends RunningAcc {
  var n = 0L
  def add(v: Any): Unit = if (v != null) n += 1L
  def merge(o: RunningAcc): Unit = n += o.asInstanceOf[CountAcc].n
  def value: Any = java.lang.Long.valueOf(n)
}

private[plans] final class AvgAcc extends RunningAcc {
  var s = 0.0d; var n = 0L
  def add(v: Any): Unit = if (v != null) { s += v.asInstanceOf[Number].doubleValue(); n += 1L }
  def merge(o: RunningAcc): Unit = { val t = o.asInstanceOf[AvgAcc]; s += t.s; n += t.n }
  def value: Any = if (n == 0L) null else java.lang.Double.valueOf(s / n)
}

private[plans] final class MinMaxAcc(dt: DataType, isMin: Boolean) extends RunningAcc {
  var v: Any = null
  @transient private lazy val ord = TypeUtils.getInterpretedOrdering(dt)
  private def retain(x: Any): Any = x match {
    case u: UTF8String => u.copy()
    case other => other
  }
  def add(x: Any): Unit = if (x != null) {
    if (v == null) v = retain(x)
    else {
      val c = ord.compare(x, v)
      if (if (isMin) c < 0 else c > 0) v = retain(x)
    }
  }
  def merge(o: RunningAcc): Unit = {
    val t = o.asInstanceOf[MinMaxAcc]
    if (t.v != null) add(t.v)
  }
  def value: Any = v
}

/** first_value/last_value state. `merge(o)` treats `o`'s rows as
  * coming AFTER this state's rows — the sequential-combine contract
  * every accumulator here satisfies (the others are commutative, so
  * only this one cares). */
private[plans] final class FirstLastAcc(isFirst: Boolean, ignoreNulls: Boolean)
  extends RunningAcc {
  var v: Any = null; var seen = false
  private def retain(x: Any): Any = x match {
    case u: UTF8String => u.copy()
    case other => other
  }
  def add(x: Any): Unit = {
    if (ignoreNulls && x == null) return
    if (!isFirst || !seen) { v = retain(x); seen = true }
  }
  def merge(o: RunningAcc): Unit = {
    val t = o.asInstanceOf[FirstLastAcc]
    if (t.seen && (!isFirst || !seen)) { v = t.v; seen = true }
  }
  def value: Any = v
}

/** Per-partition job-1 state: row/tie-run counts, aggregate totals,
  * and the boundary slices offset functions need — the last `maxLag`
  * and first `maxLead` projected value rows. */
private[plans] case class GlobalRankPartStat(
    rows: Long, runs: Long, accs: Array[RunningAcc],
    tail: Array[InternalRow], head: Array[InternalRow])

object GlobalRankExec {
  /** Observability for the low-cardinality ORDER BY degrade warning
    * (VERDICT r15 item 2): total warnings logged by this JVM. */
  val degradeWarnCount = new java.util.concurrent.atomic.AtomicLong(0L)

  /** Degrade detection fires only above this many input rows — below
    * it a handful of tasks is the right plan anyway. */
  val DegradeMinRowsKey = "spark.graft.globalrank.degradeMinRows"

  /** Largest |lag/lead offset| the rewrite accepts: the exec ships
    * up to this many boundary rows per partition to the driver. */
  val MaxOffsetKey = "spark.graft.globalrank.maxOffset"

  /** RANGE-path tie runs at or above this many rows log a task-side
    * warning and bump the `bigTieRuns` SQLMetric: a single hot peer
    * run is invisible to the driver-side degrade warning (which sees
    * only distinct-key counts), but it is the same scale cliff — the
    * run must be buffered whole. */
  val BigRunWarnRowsKey = "spark.graft.globalrank.bigRunWarnRows"

  /** JVM-local spec observability for the big-run warning (local mode
    * only — in cluster mode the SQLMetric and executor logs are the
    * real channel, exactly like degradeWarnCount's driver-side
    * counterpart). */
  val bigRunWarnCount = new java.util.concurrent.atomic.AtomicLong(0L)
}

/**
 * Physical global ranking / running aggregation over a
 * range-partitioned, locally-sorted child (both REQUIRED below, both
 * inserted by EnsureRequirements — this node never shuffles or sorts
 * itself):
 *
 *  - job 1 (bounded): per-partition row counts, tie-run counts, and
 *    running-aggregate totals — ≤ numPartitions small states to the
 *    driver, prefix-combined there (`RDD.zipWithIndex`'s design; the
 *    shuffle's map side runs once and is REUSED by job 2, only the
 *    cheap local re-sort repeats).
 *  - job 2 (the output): per partition, global rank = offset + local
 *    position, running aggregate = prefix total then local adds, ties
 *    detected with the generated SortOrder comparator (NOT UnsafeRow
 *    byte equality — -0.0/0.0 and NaN-bit ties must not split a run).
 *    When any RANGE-framed aggregate is present the partition streams
 *    run-by-run (one tie run buffered at a time — the peer rows must
 *    all be absorbed before any of them emits; memory is bounded by
 *    the largest tie run, the same bound Spark's own WindowExec has
 *    for RANGE frames); otherwise it streams row-by-row with no
 *    buffering at all.
 *
 * Output types match Spark's window functions exactly (IntegerType
 * for the rank counts — including their documented wrap past 2^31
 * rows — DoubleType for percent_rank, Long/Double for sum by input
 * class, Long for count, Double for avg, input type for min/max).
 *
 * Degrade visibility (VERDICT r15 item 2): exactness requires tie
 * runs not to straddle range boundaries, so an ORDER BY with K
 * distinct values runs at most K tasks regardless of the target
 * partition count. Job 1 knows K exactly when runs are tracked
 * (Σ per-partition runs — equal keys never straddle partitions), and
 * the count of non-empty partitions bounds it otherwise; above
 * `spark.graft.globalrank.degradeMinRows` input rows (default 1M) a
 * degenerate exchange logs a warning naming the composite-key remedy.
 */
case class GlobalRankExec(
    order: Seq[SortOrder],
    funcs: Seq[GlobalWinFunction],
    child: org.apache.spark.sql.execution.SparkPlan)
  extends org.apache.spark.sql.execution.UnaryExecNode {

  override def output: Seq[Attribute] = child.output ++ funcs.map(_.attr)
  override def producedAttributes: AttributeSet = AttributeSet(funcs.map(_.attr))
  override lazy val metrics = Map(
    "numOutputRows" -> org.apache.spark.sql.execution.metric.SQLMetrics
      .createMetric(sparkContext, "number of output rows"),
    "bigTieRuns" -> org.apache.spark.sql.execution.metric.SQLMetrics
      .createMetric(sparkContext, "tie runs over the buffer warn threshold"))
  override def requiredChildDistribution: Seq[Distribution] =
    OrderedDistribution(order) :: Nil
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(order)
  override def outputOrdering: Seq[SortOrder] = order
  override def outputPartitioning: Partitioning = child.outputPartitioning
  override protected def withNewChildInternal(
      newChild: org.apache.spark.sql.execution.SparkPlan): GlobalRankExec =
    copy(child = newChild)

  private val rankFuncs = funcs.collect { case r: GlobalRankFunction => r }
  private val aggFuncs = funcs.collect { case a: GlobalRunningAgg => a }

  /** Tie-run boundaries are needed by the tie-aware ranks AND by any
    * RANGE-framed running aggregate (peer rows share its value). */
  private val needRuns = rankFuncs.exists(r =>
    r.kind == "rank" || r.kind == "dense_rank" || r.kind == "percent_rank" ||
      r.kind == "cume_dist") ||
    aggFuncs.exists(!_.rowsFrame)

  /** cume_dist needs the CURRENT run's length before any of its rows
    * emit (numerator = position of the run's LAST peer), so it forces
    * the run-buffered path even without RANGE aggregates. */
  private val anyRangeAgg = aggFuncs.exists(!_.rowsFrame) ||
    rankFuncs.exists(_.kind == "cume_dist")

  /** Fresh attrs for the projected order keys, so the tie comparator
    * binds to the key row, not the full child row (no full-row copies
    * at run boundaries — only the key is retained). */
  private def keyAttrs: Seq[Attribute] = order.map(so =>
    AttributeReference("__grk", so.child.dataType, so.child.nullable)())

  private def newAcc(a: GlobalRunningAgg): RunningAcc = a.kind match {
    case "sum" if a.attr.dataType == LongType => new SumLongAcc(a.exact)
    case "sum" => new SumDoubleAcc
    case "count" => new CountAcc
    case "avg" => new AvgAcc
    case "min" => new MinMaxAcc(a.valueExpr.dataType, isMin = true)
    case "max" => new MinMaxAcc(a.valueExpr.dataType, isMin = false)
    case "first" => new FirstLastAcc(isFirst = true, ignoreNulls = false)
    case "first_nn" => new FirstLastAcc(isFirst = true, ignoreNulls = true)
    case "last" => new FirstLastAcc(isFirst = false, ignoreNulls = false)
    case "last_nn" => new FirstLastAcc(isFirst = false, ignoreNulls = true)
    case other => throw new IllegalStateException(
      s"GlobalRankExec: unknown running aggregate $other")
  }

  protected override def doExecute(): RDD[InternalRow] = {
    val childRDD = child.execute()
    val orderExprs = order.map(_.child)
    val childOutput = child.output
    val ka = keyAttrs
    val keyOrder = order.zip(ka).map { case (so, a) => so.copy(child = a) }
    val trackRuns = needRuns
    val aggs = aggFuncs.toArray
    val aggExprs = aggs.map(_.valueExpr).toSeq
    val aggDts = aggs.map(_.valueExpr.dataType)
    val mkAccs: () => Array[RunningAcc] = { val fs = aggs; () => fs.map(newAcc) }
    val offs = funcs.collect { case o: GlobalOffsetFunction => o }.toArray
    val offExprs = offs.map(_.valueExpr).toSeq
    val offDts = offs.map(_.valueExpr.dataType)
    val maxLag = if (offs.isEmpty) 0 else math.max(0, offs.map(_.shift).max)
    val maxLead = if (offs.isEmpty) 0 else math.max(0, offs.map(-_.shift).max)

    // job 1: per-partition row/run counts, aggregate totals, and the
    // lag/lead boundary slices (≤ maxLag + maxLead projected value
    // rows per partition — the ONLY cross-partition state offset
    // functions need)
    val stats: Array[GlobalRankPartStat] = childRDD
      .mapPartitionsWithIndex { (i, it) =>
        val keyProj = UnsafeProjection.create(orderExprs, childOutput)
        val cmp = RowOrdering.create(keyOrder, ka)
        val aggProj = if (aggs.isEmpty) null else UnsafeProjection.create(aggExprs, childOutput)
        val offProj = if (offs.isEmpty) null else UnsafeProjection.create(offExprs, childOutput)
        val accs = mkAccs()
        val headBuf = scala.collection.mutable.ArrayBuffer.empty[InternalRow]
        val tailDq = new java.util.ArrayDeque[InternalRow]()
        var n = 0L; var runs = 0L
        var prev: UnsafeRow = null
        while (it.hasNext) {
          val row = it.next()
          if (trackRuns) {
            val k = keyProj(row)
            if (prev == null || cmp.compare(prev, k) != 0) {
              runs += 1; prev = k.copy()
            }
          }
          if (accs.nonEmpty) {
            val ar = aggProj(row)
            var j = 0
            while (j < accs.length) {
              accs(j).add(if (ar.isNullAt(j)) null else ar.get(j, aggDts(j)))
              j += 1
            }
          }
          if (maxLag > 0 || maxLead > 0) {
            val pr = offProj(row).copy()
            if (maxLead > 0 && headBuf.length < maxLead) headBuf += pr
            if (maxLag > 0) {
              if (tailDq.size == maxLag) tailDq.removeFirst()
              tailDq.addLast(pr)
            }
          }
          n += 1L
        }
        Iterator.single((i, GlobalRankPartStat(n, runs, accs,
          tailDq.toArray(new Array[InternalRow](tailDq.size)), headBuf.toArray)))
      }
      .collect().sortBy(_._1).map(_._2)

    val rowOffsets = stats.scanLeft(0L)(_ + _.rows)
    val runOffsets = stats.scanLeft(0L)(_ + _.runs)
    val total = rowOffsets.last
    // prefix aggregate states: prefixAccs(i) = combined totals of
    // partitions 0..i-1 (≤ numPartitions × |aggs| small objects)
    val prefixAccs: Array[Array[RunningAcc]] = {
      val out = new Array[Array[RunningAcc]](stats.length + 1)
      out(0) = mkAccs()
      var i = 0
      while (i < stats.length) {
        val next = mkAccs()
        var j = 0
        while (j < next.length) {
          next(j).merge(out(i)(j)); next(j).merge(stats(i).accs(j)); j += 1
        }
        out(i + 1) = next
        i += 1
      }
      out
    }
    // lag seeds: the last maxLag value rows BEFORE partition i (a
    // short partition contributes its whole tail, so concatenating
    // tails in order and keeping the last maxLag is exact); lead
    // seeds: the first maxLead value rows AFTER partition i
    val prefixTails: Array[Array[InternalRow]] = {
      val out = new Array[Array[InternalRow]](stats.length)
      val dq = new java.util.ArrayDeque[InternalRow]()
      var i = 0
      while (i < stats.length) {
        out(i) = dq.toArray(new Array[InternalRow](dq.size))
        stats(i).tail.foreach { r =>
          if (maxLag > 0) {
            if (dq.size == maxLag) dq.removeFirst()
            dq.addLast(r)
          }
        }
        i += 1
      }
      out
    }
    val suffixHeads: Array[Array[InternalRow]] = {
      val out = new Array[Array[InternalRow]](stats.length)
      var acc = Vector.empty[InternalRow]
      var i = stats.length - 1
      while (i >= 0) {
        out(i) = acc.toArray
        acc = (stats(i).head.toVector ++ acc).take(maxLead)
        i -= 1
      }
      out
    }
    // BROADCAST the per-partition state (O(P × (|aggs| + maxLag +
    // maxLead)) objects): in the task closure it would serialize into
    // EVERY task — O(P²) aggregate shipping at cluster scale (review
    // r16 finding). Tasks only read it, never mutate.
    val bcState = sparkContext.broadcast((prefixAccs, prefixTails, suffixHeads))

    // degrade visibility: K distinct order keys < target partitions
    // means the range exchange degenerated to ≤K tasks on the whole
    // frame — correct, but a silent scale cliff without this warning
    // the baseline is the INTENDED parallelism, not stats.length: the
    // range partitioner itself collapses to ≤K partitions when the
    // sampled key has K distinct values, so the degenerate exchange
    // looks "full" by actual partition count
    val degradeMinRows = scala.util.Try(conf.getConfString(
      GlobalRankExec.DegradeMinRowsKey).toLong).getOrElse(1L << 20)
    val targetParts = scala.util.Try(
      conf.getConfString("spark.sql.shuffle.partitions").toInt).getOrElse(200)
    if (total >= degradeMinRows && targetParts > 1) {
      val nonEmpty = stats.count(_.rows > 0L)
      val distinct = if (trackRuns) runOffsets.last else -1L
      val degenerate =
        (trackRuns && distinct < targetParts) ||
          (!trackRuns && nonEmpty <= targetParts / 2 && targetParts >= 4)
      if (degenerate) {
        GlobalRankExec.degradeWarnCount.incrementAndGet()
        logWarning(s"GlobalRankExec: ORDER BY ${order.map(_.sql).mkString(", ")} has " +
          (if (distinct >= 0) s"only $distinct distinct values" else s"only $nonEmpty non-empty partitions") +
          s" over $total rows — the range exchange degenerated to ≤" +
          s"${if (distinct >= 0) distinct else nonEmpty} tasks of the $targetParts intended " +
          "(exactness requires tie runs not to straddle range boundaries). " +
          "Remedy: append a high-cardinality tiebreaker column to ORDER BY.")
      }
    }

    // output slots follow the ORIGINAL window-expression order: slot c
    // is a rank kind, an index into the accumulator arrays, or an
    // index into the offset-function array
    val slotRank: Array[(String, Int)] = funcs.map {
      case r: GlobalRankFunction => (r.kind, r.k)
      case _ => null
    }.toArray
    val slotAgg: Array[Int] = {
      var j = -1
      funcs.map {
        case _: GlobalRunningAgg => j += 1; j
        case _ => -1
      }.toArray
    }
    val offSlots: Array[Int] = funcs.zipWithIndex.collect {
      case (_: GlobalOffsetFunction, c) => c
    }.toArray
    val nSlots = funcs.length
    val rowsFrames = aggs.map(_.rowsFrame)
    val bufferRuns = anyRangeAgg
    val delayLeads = maxLead > 0

    // job 2: emit child row ++ window columns (same shuffle, re-sorted)
    val numOutputRows = longMetric("numOutputRows")
    val bigTieRuns = longMetric("bigTieRuns")
    val bigRunWarnRows = scala.util.Try(conf.getConfString(
      GlobalRankExec.BigRunWarnRowsKey).toLong).getOrElse(4L << 20)
    childRDD.mapPartitionsWithIndex { (i, it) =>
      val keyProj = UnsafeProjection.create(orderExprs, childOutput)
      val cmp = RowOrdering.create(keyOrder, ka)
      val aggProj = if (aggs.isEmpty) null else UnsafeProjection.create(aggExprs, childOutput)
      val funcRow = new GenericInternalRow(nSlots)
      val joined = new JoinedRow
      val proj = UnsafeProjection.create(
        childOutput ++ funcs.map(_.attr), childOutput ++ funcs.map(_.attr))
      val rowOff = rowOffsets(i)
      val runOff = runOffsets(i)
      val (prefixAccsB, prefixTailsB, suffixHeadsB) = bcState.value
      // start from a FRESH state merged with the prefix: tasks must
      // never mutate the broadcast prefix objects (attempt re-runs)
      val rowsAccs = mkAccs()
      val rangeAccs = mkAccs()
      var j = 0
      while (j < aggs.length) {
        rowsAccs(j).merge(prefixAccsB(i)(j)); rangeAccs(j).merge(prefixAccsB(i)(j)); j += 1
      }
      var localIdx = 0L; var runStart = 0L; var localRuns = 0L
      var runLen = 0L // current tie run's length (run-buffered path only)

      def extract(ar: InternalRow, j: Int): Any =
        if (ar.isNullAt(j)) null else ar.get(j, aggDts(j))

      // lag machinery: a ring of the last maxLag projected value rows,
      // seeded with the cross-partition prefix slice; s = 0 reads the
      // current row; s < 0 (lead) slots are filled by the delay
      // wrapper below
      val offProj = if (offs.isEmpty) null else UnsafeProjection.create(offExprs, childOutput)
      val lagCap = math.max(maxLag, 1)
      val lagRing = new Array[InternalRow](lagCap)
      var lagPushed = 0L
      prefixTailsB(i).foreach { r =>
        lagRing((lagPushed % lagCap).toInt) = r; lagPushed += 1
      }
      def extractOff(pr: InternalRow, oi: Int): Any =
        if (pr.isNullAt(oi)) null else pr.get(oi, offDts(oi))
      // s == 0 reads the LIVE projection buffer, which the next row's
      // fillOffsets overwrites — unsafe once the lead-delay wrapper
      // holds the value past this row (review r16 finding). Ring/seed
      // reads are safe: those rows are retained copies.
      def retainOff(v: Any): Any = v match {
        case u: UTF8String => u.copy()
        case other => other
      }
      def fillOffsets(row: InternalRow): Unit = if (offs.nonEmpty) {
        val pr = offProj(row)
        var oi = 0
        while (oi < offs.length) {
          val s = offs(oi).shift
          val c = offSlots(oi)
          if (s > 0) funcRow.update(c,
            if (lagPushed >= s) extractOff(lagRing(((lagPushed - s) % lagCap).toInt), oi)
            else offs(oi).default)
          else if (s == 0) funcRow.update(c,
            if (delayLeads) retainOff(extractOff(pr, oi)) else extractOff(pr, oi))
          else funcRow.update(c, null)
          oi += 1
        }
        if (maxLag > 0) {
          lagRing((lagPushed % lagCap).toInt) = pr.copy(); lagPushed += 1
        }
      }

      def setFuncCols(rn: Long): Unit = {
        var c = 0
        while (c < nSlots) {
          val a = slotAgg(c)
          if (a >= 0) {
            funcRow.update(c,
              if (rowsFrames(a)) rowsAccs(a).value else rangeAccs(a).value)
          } else if (slotRank(c) == null) {
            // offset slot: written by fillOffsets / the delay wrapper
          } else slotRank(c) match {
            case ("row_number", _) => funcRow.setInt(c, rn.toInt)
            case ("rank", _) => funcRow.setInt(c, (rowOff + runStart + 1L).toInt)
            case ("dense_rank", _) => funcRow.setInt(c, (runOff + localRuns).toInt)
            case ("percent_rank", _) => funcRow.update(c,
              if (total > 1L) (rowOff + runStart).toDouble / (total - 1L).toDouble
              else 0.0d)
            case ("cume_dist", _) => funcRow.update(c,
              (rowOff + runStart + runLen).toDouble / total.toDouble)
            case ("ntile", k) =>
              // SQL-standard tiling (RangeRank.ntileFromRank's integer
              // arithmetic): first n%k tiles take one extra row
              val q = total / k; val r = total % k; val thr = r * (q + 1L)
              val tile = if (rn <= thr) (rn - 1L) / (q + 1L) + 1L
                         else r + (rn - thr - 1L) / q + 1L
              funcRow.setInt(c, tile.toInt)
            case (other, _) => throw new IllegalStateException(
              s"GlobalRankExec: unknown rank kind $other")
          }
          c += 1
        }
      }

      // both paths produce (childRow, funcRow) in row order; with
      // leads present they must be COPIES (the delay wrapper holds
      // maxLead of them), otherwise the reused objects flow straight
      // into the final projection
      def emitPair(row: InternalRow): (InternalRow, GenericInternalRow) =
        if (delayLeads) (row.copy(), funcRow.copy().asInstanceOf[GenericInternalRow])
        else (row, funcRow)

      val pairs: Iterator[(InternalRow, GenericInternalRow)] = if (!bufferRuns) {
        // streaming path: no per-row copies beyond the retained key
        var prev: UnsafeRow = null
        it.map { row =>
          if (trackRuns) {
            val k = keyProj(row)
            if (prev == null || cmp.compare(prev, k) != 0) {
              runStart = localIdx; localRuns += 1; prev = k.copy()
            }
          }
          if (aggs.nonEmpty) {
            val ar = aggProj(row)
            var a = 0
            while (a < aggs.length) { rowsAccs(a).add(extract(ar, a)); a += 1 }
          }
          val rn = rowOff + localIdx + 1L
          setFuncCols(rn)
          fillOffsets(row)
          localIdx += 1L
          emitPair(row)
        }
      } else {
        // run-buffered path: RANGE-framed aggregates must absorb the
        // whole tie run before any of its rows emit — buffer one run
        // of row copies at a time (bounded by the largest tie run)
        new Iterator[(InternalRow, GenericInternalRow)] {
          private val buf = scala.collection.mutable.ArrayBuffer.empty[InternalRow]
          private var pos = 0
          private var pendingRow: InternalRow = null
          private var pendingKey: UnsafeRow = null

          private def fillRun(): Unit = {
            buf.clear(); pos = 0
            if (pendingRow == null && !it.hasNext) return
            if (pendingRow == null) {
              val r = it.next()
              pendingKey = keyProj(r).copy()
              pendingRow = r.copy()
            }
            val runKey = pendingKey
            buf += pendingRow
            pendingRow = null; pendingKey = null
            var open = true
            while (open && it.hasNext) {
              val r = it.next()
              val k = keyProj(r)
              if (cmp.compare(runKey, k) == 0) buf += r.copy()
              else {
                pendingKey = k.copy(); pendingRow = r.copy(); open = false
              }
            }
            // run boundary: absorb the run into the RANGE accs, update
            // the rank run trackers
            runStart = localIdx; localRuns += 1; runLen = buf.length
            if (buf.length >= bigRunWarnRows) {
              bigTieRuns += 1
              GlobalRankExec.bigRunWarnCount.incrementAndGet()
              org.slf4j.LoggerFactory.getLogger(classOf[GlobalRankExec]).warn(
                s"GlobalRankExec: buffered a tie run of ${buf.length} rows " +
                  "(RANGE-frame peers must be absorbed whole). A hot peer run " +
                  "is the per-key twin of the low-cardinality degrade — " +
                  "consider a finer ORDER BY key.")
            }
            if (aggs.nonEmpty) {
              var b = 0
              while (b < buf.length) {
                val ar = aggProj(buf(b))
                var a = 0
                while (a < aggs.length) {
                  if (!rowsFrames(a)) rangeAccs(a).add(extract(ar, a))
                  a += 1
                }
                b += 1
              }
            }
          }

          override def hasNext: Boolean = {
            if (pos >= buf.length) fillRun()
            pos < buf.length
          }

          override def next(): (InternalRow, GenericInternalRow) = {
            if (!hasNext) throw new NoSuchElementException
            val row = buf(pos)
            if (aggs.nonEmpty) {
              val ar = aggProj(row)
              var a = 0
              while (a < aggs.length) {
                if (rowsFrames(a)) rowsAccs(a).add(extract(ar, a))
                a += 1
              }
            }
            val rn = rowOff + localIdx + 1L
            setFuncCols(rn)
            fillOffsets(row)
            localIdx += 1L
            pos += 1
            emitPair(row)
          }
        }
      }

      if (!delayLeads) {
        pairs.map { case (r, fr) =>
          numOutputRows += 1
          proj(joined(r, fr))
        }
      } else {
        // lead delay: hold maxLead pending rows; a pending row's
        // lead values come from the rows pulled after it (all still
        // in the ring — emission happens exactly maxLead pulls
        // later), or from the cross-partition suffix slice at drain
        new Iterator[InternalRow] {
          private val cap = maxLead + 1
          private val pRows = new Array[InternalRow](cap)
          private val pFrs = new Array[GenericInternalRow](cap)
          private val pPrs = new Array[InternalRow](cap)
          private var readPos = 0L
          private var emitPos = 0L
          private val suffix = suffixHeadsB(i)
          private val leadIdx = offs.indices.filter(offs(_).shift < 0).toArray

          private def pull(): Unit = {
            val (r, fr) = pairs.next()
            val s = (readPos % cap).toInt
            pRows(s) = r; pFrs(s) = fr; pPrs(s) = offProj(r).copy()
            readPos += 1
          }

          override def hasNext: Boolean = emitPos < readPos || pairs.hasNext

          override def next(): InternalRow = {
            while (pairs.hasNext && readPos - emitPos <= maxLead) pull()
            if (emitPos >= readPos) throw new NoSuchElementException
            val t = emitPos
            val s = (t % cap).toInt
            val fr = pFrs(s)
            var li = 0
            while (li < leadIdx.length) {
              val oi = leadIdx(li)
              val tpos = t - offs(oi).shift // shift < 0: position ahead
              val v =
                if (tpos < readPos) extractOff(pPrs((tpos % cap).toInt), oi)
                else {
                  val sIdx = tpos - readPos // input exhausted: readPos == n
                  if (sIdx < suffix.length) extractOff(suffix(sIdx.toInt), oi)
                  else offs(oi).default
                }
              fr.update(offSlots(oi), v)
              li += 1
            }
            emitPos += 1
            numOutputRows += 1
            proj(joined(pRows(s), fr))
          }
        }
      }
    }
  }
}
