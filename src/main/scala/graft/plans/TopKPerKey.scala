package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Descending, Expression, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.graft.PlanBridge

/** Bounded top-k-per-key — a whole-operator extension (SURVEY §2.6's
  * rank-filter shape done heap-first): keep the k first rows per key
  * group under `order`.
  *
  * Why a custom operator: for `row_number() OVER (PARTITION BY key
  * ORDER BY o) <= k`, Spark 3.5+ does prune with WindowGroupLimit
  * (partial before the exchange, final after) — but both group-limit
  * passes sit on top of a FULL Sort of every partition's rows, and
  * the Window node still evaluates above them. This operator replaces
  * sort-then-scan with bounded per-key heaps: O(n log k) comparisons,
  * O(keys·k) memory, no sort buffers to spill, and only k rows per
  * key per map task reach the exchange. At 100 TB with hot keys the
  * difference is sorting (and spilling) a key's billion rows per
  * partition versus maintaining a k-element heap.
  *
  * Wiring: logical node → planner strategy (injected per-session via
  * `experimental.extraStrategies`, idempotent) → partial/final
  * physical pair; EnsureRequirements inserts the hash exchange
  * because the final exec declares ClusteredDistribution on the keys.
  */
case class TopKPerKey(keys: Seq[Expression], order: Seq[SortOrder], k: Int,
    child: LogicalPlan) extends UnaryNode {
  require(k > 0, "topKPerKey: k must be positive")
  override def output: Seq[Attribute] = child.output
  override def maxRows: Option[Long] = child.maxRows
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerKey =
    copy(child = newChild)
}

object TopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKey(keys, order, k, child) =>
      val partial = TopKPerKeyExec(keys, order, k, planLater(child), partial = true)
      TopKPerKeyExec(keys, order, k, partial, partial = false) :: Nil
    case _ => Nil
  }
}

case class TopKPerKeyExec(keys: Seq[Expression], order: Seq[SortOrder], k: Int,
    child: SparkPlan, partial: Boolean) extends UnaryExecNode {
  override def output: Seq[Attribute] = child.output
  override def outputPartitioning: Partitioning = child.outputPartitioning
  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) UnspecifiedDistribution :: Nil
    else ClusteredDistribution(keys) :: Nil
  override def nodeName: String =
    if (partial) "TopKPerKeyPartial" else "TopKPerKeyFinal"

  override protected def doExecute(): RDD[InternalRow] = {
    val kLocal = k
    val keyExprs = keys
    val sortOrder = order
    val childOutput = child.output
    val isPartial = partial
    // bounded-state guard for the PARTIAL pass (r12): one heap per
    // distinct key means a high-cardinality key set approaches
    // partition cardinality — the hazard Spark's own hash aggregate
    // answers with spilling. Partial top-k is a semigroup, so instead
    // of spilling we FLUSH: emit every current heap downstream (the
    // exchange serializes them out) and start fresh. A hot key spanning
    // flushes emits ≤ k rows per flush — the final pass re-merges to
    // exactly k. The FINAL pass never flushes (it must hold each key's
    // complete heap to honor the k bound) — its state is keys·k rows,
    // the same order as any final hash aggregate; the knob there is
    // shuffle partition count, as usual.
    val flushKeys = math.max(1, conf.getConfString(
      "spark.graft.topk.partialFlushKeys", "262144").toInt)
    child.execute().mapPartitions { iter =>
      val keyProj = UnsafeProjection.create(keyExprs, childOutput)
      // children are UnsafeRow-backed in practice, but the execute()
      // contract only promises InternalRow (e.g. RDD-backed scans) —
      // convert the stragglers instead of ClassCastException-ing
      val toUnsafe = UnsafeProjection.create(
        childOutput.map(_.asInstanceOf[Expression]), childOutput)
      val ord = PlanBridge.rowOrdering(sortOrder, childOutput)
      // per-key MAX-heap on the sort order: the root is the worst
      // retained row, evicted when a better one arrives — memory is
      // O(keys-in-partition · k), never the group cardinality
      val revCmp = new java.util.Comparator[UnsafeRow] {
        override def compare(a: UnsafeRow, b: UnsafeRow): Int =
          -ord.compare(a, b)
      }
      import scala.jdk.CollectionConverters._
      new Iterator[InternalRow] {
        private var heaps =
          new java.util.HashMap[UnsafeRow, java.util.PriorityQueue[UnsafeRow]]()
        private var drain: Iterator[InternalRow] = Iterator.empty
        private def insert(row0: InternalRow): Unit = {
          val row = row0 match {
            case u: UnsafeRow => u
            case r => toUnsafe(r)
          }
          val key = keyProj(row)
          var q = heaps.get(key)
          if (q == null) {
            q = new java.util.PriorityQueue[UnsafeRow](kLocal + 1, revCmp)
            heaps.put(key.copy(), q)
          }
          if (q.size < kLocal) q.add(row.copy())
          else if (ord.compare(row, q.peek()) < 0) {
            q.poll(); q.add(row.copy())
          }
        }
        private def startDrain(): Unit = {
          val old = heaps
          heaps = new java.util.HashMap()
          drain = old.values().iterator().asScala
            .flatMap(q => q.iterator().asScala)
            .map(_.asInstanceOf[InternalRow])
        }
        override def hasNext: Boolean = {
          while (!drain.hasNext &&
              (iter.hasNext || !heaps.isEmpty)) {
            while (iter.hasNext &&
              !(isPartial && heaps.size >= flushKeys)) insert(iter.next())
            startDrain()
          }
          drain.hasNext
        }
        override def next(): InternalRow = drain.next()
      }
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyExec =
    copy(child = newChild)
}

/** Transparent optimizer rewrite: the declarative
  * `Project(Filter(rn <= k, Window(row_number() OVER (...))))` shape
  * — with the rank column pruned above — becomes TopKPerKey, so
  * existing window-style queries get the bounded-heap physical plan
  * without being rewritten by hand. Fires ONLY on the exact safe
  * shape: a single row_number window expression over the default
  * running frame, a filter that is nothing but the literal rank
  * bound, and a projection that drops the rank attribute (the
  * rewrite's output has no rank column to offer). Like the original
  * row_number filter, result determinism requires the ordering to be
  * total within keys — the rewrite neither adds nor removes that
  * caveat. Opt-in per session (GraftExtensions / TopK.enableRewrite);
  * the oracle-gated q72 exercises the operator explicitly.
  */
object TopKRewrite
    extends org.apache.spark.sql.catalyst.rules.Rule[LogicalPlan] {
  import org.apache.spark.sql.catalyst.expressions._
  import org.apache.spark.sql.catalyst.plans.logical.{Filter, Project, Window => LWindow}

  private def bound(cond: Expression, rn: Attribute): Option[Int] = cond match {
    case LessThanOrEqual(a: AttributeReference, IntegerLiteral(k))
        if a.semanticEquals(rn) => Some(k)
    case LessThan(a: AttributeReference, IntegerLiteral(k))
        if a.semanticEquals(rn) => Some(k - 1)
    case GreaterThanOrEqual(IntegerLiteral(k), a: AttributeReference)
        if a.semanticEquals(rn) => Some(k)
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case p @ Project(projList, Filter(cond, w: LWindow))
        if w.windowExpressions.length == 1 =>
      w.windowExpressions.head match {
        case al @ Alias(WindowExpression(_: RowNumber,
            WindowSpecDefinition(parts, order,
              SpecifiedWindowFrame(RowFrame, UnboundedPreceding, CurrentRow))), _)
            if order.nonEmpty =>
          bound(cond, al.toAttribute) match {
            case Some(k) if k > 0 &&
                projList.forall(ne => !ne.exists(_.semanticEquals(al.toAttribute))) =>
              // InferWindowGroupLimit (Spark 3.5+) runs before user
              // rules and may already have wrapped the window child;
              // unwrap it — TopKPerKey subsumes the group limit (and
              // drops its per-partition Sorts)
              val child = w.child match {
                case wgl: org.apache.spark.sql.catalyst.plans.logical.WindowGroupLimit =>
                  wgl.child
                case c => c
              }
              Project(projList, TopKPerKey(parts, order, k, child))
            case _ => p
          }
        case _ => p
      }
  }
}

object TopK {
  import org.apache.spark.sql.graft.ColumnBridge

  /** Keep the first k rows per key under `orderBy` (name → ascending?).
    * Output columns = input columns (no rank column); row order within
    * the result is unspecified, like any aggregate.
    */
  def topKPerKey(df: DataFrame, keyCols: Seq[String],
      orderBy: Seq[(String, Boolean)], k: Int): DataFrame = {
    val spark = df.sparkSession
    PlanBridge.addStrategy(spark, TopKStrategy)
    val plan = df.queryExecution.analyzed
    def attr(name: String): Attribute =
      plan.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(
          s"topKPerKey: no column $name in ${plan.output.map(_.name)}"))
    val keys = keyCols.map(attr(_): Expression)
    val order = orderBy.map { case (n, asc) =>
      SortOrder(attr(n), if (asc) Ascending else Descending)
    }
    PlanBridge.ofRows(spark, TopKPerKey(keys, order, k, plan))
  }

  /** Opt the session into the transparent row_number→TopKPerKey
    * rewrite (and the strategy that plans it). */
  def enableRewrite(spark: org.apache.spark.sql.SparkSession): Unit = {
    PlanBridge.addStrategy(spark, TopKStrategy)
    PlanBridge.addOptimizerRule(spark, TopKRewrite)
  }

  def disableRewrite(spark: org.apache.spark.sql.SparkSession): Unit =
    PlanBridge.removeOptimizerRule(spark, TopKRewrite)
}
