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
  * rank-filter shape done the way a distributed engine should): keep
  * the k first rows per key group under `order`.
  *
  * Why a custom operator: the declarative form
  * `row_number() OVER (PARTITION BY key ORDER BY o) <= k` forces
  * Spark's Window physical plan to shuffle EVERY row of every group
  * and sort whole partitions before discarding all but k — there is
  * no partial "limit per key" the optimizer can derive. This operator
  * is the aggregation-style twin: a map-side pass keeps at most k
  * rows per key per partition in bounded heaps (the partial), only
  * those survivors shuffle (k·partitions rows per key worst-case, not
  * the group's cardinality), and a final per-key heap pass merges —
  * no sort of anything but the k-element heaps. At 100 TB with hot
  * keys this is the difference between shuffling a key's billion rows
  * and shuffling k per map task.
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
    child.execute().mapPartitions { iter =>
      val keyProj = UnsafeProjection.create(keyExprs, childOutput)
      val ord = PlanBridge.rowOrdering(sortOrder, childOutput)
      // per-key MAX-heap on the sort order: the root is the worst
      // retained row, evicted when a better one arrives — memory is
      // O(keys-in-partition · k), never the group cardinality
      val revCmp = new java.util.Comparator[UnsafeRow] {
        override def compare(a: UnsafeRow, b: UnsafeRow): Int =
          -ord.compare(a, b)
      }
      val heaps =
        new java.util.HashMap[UnsafeRow, java.util.PriorityQueue[UnsafeRow]]()
      while (iter.hasNext) {
        val row = iter.next().asInstanceOf[UnsafeRow]
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
      import scala.jdk.CollectionConverters._
      heaps.values().iterator().asScala
        .flatMap(q => q.iterator().asScala)
        .map(_.asInstanceOf[InternalRow])
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyExec =
    copy(child = newChild)
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
}
