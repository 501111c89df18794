package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loud pre-flight guard for the operators whose intermediate state is
  * QUADRATIC in a degree distribution — exact all-pairs distance
  * closures ((sources × reach-set) pair state) and exact wedge
  * self-joins (Σ deg·(deg−1)/2 pairs through each middle vertex).
  *
  * Philosophy: same as the VLE depth cap (`DepthCapSpec`) — a plan
  * that cannot survive the next scale decade must fail FAST and LOUD,
  * naming the shipped scale twin and the override, not burn 15 minutes
  * of cluster time before `UNABLE_TO_ACQUIRE_MEMORY` (measured at the
  * 100× probe: the exact closeness/wedge forms ran 878 s before dying;
  * the estimate below flags them in seconds).
  *
  * The estimate is cheap and runs BEFORE the quadratic join:
  * - wedges: one count-per-middle aggregation over the (already
  *   checkpointed) adjacency — Σ d·(d−1)/2 is the exact self-join
  *   output size;
  * - frontier rounds: Σ over frontier vertices of nf(v)·deg(v) — the
  *   exact pre-prune row count of the round's (frontier ⋈ edges) join,
  *   degree-aware so hub blow-ups are seen (an average-degree estimate
  *   misses exactly the graphs that die).
  *
  * Threshold: `spark.graft.pairState.max` (rows; ≤ 0 disables), default
  * unified-pool bytes / 64 — ~48 serialized bytes per cached pair row
  * plus join/aggregation scratch headroom. On the measured 100× probe
  * box (80 GB heap → ~47 GB pool → ~740 M rows) the exact forms
  * project 1.3–2 e9 rows and trip; every green suite query at
  * sf ≤ 1 projects well under the default.
  */
object ScaleGuard {

  /** Row cap for quadratic pair state; ≤ 0 disables the guard. */
  val ConfKey = "spark.graft.pairState.max"

  /** Serialized cost of one cached (long, long) pair-state row:
    * ~16 payload + block/row overhead, plus the same row transiting
    * the round's join and distinct/aggregation maps.
    */
  val BytesPerPair = 48L

  /** Aggregate unified-pool budget: the sum of every block manager's
    * max storage+execution memory (one block manager per executor; in
    * local mode, the driver's).
    */
  def budgetBytes(spark: SparkSession): Long =
    spark.sparkContext.getExecutorMemoryStatus.values.map(_._1).sum

  /** Resolved row threshold: the conf (session conf or system
    * property), else unified-pool bytes / 64 with a 16 M-row floor so
    * small test heaps never trip on healthy suite states.
    */
  def maxPairRows(spark: SparkSession): Long =
    spark.conf.getOption(ConfKey)
      .orElse(sys.props.get(ConfKey))
      .map(_.trim.toLong)
      .getOrElse(math.max(16L << 20, budgetBytes(spark) / 64))

  /** Throw the loud guard error when `estRows` exceeds the cap. */
  def check(spark: SparkSession, estRows: Long, what: String,
      twin: String): Unit = {
    val max = maxPairRows(spark)
    if (max > 0 && estRows > max)
      throw new IllegalStateException(
        s"pair-state guard: $what projects ~$estRows quadratic state " +
        s"rows, above $ConfKey = $max (default: unified-pool bytes / " +
        s"$BytesPerPair-byte pairs with headroom). This state exhausts " +
        "executor memory at scale (measured: the exact forms die at " +
        s"the 100x probe). Use the scale twin instead: $twin. To " +
        s"proceed anyway, raise the cap (set $ConfKey to a larger row " +
        "count) or disable it (set it <= 0).")
  }

  /** Exact output size of the wedge self-join `adj ⋈ adj` on
    * `middleCol` with an id-ordered other side: Σ d·(d−1)/2 over
    * middle-vertex degrees. One aggregation over the adjacency.
    */
  def wedgePairs(adj: DataFrame, middleCol: String): Long =
    adj.groupBy(col(middleCol)).agg(count(lit(1)).as("_d"))
      .agg(coalesce(sum(expr("_d * (_d - 1) DIV 2")), lit(0L)).as("_w"))
      .first().getLong(0)

  /** Pre-flight for exact wedge joins (co-occurrence, Adamic-Adar,
    * n-gram Jaccard pair generation): estimate, then [[check]].
    */
  def guardWedges(adj: DataFrame, middleCol: String, what: String,
      twin: String): Unit =
    check(adj.sparkSession, wedgePairs(adj, middleCol), what, twin)
}
