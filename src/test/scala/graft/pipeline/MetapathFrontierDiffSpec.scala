package graft.pipeline

import graft.SparkTestBase
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Differential check of p110's frontier-first metapath walk against
  * the global-index formulation it replaced: the LCG neighbor pick
  * (idx = (walk·A + step·B) mod deg) must be decided by the SAME
  * (neighbor set, degree) whether the per-key row_number index is
  * computed over the whole adjacency or over the frontier's slice —
  * the semi-join keeps every neighbor of a frontier node, so the two
  * walks are row-identical on any graph. Randomized bipartite graphs
  * with skewed degrees, isolated walkers (no neighbors -> walk ends),
  * and duplicate-edge inputs (distinct() collapses them) probe the
  * places the equivalence could crack.
  */
class MetapathFrontierDiffSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestBase.spark

  private val A = 1103515245L
  private val B = 12345L

  private def pick(step: Int) =
    pmod(col("walk") * A + lit(step) * B, col("deg"))

  /** The replaced formulation: full-graph row_number indexes in both
    * directions, hops probe them. Kept verbatim (minus checkpoints —
    * irrelevant to values) as the differential oracle.
    */
  private def globalIndexWalk(cp: DataFrame, nWalkers: Int,
      nSteps: Int): DataFrame = {
    val wOut = Window.partitionBy("c").orderBy("p")
    val cpIdx = cp.select(col("c").as("cc"), col("p"),
      (row_number().over(wOut) - 1).as("aidx"))
    val cDeg = cp.groupBy("c").agg(count(lit(1)).as("cd"))
    val wIn = Window.partitionBy("p").orderBy("c")
    val pcIdx = cp.select(col("p").as("pp"), col("c"),
      (row_number().over(wIn) - 1).as("aidx"))
    val pDeg = cp.groupBy("p").agg(count(lit(1)).as("pd"))
    var cur = cDeg.where(col("c") <= nWalkers)
      .select(col("c").as("walk"), col("c").as("cur"))
    val hops = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    for (step <- 0 until nSteps) {
      cur =
        if (step % 2 == 0)
          cur.join(cDeg.withColumnRenamed("cd", "deg"),
              col("cur") === col("c"))
            .withColumn("idx", pick(step))
            .join(cpIdx, col("cc") === col("cur") && col("aidx") === col("idx"))
            .select(col("walk"), col("p").as("cur"))
        else
          cur.join(pDeg.withColumnRenamed("pd", "deg"),
              col("cur") === col("p"))
            .withColumn("idx", pick(step))
            .join(pcIdx, col("pp") === col("cur") && col("aidx") === col("idx"))
            .select(col("walk"), col("c").as("cur"))
      hops += cur.select(col("walk"), lit(step + 1).as("step"),
        col("cur").as("node"))
    }
    hops.reduce(_ unionAll _)
  }

  /** The shipped formulation (PipelineQueries p110), parameterized. */
  private def frontierWalk(cp: DataFrame, nWalkers: Int,
      nSteps: Int): DataFrame = {
    var cur = cp.where(col("c") <= nWalkers).select(col("c")).distinct()
      .select(col("c").as("walk"), col("c").as("cur"))
    val hops = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    for (step <- 0 until nSteps) {
      val (src, dst) = if (step % 2 == 0) ("c", "p") else ("p", "c")
      val fn = broadcast(cur.select(col("cur").as(src)).distinct())
      val adj = cp.join(fn, src)
      val wk = Window.partitionBy(src)
      val idx = adj.select(col(src).as("nn"), col(dst),
        (row_number().over(wk.orderBy(dst)) - 1).as("aidx"),
        count(lit(1)).over(wk).as("deg"))
      cur = cur.join(idx, col("nn") === col("cur"))
        .where(col("aidx") === pick(step))
        .select(col("walk"), col(dst).as("cur"))
      hops += cur.select(col("walk"), lit(step + 1).as("step"),
        col("cur").as("node"))
    }
    hops.reduce(_ unionAll _)
  }

  private def randomBipartite(seed: Int, nC: Int, nP: Int,
      nEdges: Int): DataFrame = {
    val rnd = new java.util.Random(seed)
    // skew: low part ids are hubs (quadratic bias); duplicates kept so
    // the distinct() in both formulations is exercised
    val rows = Seq.fill(nEdges) {
      val c = rnd.nextInt(nC).toLong + 1
      val p = (math.pow(rnd.nextDouble(), 2.0) * nP).toLong + 1
      (c, p)
    }
    import spark.implicits._
    rows.toDF("c", "p").distinct()
  }

  test("frontier-first walk is row-identical to the global-index walk") {
    for (seed <- Seq(1, 7, 42)) {
      val cp = randomBipartite(seed, nC = 60, nP = 40, nEdges = 500)
        .localCheckpoint(true)
      val a = globalIndexWalk(cp, nWalkers = 12, nSteps = 4)
        .orderBy("walk", "step", "node").collect().toSeq
      val b = frontierWalk(cp, nWalkers = 12, nSteps = 4)
        .orderBy("walk", "step", "node").collect().toSeq
      assert(a == b, s"seed $seed: ${a.length} vs ${b.length} rows")
      assert(a.nonEmpty, s"seed $seed produced no walk rows")
    }
  }

  test("walkers at degree-0 start or dead-end stop in both forms") {
    import spark.implicits._
    // walker 2 has no edges at all; part 9 is reachable but has only
    // that one customer, so the odd hop returns to the same customer
    val cp = Seq((1L, 9L), (3L, 9L), (3L, 5L), (4L, 5L))
      .toDF("c", "p").localCheckpoint(true)
    val a = globalIndexWalk(cp, nWalkers = 4, nSteps = 4)
      .orderBy("walk", "step", "node").collect().toSeq
    val b = frontierWalk(cp, nWalkers = 4, nSteps = 4)
      .orderBy("walk", "step", "node").collect().toSeq
    assert(a == b)
    // walk 2 never appears (no purchases)
    assert(!b.exists(_.getLong(0) == 2L))
  }
}
