package graft.pipeline

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import scala.collection.mutable

/** The sampled-pair stress twin (p119 shape) against two independent
  * referees: the exact operator (mod = 1 must degenerate to it — the
  * flipped second join leg equals the direct one by undirected sigma
  * symmetry) and a plain-Scala BFS path-counter (every mod must count
  * exactly the shortest paths between sampled ordered pairs), on both
  * a hand-built diamond graph and seeded random graphs.
  */
class SampledStressDiffSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  // diamond + tail: 0-1, 0-2, 1-3, 2-3, 3-4 — sigma(0,3) = 2, so path
  // COUNTS (not just distances) are exercised; plus a second diamond
  // 4-5, 4-6, 5-7, 6-7 so sampled sources hit both halves
  private val diamond = Seq(
    (0L, 1L), (0L, 2L), (1L, 3L), (2L, 3L), (3L, 4L),
    (4L, 5L), (4L, 6L), (5L, 7L), (6L, 7L))

  private def toDf(edges: Seq[(Long, Long)]) = {
    import spark.implicits._
    edges.toDF("u", "v")
  }

  /** Plain-Scala BFS sigma from every vertex: (dist, sigma) per pair. */
  private def bfsAll(edges: Seq[(Long, Long)],
      maxDepth: Int): Map[(Long, Long), (Int, Long)] = {
    val adj = mutable.Map.empty[Long, Set[Long]].withDefaultValue(Set.empty)
    for ((a, b) <- edges if a != b) {
      adj(a) = adj(a) + b; adj(b) = adj(b) + a
    }
    val verts = adj.keys.toSeq.sorted
    val out = mutable.Map.empty[(Long, Long), (Int, Long)]
    for (s <- verts) {
      val dist = mutable.Map(s -> 0)
      val sigma = mutable.Map(s -> 1L).withDefaultValue(0L)
      var frontier = Seq(s)
      var d = 0
      while (frontier.nonEmpty && d < maxDepth) {
        d += 1
        val nextSigma = mutable.Map.empty[Long, Long].withDefaultValue(0L)
        for (v <- frontier; w <- adj(v) if !dist.contains(w))
          nextSigma(w) += sigma(v)
        for ((w, g) <- nextSigma) { dist(w) = d; sigma(w) = g }
        frontier = nextSigma.keys.toSeq
      }
      for ((v, dv) <- dist if v != s) out((s, v)) = (dv, sigma(v))
    }
    out.toMap
  }

  /** Brute-force sampled stress: Σ over sampled ordered pairs (s, t)
    * of sigma_sv · sigma_vt where d(s,v) + d(v,t) = d(s,t).
    */
  private def bruteStress(edges: Seq[(Long, Long)], mod: Long,
      maxDepth: Int): Map[Long, Long] = {
    val sp = bfsAll(edges, maxDepth)
    val verts = edges.flatMap(e => Seq(e._1, e._2)).distinct
    val sample = verts.filter(_ % mod == 0)
    val acc = mutable.Map.empty[Long, Long].withDefaultValue(0L)
    for (s <- sample; t <- sample if s != t; v <- verts
         if v != s && v != t) {
      (sp.get((s, v)), sp.get((v, t)), sp.get((s, t))) match {
        case (Some((d1, g1)), Some((d2, g2)), Some((d3, _)))
            if d1 + d2 == d3 =>
          acc(v) += g1 * g2
        case _ =>
      }
    }
    acc.filter(_._2 > 0).toMap
  }

  private def collectStress(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("mod = 1 degenerates to the exact stress centrality") {
    val exact = collectStress(
      GraphAnalytics.stressCentrality(toDf(diamond), maxDepth = 4))
    val sampled = collectStress(
      GraphAnalytics.stressCentralitySampled(toDf(diamond), maxDepth = 4,
        mod = 1))
    assert(sampled == exact)
    assert(exact == bruteStress(diamond, 1, 4)) // and both match the referee
  }

  test("mod = 2 counts exactly the sampled-pair shortest paths") {
    val sampled = collectStress(
      GraphAnalytics.stressCentralitySampled(toDf(diamond), maxDepth = 4,
        mod = 2))
    assert(sampled == bruteStress(diamond, 2, 4))
    // the sample is real: strictly less mass than the exact form
    val exact = collectStress(
      GraphAnalytics.stressCentrality(toDf(diamond), maxDepth = 4))
    assert(sampled.values.sum < exact.values.sum)
  }

  test("seeded random graphs: sampled == brute force for mod 1/2/3") {
    // deterministic LCG so the graphs are reproducible across runs —
    // dense enough for multi-path diamonds (real sigma > 1), sparse
    // enough that depth 3 leaves unreachable pairs (exercising the
    // m3-join's d(s,t)-exists condition)
    var state = 0x2545F4914F6CDD1DL
    def nextInt(bound: Int): Int = {
      state = state * 6364136223846793005L + 1442695040888963407L
      (((state >>> 33) % bound).toInt + bound) % bound
    }
    for (seed <- 1 to 3) {
      val n = 12 + seed * 2
      val edges = (for (a <- 0 until n; b <- (a + 1) until n
                        if nextInt(100) < 22)
        yield (a.toLong, b.toLong)).toSeq
      for (mod <- Seq(1L, 2L, 3L)) {
        val got = collectStress(GraphAnalytics.stressCentralitySampled(
          toDf(edges), maxDepth = 3, mod = mod))
        assert(got == bruteStress(edges, mod, 3),
          s"seed=$seed mod=$mod edges=$edges")
      }
    }
  }

  test("a too-small cap still fails loud on the sampled path") {
    // cap = 1 trips the FIRST guard on the path (the closure's round-1
    // pre-flight); both guard sites speak the same loud dialect —
    // "pair-state guard" + a sampled/mod remedy — so either message
    // satisfies the contract that the failure is fast and names a way
    // forward
    spark.conf.set(ScaleGuard.ConfKey, "1")
    try {
      val e = intercept[IllegalStateException] {
        GraphAnalytics.stressCentralitySampled(toDf(diamond), maxDepth = 4,
          mod = 2).collect()
      }
      assert(e.getMessage.contains("pair-state guard"), e.getMessage)
      assert(e.getMessage.contains("mod") ||
        e.getMessage.contains("sampled"), e.getMessage)
    } finally spark.conf.unset(ScaleGuard.ConfKey)
  }
}
