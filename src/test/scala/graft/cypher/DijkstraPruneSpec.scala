package graft.cypher

import java.nio.file.Files
import graft.SparkTestBase
import graft.api.CypherSession
import graft.graph.GraphCatalog
import org.scalatest.funsuite.AnyFunSuite

/** Target-side termination of the weighted search (the set-based form
  * of the reference's pairing-heap early exit, nodeDijkstra.c:37-50):
  * once every (origin, target) k-set is full, frontier paths costlier
  * than the origin's worst settled target distance are pruned, so a
  * selective target pair on a deep graph stops at the target's depth
  * instead of exploring everything reachable. Differentially checked
  * against the plain fixpoint on random weighted multigraphs.
  */
class DijkstraPruneSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  private def rows(s: CypherSession, q: String): Seq[String] =
    s.cypher(q).collect().toSeq
      .map(r => (0 until r.length).map(i =>
        if (r.isNullAt(i)) "∅" else r.get(i).toString).mkString("|"))
      .sorted

  private def lastRounds: Int =
    Algo.lastDijkstraRoundCount.getOrElse(fail("no dijkstra ran on this thread"))

  test("deep chain: loop exits at target depth, not graph diameter") {
    val root = Files.createTempDirectory("graft_dij_chain").toString
    val s = new CypherSession(spark, new GraphCatalog(spark, root))
    s.createGraph("chain")
    s.createVLabel("v"); s.createELabel("e")
    val n = 30
    (0 until n).foreach(i => s.cypher(s"CREATE (:v {n: $i})"))
    (0 until n - 1).foreach { i =>
      s.cypher(s"MATCH (x:v {n: $i}), (y:v {n: ${i + 1}}) " +
        "CREATE (x)-[:e {w: 1}]->(y)")
    }
    val q =
      """MATCH p = dijkstra((a:v {n: 0})-[e:e]->(b:v {n: 3}), e.w)
        |RETURN length(p) AS len""".stripMargin
    assert(rows(s, q) == Seq("3"))
    // target sits 3 hops in; the chain continues for 26 more — the
    // pruned loop must exit within target depth + 1, the plain
    // fixpoint walks the whole chain
    assert(lastRounds <= 4, s"pruned rounds $lastRounds")
    spark.conf.set("spark.graft.dijkstraTargetPrune", "false")
    try {
      assert(rows(s, q) == Seq("3"))
      assert(lastRounds > 20, s"fixpoint rounds $lastRounds")
    } finally spark.conf.set("spark.graft.dijkstraTargetPrune", "true")
  }

  test("pruned ≡ fixpoint on random weighted multigraphs (k=1 and k=2)") {
    for (seed <- Seq(5, 77)) {
      val root = Files.createTempDirectory(s"graft_dij_$seed").toString
      val s = new CypherSession(spark, new GraphCatalog(spark, root))
      s.createGraph(s"d$seed")
      s.createVLabel("v"); s.createELabel("e")
      val rnd = new java.util.Random(seed)
      (0 until 12).foreach(i =>
        s.cypher(s"CREATE (:v {n: $i, grp: ${i % 3}})"))
      for (_ <- 0 until 30) {
        val a = rnd.nextInt(12); val bb = rnd.nextInt(12)
        if (a != bb) s.cypher(
          s"MATCH (x:v {n: $a}), (y:v {n: $bb}) " +
            s"CREATE (x)-[:e {w: ${rnd.nextInt(9) + 1}}]->(y)")
      }
      val queries = Seq(
        // multi-origin × multi-target pairs, zero-weight-free
        """MATCH p = dijkstra((a:v {grp: 0})-[e:e]->(b:v {grp: 1}), e.w)
          |RETURN a.n AS an, b.n AS bn, length(p) AS len""".stripMargin,
        // top-k variant: count per pair is tie-insensitive
        """MATCH p = dijkstra((a:v {grp: 2})-[e:e]->(b:v {grp: 0}), e.w LIMIT 2)
          |RETURN a.n AS an, b.n AS bn, count(*) AS c""".stripMargin)
      for (q <- queries) {
        spark.conf.set("spark.graft.dijkstraTargetPrune", "true")
        val pruned = rows(s, q)
        spark.conf.set("spark.graft.dijkstraTargetPrune", "false")
        val full = rows(s, q)
        spark.conf.set("spark.graft.dijkstraTargetPrune", "true")
        assert(pruned == full, s"seed=$seed query=$q")
      }
    }
  }
}
