package graft.cypher

import graft.SparkTestBase
import graft.api.CypherSession
import graft.graph.GraphCatalog
import org.scalatest.funsuite.AnyFunSuite

/** Differential check of the count-only pair-pattern rewrite
  * (Builder.pairCountRewrite) against the written pair join: on
  * randomized multigraphs (parallel edges, self-loops) every rewrite
  * shape must return identical multisets with the rewrite on and off —
  * the window form is an optimization, never a semantics change. Also
  * asserts the rewrite actually FIRES for the canonical shape (window
  * in the plan, no second adjacency join) and does NOT fire for shapes
  * it cannot serve.
  */
class PairCountRewriteSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  private def buildRandomGraph(seed: Int): CypherSession = {
    val root = java.nio.file.Files.createTempDirectory("graft_pcr").toString
    val s = new CypherSession(spark, new GraphCatalog(spark, root))
    s.createGraph("g")
    s.createVLabel("n"); s.createELabel("t"); s.createELabel("u")
    val rnd = new java.util.Random(seed)
    for (i <- 0 until 10)
      s.cypher(s"CREATE (:n {k: $i, grp: ${i % 3}})")
    // random edges incl. parallel duplicates and self-loops
    for (_ <- 0 until 30) {
      val a = rnd.nextInt(10); val b = rnd.nextInt(10)
      val tp = if (rnd.nextInt(3) == 0) "u" else "t"
      s.cypher(s"MATCH (x:n {k: $a}), (y:n {k: $b}) CREATE (x)-[:$tp]->(y)")
    }
    s
  }

  private def rows(s: CypherSession, q: String): Seq[String] =
    s.cypher(q).collect().toSeq
      .map(r => (0 until r.length).map(i =>
        if (r.isNullAt(i)) "∅" else r.get(i).toString).mkString("|"))
      .sorted

  private val queries = Seq(
    // canonical: in-star pairs grouped by the middle
    """MATCH (a:n)-[:t]->(m:n)<-[:t]-(b:n) WHERE id(a) < id(b)
      |RETURN m.k AS mk, count(*) AS c""".stripMargin,
    // flipped half-pair comparison
    """MATCH (a:n)-[:t]->(m:n)<-[:t]-(b:n) WHERE id(b) > id(a)
      |RETURN m.k AS mk, count(*) AS c""".stripMargin,
    // out-star orientation (both edges leave the middle)
    """MATCH (a:n)<-[:t]-(m:n)-[:t]->(b:n) WHERE id(a) < id(b)
      |RETURN m.k AS mk, count(*) AS c""".stripMargin,
    // undirected both hops
    """MATCH (a:n)-[:t]-(m:n)-[:t]-(b:n) WHERE id(a) < id(b)
      |RETURN m.k AS mk, count(*) AS c""".stripMargin,
    // multi-type edge sets
    """MATCH (a:n)-[:t|u]->(m:n)<-[:t|u]-(b:n) WHERE id(a) < id(b)
      |RETURN m.k AS mk, count(*) AS c""".stripMargin,
    // a-side property-map + residual filters (apply after the window)
    """MATCH (a:n {grp: 0})-[:t]->(m:n)<-[:t]-(b:n)
      |WHERE id(a) < id(b) AND a.k < 8
      |RETURN m.k AS mk, count(*) AS c""".stripMargin,
    // middle-node property constraint (applies before the window)
    """MATCH (a:n)-[:t]->(m:n {grp: 1})<-[:t]-(b:n) WHERE id(a) < id(b)
      |RETURN count(*) AS c""".stripMargin,
    // exists() residual through the keyed-correlation probe
    """MATCH (a:n)-[:t]->(m:n)<-[:t]-(b:n)
      |WHERE id(a) < id(b) AND NOT exists((a)-[:u]->())
      |RETURN m.k AS mk, count(*) AS c""".stripMargin,
    // global keyless count (zero-row case must yield 0, not null)
    """MATCH (a:n {k: -1})-[:t]->(m:n)<-[:t]-(b:n) WHERE id(a) < id(b)
      |RETURN count(*) AS c""".stripMargin,
    // grouping on a-side keys
    """MATCH (a:n)-[:t]->(m:n)<-[:t]-(b:n) WHERE id(a) < id(b)
      |RETURN a.grp AS g, count(*) AS c""".stripMargin,
    // ORDER BY + LIMIT over the counted pairs
    """MATCH (a:n)-[:t]->(m:n)<-[:t]-(b:n) WHERE id(a) < id(b)
      |RETURN m.k AS mk, count(*) AS c ORDER BY c DESC, mk LIMIT 3""".stripMargin,
    // STRUCTURAL ORDER BY count(*): the substitution must reach the
    // orderBy exprs, not just the projection items
    """MATCH (a:n)-[:t]->(m:n)<-[:t]-(b:n) WHERE id(a) < id(b)
      |RETURN m.k AS mk, count(*) AS c ORDER BY count(*) DESC, mk LIMIT 3""".stripMargin,
    // symmetric-props canonicalization: the BARE twin is a, the props
    // ride on b — anchors on b and counts strictly-smaller-id partners
    """MATCH (a:n)-[:t]->(m:n)<-[:t]-(b:n {grp: 2}) WHERE id(a) < id(b)
      |RETURN m.k AS mk, count(*) AS c""".stripMargin,
    // symmetric: residual + grouping reference b, never a
    """MATCH (a:n)-[:t]->(m:n)<-[:t]-(b:n {grp: 1})
      |WHERE id(a) < id(b) AND b.k < 8
      |RETURN b.grp AS g, count(*) AS c""".stripMargin,
    // NOT rewritable: b is referenced by an aggregate — pair join stays
    """MATCH (a:n)-[:t]->(m:n)<-[:t]-(b:n) WHERE id(a) < id(b)
      |RETURN m.k AS mk, count(*) AS c, max(b.k) AS mb""".stripMargin,
    // NOT rewritable: asymmetric edge types
    """MATCH (a:n)-[:t]->(m:n)<-[:u]-(b:n) WHERE id(a) < id(b)
      |RETURN m.k AS mk, count(*) AS c""".stripMargin,
    // NOT rewritable: BOTH endpoints carry props — neither is a bare
    // twin the window can absorb
    """MATCH (a:n {grp: 0})-[:t]->(m:n)<-[:t]-(b:n {grp: 2})
      |WHERE id(a) < id(b)
      |RETURN m.k AS mk, count(*) AS c""".stripMargin,
    // NOT rewritable: residual references both endpoints
    """MATCH (a:n)-[:t]->(m:n)<-[:t]-(b:n)
      |WHERE id(a) < id(b) AND a.grp = b.grp
      |RETURN m.k AS mk, count(*) AS c""".stripMargin)

  test("pair-count window ≡ pair join on randomized multigraphs") {
    for (seed <- Seq(3, 58, 2026)) {
      val s = buildRandomGraph(seed)
      for (q <- queries) {
        spark.conf.set("spark.graft.pairCountRewrite", "true")
        val win = rows(s, q)
        spark.conf.set("spark.graft.pairCountRewrite", "false")
        val join = rows(s, q)
        spark.conf.set("spark.graft.pairCountRewrite", "true")
        assert(win == join, s"seed=$seed query=$q")
      }
    }
  }

  test("rewrite fires for the canonical shape and not for excluded ones") {
    val s = buildRandomGraph(17)
    def plan(q: String): String =
      s.cypher(q).queryExecution.optimizedPlan.toString
    val canonical = plan(queries.head)
    assert(canonical.contains("Window"), canonical)
    // the symmetric-props form (a bare, b carries the map) fires too
    val mirrored = plan(
      """MATCH (a:n)-[:t]->(m:n)<-[:t]-(b:n {grp: 2}) WHERE id(a) < id(b)
        |RETURN m.k AS mk, count(*) AS c""".stripMargin)
    assert(mirrored.contains("Window"), mirrored)
    // excluded shapes keep the written pair join (no window anywhere)
    for (q <- queries.takeRight(4))
      assert(!plan(q).contains("Window"), q)
  }
}
