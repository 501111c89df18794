package graft.cypher

import graft.SparkTestBase
import graft.api.CypherSession
import graft.graph.GraphCatalog
import org.scalatest.funsuite.AnyFunSuite

/** Differential check of the key-correlated probe paths (exists(),
  * size(), expression-position shortestpath, OPTIONAL MATCH) against
  * the per-row rid-correlated fallback: on randomized graphs both
  * strategies must return identical multisets — the keyed plan is an
  * optimization, never a semantics change.
  */
class KeyedCorrelationDiffSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  private def buildRandomGraph(seed: Int): CypherSession = {
    val root = java.nio.file.Files.createTempDirectory("graft_kcd").toString
    val s = new CypherSession(spark, new GraphCatalog(spark, root))
    s.createGraph("g")
    s.createVLabel("n"); s.createELabel("t"); s.createELabel("u")
    val rnd = new java.util.Random(seed)
    for (i <- 0 until 12)
      s.cypher(s"CREATE (:n {k: $i, grp: ${i % 3}})")
    // random edges over the 12 vertices, two types, some parallel
    for (_ <- 0 until 18) {
      val a = rnd.nextInt(12); val b = rnd.nextInt(12)
      val tp = if (rnd.nextBoolean()) "t" else "u"
      val w = rnd.nextInt(9) + 1
      s.cypher(
        s"MATCH (x:n {k: $a}), (y:n {k: $b}) CREATE (x)-[:$tp {w: $w}]->(y)")
    }
    s
  }

  private def rows(s: CypherSession, q: String): Seq[String] =
    s.cypher(q).collect().toSeq
      .map(r => (0 until r.length).map(i =>
        if (r.isNullAt(i)) "∅" else r.get(i).toString).mkString("|"))
      .sorted

  private val queries = Seq(
    // exists() with one shared vertex
    """MATCH (a:n)-[:t]->(b:n)
      |WHERE NOT exists((a)-[:u]->())
      |RETURN a.k AS ak, b.k AS bk""".stripMargin,
    // exists() with BOTH endpoints shared + property-map constraint
    """MATCH (a:n), (b:n)
      |WHERE a.grp = b.grp AND a.k < b.k AND exists((a)-[:t]->(b))
      |RETURN a.k AS ak, b.k AS bk""".stripMargin,
    // size() multiplicity
    """MATCH (a:n) RETURN a.k AS k, size((a)-[:t]->()) AS s""".stripMargin,
    // OPTIONAL MATCH: new vars + null extension + multiplicities
    """MATCH (a:n) OPTIONAL MATCH (a)-[e:t]->(b:n)
      |RETURN a.k AS ak, e.w AS w, b.k AS bk""".stripMargin,
    // OPTIONAL MATCH with an inner WHERE referencing the outer var
    """MATCH (a:n) OPTIONAL MATCH (a)-[e:u]->(b:n) WHERE b.k > a.k
      |RETURN a.k AS ak, b.k AS bk""".stripMargin,
    // expression-position shortestpath between shared endpoints
    """MATCH (a:n {grp: 0}), (b:n {grp: 1})
      |WITH a, b, shortestpath((a)-[:t *..4]->(b)) AS p
      |RETURN a.k AS ak, b.k AS bk, length(p) AS l""".stripMargin,
    // UNCORRELATED exists (no shared refs): one global verdict
    """MATCH (a:n) WHERE exists(()-[:u]->({k: 0}))
      |RETURN a.k AS k""".stripMargin,
    // UNCORRELATED exists that matches nothing
    """MATCH (a:n) WHERE NOT exists(()-[:u]->({k: 99}))
      |RETURN a.k AS k""".stripMargin,
    // uncorrelated OPTIONAL MATCH: cross-joined inner result / nulls
    """MATCH (a:n {grp: 2}) OPTIONAL MATCH (x:n {k: 0})-[:t]->(y:n)
      |RETURN a.k AS ak, y.k AS yk""".stripMargin)

  test("keyed correlation ≡ rid correlation on randomized graphs") {
    for (seed <- Seq(7, 41, 99)) {
      val s = buildRandomGraph(seed)
      for (q <- queries) {
        spark.conf.set("spark.graft.keyedCorrelation", "true")
        val keyed = rows(s, q)
        spark.conf.set("spark.graft.keyedCorrelation", "false")
        val rid = rows(s, q)
        spark.conf.set("spark.graft.keyedCorrelation", "true")
        assert(keyed == rid, s"seed=$seed query=$q")
      }
    }
  }
}
