package graft.cypher

import graft.SparkTestBase
import graft.api.CypherSession
import graft.graph.GraphCatalog
import org.scalatest.funsuite.AnyFunSuite

/** EXPLAIN over write statements (the reference EXPLAINs ModifyGraph
  * plans through PG's EXPLAIN front door): the statement must be
  * described — op kind, target labels, victim estimate, input plan —
  * and NOT applied. Also covers parameterized EXPLAIN (params must
  * thread from cypher() into the EXPLAIN path).
  */
class ExplainWriteSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  private def freshSession(): CypherSession = {
    val root = java.nio.file.Files.createTempDirectory("graft_expw").toString
    val s = new CypherSession(spark, new GraphCatalog(spark, root))
    s.createGraph("g")
    s.createVLabel("person"); s.createELabel("knows")
    for (i <- 0 until 5) s.cypher(s"CREATE (:person {k: $i})")
    s.cypher("MATCH (a:person {k: 0}), (b:person {k: 1}) CREATE (a)-[:knows]->(b)")
    s
  }

  private def planText(s: CypherSession, q: String,
      params: Map[String, Any] = Map.empty): String =
    s.cypher(q, params).collect().map(_.getString(0)).mkString("\n")

  private def countV(s: CypherSession): Long =
    s.cypher("MATCH (n:person) RETURN count(*) AS c")
      .collect().head.get(0).toString.toLong

  test("EXPLAIN CREATE describes the op and applies nothing") {
    val s = freshSession()
    val before = countV(s)
    val p = planText(s, "EXPLAIN CREATE (:person {k: 99})-[:knows]->(:person {k: 100})")
    assert(p.contains("ModifyGraph (op=CREATE"), p)
    assert(p.contains("vertex_labels=[person]"), p)
    assert(p.contains("edge_labels=[knows]"), p)
    assert(p.contains("pattern: (:person {…})-[:knows]->(:person {…})"), p)
    assert(countV(s) == before, "EXPLAIN must not create")
  }

  test("EXPLAIN MATCH … DETACH DELETE plans the read prefix, estimates victims, deletes nothing") {
    val s = freshSession()
    val before = countV(s)
    val p = planText(s, "EXPLAIN MATCH (n:person) WHERE n.k < 3 DETACH DELETE n")
    assert(p.contains("ModifyGraph (op=DETACH DELETE"), p)
    assert(p.contains("targets=[n]"), p)
    assert(p.contains("estimated_victims="), p)
    // the read prefix (the MATCH scan) must appear as a real plan
    assert(p.contains("Input plan:"), p)
    assert(p.contains("Scan parquet") || p.contains("FileScan"), p)
    assert(countV(s) == before, "EXPLAIN must not delete")
  }

  test("EXPLAIN MATCH … SET describes items and applies nothing") {
    val s = freshSession()
    val p = planText(s, "EXPLAIN MATCH (n:person {k: 2}) SET n.tag = 'x'")
    assert(p.contains("ModifyGraph (op=SET"), p)
    assert(p.contains("SET n.tag"), p)
    val tagged = s.cypher(
      "MATCH (n:person) WHERE n.tag IS NOT NULL RETURN count(*) AS c")
      .collect().head.get(0).toString.toLong
    assert(tagged == 0L, "EXPLAIN must not set")
  }

  test("EXPLAIN MERGE describes the pattern and ON CREATE/ON MATCH arms") {
    val s = freshSession()
    val before = countV(s)
    val p = planText(s,
      "EXPLAIN MERGE (n:person {k: 42}) ON CREATE SET n.fresh = true ON MATCH SET n.seen = true")
    assert(p.contains("ModifyGraph (op=MERGE"), p)
    assert(p.contains("pattern=(n:person {…})"), p)
    assert(p.contains("on_create=1"), p)
    assert(p.contains("on_match=1"), p)
    assert(countV(s) == before, "EXPLAIN must not merge")
  }

  test("post-write clauses are listed descriptively, not planned") {
    val s = freshSession()
    val p = planText(s,
      "EXPLAIN CREATE (n:person {k: 7}) RETURN n.k AS k")
    assert(p.contains("ModifyGraph (op=CREATE"), p)
    assert(p.contains("post-write clause"), p)
  }

  test("EXPLAIN of a parameterized read query threads params") {
    val s = freshSession()
    // without threading this raised a missing-parameter error
    val p = planText(s,
      "EXPLAIN MATCH (n:person) WHERE n.k = $kk RETURN n.k AS k",
      Map("kk" -> 2))
    assert(p.nonEmpty && (p.contains("Scan") || p.contains("Project")), p)
  }

  test("EXPLAIN (ANALYZE) executes: runtime totals for reads, applied writes with stats") {
    val s = freshSession()
    val p = planText(s,
      "EXPLAIN (ANALYZE) MATCH (n:person) WHERE n.k < 3 RETURN n.k AS k")
    assert(p.contains("Execution: 3 rows"), p)
    // ANALYZE of a write APPLIES it (PG semantics) and reports stats
    val before = countV(s)
    val wp = planText(s, "EXPLAIN (ANALYZE) CREATE (:person {k: 77})")
    assert(wp.contains("Execution:"), wp)
    assert(wp.contains("Write stats:") && wp.contains("insertedvertices=1"), wp)
    assert(countV(s) == before + 1, "ANALYZE must apply the write")
  }

  test("bare EXPLAIN ANALYZE works; (ANALYZE OFF) stays plan-only") {
    val s = freshSession()
    // PG's canonical unparenthesized spelling
    val p = planText(s, "EXPLAIN ANALYZE MATCH (n:person) RETURN n.k AS k")
    assert(p.contains("Execution: 5 rows"), p)
    // explicit ANALYZE OFF means plan-only — a write must NOT apply
    val before = countV(s)
    val wp = planText(s, "EXPLAIN (ANALYZE OFF) CREATE (:person {k: 88})")
    assert(wp.contains("ModifyGraph (op=CREATE"), wp)
    assert(!wp.contains("Execution:"), wp)
    assert(countV(s) == before, "ANALYZE OFF must not apply the write")
    // ANALYZE of a write keeps the ModifyGraph description
    val ap = planText(s, "EXPLAIN (ANALYZE) MATCH (n:person {k: 3}) SET n.z = 1")
    assert(ap.contains("ModifyGraph (op=SET") && ap.contains("Execution:"), ap)
  }

  test("EXPLAIN rejects what execution rejects under enable_eager=off") {
    val s = freshSession()
    spark.conf.set("spark.graft.enableEager", "false")
    try {
      // a non-final SET is an eager plan — the reference's EXPLAIN
      // errors during planning (assign_query_eager), so must this
      val e = intercept[IllegalStateException] {
        s.cypher("EXPLAIN MATCH (n:person) SET n.x = 1 RETURN n.k AS k")
          .collect()
      }
      assert(e.getMessage.contains("eagerness"), e.getMessage)
    } finally spark.conf.unset("spark.graft.enableEager")
  }

  test("EXPLAIN of a parameterized write threads params too") {
    val s = freshSession()
    val before = countV(s)
    val p = planText(s,
      "EXPLAIN MATCH (n:person) WHERE n.k = $kk DELETE n", Map("kk" -> 1))
    assert(p.contains("ModifyGraph (op=DELETE"), p)
    assert(countV(s) == before)
  }
}
