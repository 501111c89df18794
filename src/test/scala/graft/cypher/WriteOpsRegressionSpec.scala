package graft.cypher

import java.nio.file.Files
import graft.SparkTestBase
import graft.api.CypherSession
import graft.graph.GraphCatalog
import org.scalatest.funsuite.AnyFunSuite

/** Regressions from the round-10 write-path review: MERGE with fresh
  * endpoints on a relationship pattern (the created/matched var
  * interleaving differs per kind), CREATE path-variable contents for
  * reused and anonymous vertices, and jsonb NUMERIC identity (1 ≡ 1.0)
  * for unique constraints and MERGE prop-map keys.
  */
class WriteOpsRegressionSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  private def fresh(): CypherSession = {
    val root = Files.createTempDirectory("graft_wops").toString
    val s = new CypherSession(spark, new GraphCatalog(spark, root))
    s.createGraph("g"); s.createVLabel("l"); s.createVLabel("m")
    s.createELabel("t"); s.createELabel("t2"); s
  }

  test("MERGE creates a relationship with BOTH endpoints fresh") {
    val s = fresh()
    // create() binds (a, b, edge); buildMatch binds (a, edge, b) — the
    // per-kind pairing must align them, not throw the misalignment error
    val r = s.cypher(
      "MERGE (a:l {x: 1})-[:t]->(b:m {y: 2}) RETURN a.x AS ax, b.y AS by")
      .collect()
    assert(r.length == 1)
    assert(r.head.getString(0) == "1" && r.head.getString(1) == "2")
    // merging again matches — no second instance
    s.cypher("MERGE (a:l {x: 1})-[:t]->(b:m {y: 2})")
    assert(s.cypher("MATCH (:l)-[e:t]->(:m) RETURN count(*) AS c")
      .collect().head.getString(0) == "1")
  }

  test("CREATE path over matched vertices carries ONLY the new edge") {
    val s = fresh()
    s.cypher("CREATE (:l {n: 1})-[:t]->(:m {n: 2})")
    val r = s.cypher(
      """MATCH (a:l)-[e:t]->(b:m) CREATE p = (a)-[:t2]->(b)
        |RETURN size(relationships(p)) AS ne, size(nodes(p)) AS nv"""
        .stripMargin).collect()
    assert(r.map(x => (x.getString(0), x.getString(1))).toSeq ==
      Seq(("1", "2")))
  }

  test("CREATE path with equal anonymous nodes keeps both distinct") {
    val s = fresh()
    // two structurally-equal anonymous NodePatterns: positional lookup
    // (indexOf) collapsed both to the first created vertex
    val r = s.cypher(
      "CREATE p = (:l)-[:t]->(:l) RETURN nodes(p)[0] = nodes(p)[1] AS same")
      .collect()
    assert(r.map(_.get(0).toString).toSeq == Seq("false"))
  }

  test("unique constraint: 1 and 1.0 are ONE key (jsonb numeric equality)") {
    val s = fresh()
    s.catalog.createPropertyIndex("g", "l", Some("uq_id"), Seq("id"),
      unique = true)
    s.cypher("CREATE (:l {id: 1})")
    val e = intercept[IllegalStateException] { s.cypher("CREATE (:l {id: 1.0})") }
    assert(e.getMessage.contains("unique"), e.getMessage)
    // within one batch too
    val e2 = intercept[IllegalStateException] {
      s.cypher("UNWIND [2, 2.0] AS v CREATE (:l {id: v})")
    }
    assert(e2.getMessage.contains("unique"), e2.getMessage)
  }

  test("MERGE batch: {x: 1} and {x: 1.0} are ONE identity") {
    val s = fresh()
    s.cypher("UNWIND [1, 1.0] AS v MERGE (n:l {x: v})")
    assert(s.cypher("MATCH (n:l) RETURN count(*) AS c")
      .collect().head.getString(0) == "1")
  }
}
