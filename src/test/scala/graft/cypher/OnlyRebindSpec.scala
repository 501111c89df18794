package graft.cypher

import graft.SparkTestBase
import graft.api.CypherSession
import graft.graph.GraphCatalog
import org.scalatest.funsuite.AnyFunSuite

/** ONLY on a RE-BOUND variable (postfix ONLY, gram.y:18684): the
  * fresh-bind path scans exactly the named label's table, so the
  * re-bind constraint form must filter to the exact label too — the
  * subtree-always filter it used to apply widened `(x:parent ONLY)`
  * to the whole inheritance subtree when x was already bound. Same
  * rule for the VLE target re-bind, which used to drop the label
  * constraint entirely.
  */
class OnlyRebindSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  private def session(): CypherSession = {
    val root = java.nio.file.Files.createTempDirectory("graft_only").toString
    val s = new CypherSession(spark, new GraphCatalog(spark, root))
    s.createGraph("g")
    s.cypher("CREATE VLABEL parent")
    s.cypher("CREATE VLABEL child INHERITS (parent)")
    s.createELabel("e")
    s.cypher("CREATE (:parent {k: 1})")
    s.cypher("CREATE (:child {k: 2})")
    s.cypher(
      "MATCH (x:parent {k: 1}), (y:child {k: 2}) CREATE (x)-[:e]->(y)")
    s
  }

  private def n(s: CypherSession, q: String): Long =
    s.cypher(q).collect().head.get(0).toString.toLong

  test("re-bound (x:parent ONLY) filters to the exact label, like the scan form") {
    val s = session()
    // scan forms: subtree = 2, ONLY = 1
    assert(n(s, "MATCH (x:parent) RETURN count(*) AS c") == 2)
    assert(n(s, "MATCH (x:parent ONLY) RETURN count(*) AS c") == 1)
    // re-bind forms must agree with the scan forms
    assert(n(s,
      "MATCH (x) WITH x MATCH (x:parent) RETURN count(*) AS c") == 2)
    assert(n(s,
      "MATCH (x) WITH x MATCH (x:parent ONLY) RETURN count(*) AS c") == 1)
  }

  test("re-bound hop target honors label and ONLY") {
    val s = session()
    // target y pre-bound without constraint, then constrained in the hop
    assert(n(s,
      "MATCH (y) WITH y MATCH (:parent)-[:e]->(y:parent) RETURN count(*) AS c") == 1)
    assert(n(s,
      "MATCH (y) WITH y MATCH (:parent)-[:e]->(y:parent ONLY) RETURN count(*) AS c") == 0)
  }

  test("VLE re-bound target applies its label constraint") {
    val s = session()
    assert(n(s,
      "MATCH (y) WITH y MATCH (:parent)-[:e*1..2]->(y:parent) RETURN count(*) AS c") == 1)
    assert(n(s,
      "MATCH (y) WITH y MATCH (:parent)-[:e*1..2]->(y:parent ONLY) RETURN count(*) AS c") == 0)
    // and with no label at all the pre-bound join is unconstrained
    assert(n(s,
      "MATCH (y) WITH y MATCH (:parent)-[:e*1..2]->(y) RETURN count(*) AS c") == 1)
  }
}
