package graft.cypher

import graft.SparkTestBase
import graft.api.CypherSession
import graft.graph.GraphCatalog
import org.scalatest.funsuite.AnyFunSuite

/** Statement-validity matrix ported from cypher_dml.out: the CREATE /
  * MATCH shapes the reference REJECTS must be rejected here too, with
  * the same diagnostics, and the legal odd shapes must run.
  */
class DmlValiditySpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  private def fresh(): CypherSession = {
    val root = java.nio.file.Files.createTempDirectory("graft_dmlv").toString
    val s = new CypherSession(spark, new GraphCatalog(spark, root))
    s.createGraph("v")
    s.createVLabel("repo"); s.createELabel("lib"); s.createELabel("doc")
    s
  }
  lazy val s = fresh()

  private def err(q: String): String =
    intercept[Exception](s.cypher(q).collect()).getMessage

  test("CREATE rejections (cypher_dml.out:~60-90)") {
    assert(err("CREATE ()-[a:lib]->(a)").contains("duplicate variable \"a\""))
    assert(err("CREATE a=(), (a)").contains("duplicate variable \"a\""))
    assert(err("CREATE (a), (a {})").contains("duplicate variable \"a\""))
    assert(err("CREATE (a), (a)").contains("there must be at least one relationship"))
    assert(err("CREATE ()-[]-()").contains("only directed relationships are allowed in CREATE"))
    assert(err("CREATE ()-[]->()").contains("only one relationship type is allowed for CREATE"))
    assert(err("CREATE ()-[:lib|doc]->()").contains("only one relationship type is allowed for CREATE"))
    assert(err("CREATE (a)-[a:lib]->()").contains("duplicate variable \"a\""))
    assert(err("CREATE ()-[a:lib]->()-[a:doc]->()").contains("duplicate variable \"a\""))
    assert(err("CREATE a=(), ()-[a:doc]->()").contains("duplicate variable \"a\""))
    assert(err("CREATE (a), a=()").contains("duplicate variable \"a\""))
    assert(err("CREATE ()-[a:lib]->(), a=()").contains("duplicate variable \"a\""))
    assert(err("CREATE a=(), a=()").contains("duplicate variable \"a\""))
    assert(err("CREATE (:lib)").contains("is edge label"))
    assert(err("CREATE ()-[:repo]->()").contains("is vertex label"))
    assert(err("CREATE (:ag_vertex)").contains("specifying default label is not allowed"))
    assert(err("CREATE ()-[:ag_edge]->()").contains("cannot create edge on default label"))
    // property map must evaluate to an object (runtime check)
    assert(err("CREATE (=0)").contains("jsonb object is expected for property map"))
    assert(err("CREATE ()-[:lib =0]->()").contains("jsonb object is expected for property map"))
    // NULL property maps fold to {} (legal; cypher_dml.sql:56)
    s.cypher("CREATE (=null)-[:lib =null]->()")
    val n = s.cypher("MATCH ()-[r:lib]->() RETURN count(*) AS n")
      .collect()(0).getString(0)
    assert(n == "1")
  }

  test("within-path labeled/propertied vertex re-reference is duplicate (transformCreateNode findTarget)") {
    // a same-statement re-reference carrying a label or props is
    // "duplicate variable" even inside ONE path — parse_graph.c's
    // findTarget scans the whole statement targetList; only the bare
    // connect-to-existing form may repeat
    assert(err("CREATE (a {x:1})-[:lib]->(a {y:2})").contains("duplicate variable \"a\""))
    assert(err("CREATE (a)-[:lib]->(a:repo)").contains("duplicate variable \"a\""))
    assert(err("CREATE (a)-[:lib]->(a {})").contains("duplicate variable \"a\""))
    // bare re-reference closes the triangle onto the SAME new vertex
    val t = fresh()
    t.cypher("CREATE (a {x:1})-[:lib]->({y:2})-[:doc]->(a)")
    val n = t.cypher("MATCH (a)-[:lib]->()-[:doc]->(a) RETURN count(*) AS n")
      .collect()(0).getString(0)
    assert(n == "1")
  }

  test("cross-element unique violation within one statement is caught pre-append") {
    // two pattern ELEMENTS with the same key: no single element's batch
    // repeats it and nothing has appended yet — the statement-level
    // check must still see the union (the reference sees it because
    // each insert consults the index the previous insert updated)
    val t = fresh()
    t.createVLabel("ux")
    t.cypher("CREATE CONSTRAINT ON ux ASSERT id IS UNIQUE")
    intercept[Exception] {
      t.cypher("CREATE (:ux {id: 3}), (:ux {id: 3})").collect()
    }
    intercept[Exception] {
      t.cypher("CREATE (:ux {id: 4})-[:lib]->(:ux {id: 4})").collect()
    }
    assert(t.cypher("MATCH (n:ux) RETURN count(*) AS n")
      .collect()(0).getString(0) == "0")
    // subtree variant: parent + child share the ancestor's constraint
    t.createVLabel("uxc", parents = Seq("ux"))
    intercept[Exception] {
      t.cypher("CREATE (:ux {id: 5}), (:uxc {id: 5})").collect()
    }
    assert(t.cypher("MATCH (n:ux) RETURN count(*) AS n")
      .collect()(0).getString(0) == "0")
    t.cypher("CREATE (:ux {id: 6}), (:uxc {id: 7})") // distinct keys pass
    assert(t.cypher("MATCH (n:ux) RETURN count(*) AS n")
      .collect()(0).getString(0) == "2")
  }

  test("MERGE pattern rules apply even when every row matches (transformMergeRel)") {
    val t = fresh()
    // seed so the invalid pattern WOULD fully match: validation must
    // fire anyway, not only on the create branch
    t.cypher("CREATE (a {x: 1})-[:lib]->({y: 2})")
    def terr(q: String): String =
      intercept[Exception](t.cypher(q).collect()).getMessage
    assert(terr("MERGE (a {x:1})-[:lib]->(a {y:2})")
      .contains("duplicate variable \"a\""))
    assert(terr("MERGE (a)-[:lib|doc]->(b)")
      .contains("only one relationship type is allowed for MERGE"))
    assert(terr("MERGE (a)-[:lib]-(b)")
      .contains("only directed relationships are allowed in MERGE"))
  }

  test("constraint violation on a later label leaves earlier labels unwritten") {
    // checks run as a separate pass BEFORE any append: a CHECK
    // violation on the second label must not leave the first label's
    // rows durably appended (statement-level atomicity)
    val t = fresh()
    t.createVLabel("cv1"); t.createVLabel("cv2")
    t.cypher("CREATE CONSTRAINT ON cv2 ASSERT x IS NOT NULL")
    intercept[Exception] {
      t.cypher("CREATE (:cv1 {n:1})-[:lib]->(:cv2 {y:2})").collect()
    }
    assert(t.cypher("MATCH (a:cv1) RETURN count(*) AS n")
      .collect()(0).getString(0) == "0")
    assert(t.cypher("MATCH ()-[r:lib]->() RETURN count(*) AS n")
      .collect()(0).getString(0) == "0")
  }

  test("MATCH rejections + legal odd shapes (cypher_dml.out:~95-115)") {
    assert(err("MATCH ()-[a]-(), (a) RETURN *").contains("duplicate variable \"a\""))
    assert(err("MATCH a=(), (a) RETURN *").contains("duplicate variable \"a\""))
    assert(err("MATCH ()-[a]-(a) RETURN *").contains("duplicate variable \"a\""))
    assert(err("MATCH ()-[a]-()-[a]-() RETURN *").contains("duplicate variable \"a\""))
    assert(err("MATCH a=(), ()-[a]-() RETURN *").contains("duplicate variable \"a\""))
    assert(err("MATCH (a), a=() RETURN *").contains("duplicate variable \"a\""))
    assert(err("MATCH ()-[a]->(), a=() RETURN *").contains("duplicate variable \"a\""))
    assert(err("MATCH a=(), a=() RETURN *").contains("duplicate variable \"a\""))
    assert(err("MATCH (:lib) RETURN *").contains("is edge label"))
    assert(err("MATCH ()-[:repo]->() RETURN *").contains("is vertex label"))
    assert(err("MATCH (x:nosuch) RETURN *").contains("does not exist"))
    // legal: vertex var re-match is a join; (a =0) matches nothing
    assert(s.cypher("MATCH (a), (a) RETURN count(*) AS n").count() == 1)
    assert(s.cypher("MATCH (a =0) RETURN a").count() == 0)
  }

  test("WITH/LOAD/endpoint shapes from cypher_dml tail") {
    val t = fresh()
    t.cypher("CREATE (:repo {name:'a'})-[:lib {lang:'c'}]->(:repo {name:'b'})")
    t.cypher("CREATE (:repo {name:'x'})-[:doc {lang:'en'}]->(:repo {name:'y'})")
    def terr(q: String): String =
      intercept[Exception](t.cypher(q).collect()).getMessage
    // WITH items must be aliased (parse_cypher_expr.c)
    assert(terr("MATCH (a) WITH a.name RETURN *")
      .contains("expression in WITH must be aliased"))
    // LOAD FROM cannot rebind (cypher_dml.sql "LOAD FROM history AS a")
    assert(terr("MATCH (a) LOAD FROM history_missing AS a RETURN *")
      .contains("duplicate variable \"a\""))
    // DELETE of a vertex-valued EXPRESSION (vertices(p)[i], endpoint fns)
    t.cypher("MATCH p=()-[:lib]->() DETACH DELETE (vertices(p))[1]")
    assert(t.cypher("MATCH (v:repo) RETURN count(*) AS n")
      .collect()(0).getString(0) == "3")
    t.cypher("MATCH ()-[a:doc]->() DETACH DELETE end_vertex(a)")
    assert(t.cypher("MATCH (v:repo) RETURN count(*) AS n")
      .collect()(0).getString(0) == "2")
  }

  test("intra-CREATE references and path variables (cypher_dml.sql:60-66)") {
    val t = fresh()
    t.cypher("CREATE (a {name:'agens'}), (b {name:a.name})")
    val names = t.cypher("MATCH (x) RETURN x.name AS n ORDER BY n")
      .collect().map(_.getString(0)).toSeq
    assert(names == Seq("\"agens\"", "\"agens\""))
    val l = t.cypher("CREATE p=()-[:lib]->() RETURN length(p) AS l")
      .collect()(0).getString(0)
    assert(l == "1")
  }
}
