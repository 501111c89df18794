package graft.cypher

import java.nio.file.Files
import graft.SparkTestBase
import graft.api.CypherSession
import graft.graph.GraphCatalog
import org.scalatest.funsuite.AnyFunSuite

/** DDL surface: constraints (cypher_ddl.sql:240-362 semantics) and the
  * graphmeta edge-statistics matrix (graphmeta.sql).
  */
class DdlSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  private def fresh(): CypherSession = {
    val root = Files.createTempDirectory("graft_ddl").toString
    new CypherSession(spark, new GraphCatalog(spark, root))
  }

  test("unique constraint rejects duplicates, within batch and across") {
    val s = fresh()
    s.createGraph("cg")
    s.createVLabel("u")
    s.catalog.addConstraint("cg", "u", "u_id_unique", "unique", "id")
    s.cypher("CREATE (:u {id: 1})")
    intercept[Exception] { s.cypher("CREATE (:u {id: 1})") }
    intercept[Exception] { s.cypher("UNWIND [9, 9] AS x CREATE (:u {id: x})") }
    s.cypher("CREATE (:u {id: 2})")
    assert(s.cypher("MATCH (n:u) RETURN n").count() == 2)
  }

  test("label and graph RENAME keep data, ids and inheritance (graphcmds RenameLabel/RenameGraph)") {
    val s = fresh()
    s.createGraph("rn")
    s.createVLabel("person")
    s.createVLabel("vip", parents = Seq("person"))
    s.cypher("CREATE (:person {name: 'p'}), (:vip {name: 'v'})")
    val idsBefore = s.cypher("MATCH (n:person) RETURN id(n) AS i ORDER BY i")
      .collect().map(_.getString(0)).toSeq
    // rename the parent: children's parent lists follow; subtree scans
    // and stored graphids are untouched
    s.renameLabel("person", "human")
    val after = s.cypher("MATCH (n:human) RETURN id(n) AS i ORDER BY i")
      .collect().map(_.getString(0)).toSeq
    assert(after == idsBefore) // same two vertices, same packed ids
    assert(s.catalog.label("rn", "vip").get.parents == Seq("human"))
    intercept[Exception] { s.cypher("MATCH (n:person) RETURN n").count() }
    // graph rename: session path follows, data intact
    s.renameGraph("rn", "rn2")
    assert(s.graphPath == "rn2")
    assert(s.cypher("MATCH (n:human) RETURN n").count() == 2)
    assert(!s.catalog.graphExists("rn"))
  }

  test("catalog views: labelsDf/graphsDf list the namespace (\\dG analog)") {
    val s = fresh()
    s.createGraph("cat")
    s.createVLabel("a"); s.createVLabel("b", parents = Seq("a"))
    s.createELabel("e")
    val ls = s.catalog.labelsDf("cat")
      .collect().map(r => (r.getString(0), r.getString(2))).toSet
    assert(ls.contains(("a", "v")) && ls.contains(("b", "v")) &&
      ls.contains(("e", "e")))
    val parents = s.catalog.labelsDf("cat").where("labname = 'b'")
      .select("parents").collect().head.getSeq[String](0)
    assert(parents == Seq("a"))
    assert(s.catalog.graphsDf().collect().map(_.getString(0)).contains("cat"))
  }

  test("check constraint validates expressions over new rows") {
    val s = fresh()
    s.createGraph("cg2")
    s.createVLabel("p")
    s.catalog.addConstraint("cg2", "p", "p_age_pos", "check", "age > 0 AND age < 150")
    s.cypher("CREATE (:p {age: 42})")
    intercept[Exception] { s.cypher("CREATE (:p {age: -1})") }
    intercept[Exception] { s.cypher("CREATE (:p {age: 200})") }
    assert(s.cypher("MATCH (n:p) RETURN n").count() == 1)
  }

  test("unique constraint applies to inheritance subtree") {
    val s = fresh()
    s.createGraph("cg3")
    s.createVLabel("base")
    s.createVLabel("child", parents = Seq("base"))
    s.catalog.addConstraint("cg3", "base", "b_k", "unique", "k")
    s.cypher("CREATE (:base {k: 1})")
    intercept[Exception] { s.cypher("CREATE (:child {k: 1})") }
  }

  test("graphmeta edge-count matrix tracks writes") {
    val s = fresh()
    s.createGraph("gm")
    s.createVLabel("human"); s.createVLabel("dog")
    s.createELabel("know"); s.createELabel("likes")
    s.cypher("CREATE (:human {name: 'a'})-[:know]->(:human {name: 'b'})")
    s.cypher("MATCH (a:human {name: 'a'}) CREATE (a)-[:likes]->(:dog {name: 'r'})")
    val m1 = s.catalog.graphmeta("gm").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2), r.getLong(3))).toSet
    assert(m1 == Set(
      ("human", "know", "human", 1L),
      ("human", "likes", "dog", 1L)))
    s.cypher("MATCH (:human)-[e:know]->(:human) DELETE e")
    val m2 = s.catalog.graphmeta("gm").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2), r.getLong(3))).toSet
    assert(m2 == Set(("human", "likes", "dog", 1L)))
  }
}
