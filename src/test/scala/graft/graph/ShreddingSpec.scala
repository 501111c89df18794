package graft.graph

import java.nio.file.Files
import graft.SparkTestBase
import graft.api.CypherSession
import org.scalatest.funsuite.AnyFunSuite

/** Property-shredding edge cases: the sidecar columns must be
  * impossible to observe semantically — every query answers exactly as
  * the jsonb fallback path would, whatever the key/type history of the
  * label.
  */
class ShreddingSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  private def freshSession(): CypherSession = {
    val root = Files.createTempDirectory("graft_shred").toString
    val s = new CypherSession(spark, new GraphCatalog(spark, root))
    s.createGraph("sg")
    s
  }

  private def strings(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.getString(0)).toSeq

  test("uniform numeric key: typed sidecar + predicate parity") {
    val s = freshSession()
    s.createVLabel("m")
    s.cypher("CREATE (:m {x: 1}), (:m {x: 2.5}), (:m {x: 30})")
    val lm = s.catalog.label("sg", "m").get
    assert(lm.shred("x") == "n")
    val scan = s.catalog.scanOnly("sg", "m")
    assert(scan.columns.contains("__pj_x"))
    assert(scan.columns.contains("__pn_x"))
    assert(strings(s.cypher("MATCH (a:m) WHERE a.x > 1.5 RETURN a.x ORDER BY a.x"))
      == Seq("2.5", "30"))
    // equality across display scales: 2.5 == 2.50 numerically
    assert(s.cypher("MATCH (a:m) WHERE a.x = 2.50 RETURN a").count() == 1)
  }

  test("type conflict across appends degrades to jsonb-text sidecar") {
    val s = freshSession()
    s.createVLabel("c")
    s.cypher("CREATE (:c {v: 10})")
    assert(s.catalog.label("sg", "c").get.shred("v") == "n")
    s.cypher("CREATE (:c {v: 'ten'})")
    assert(s.catalog.label("sg", "c").get.shred("v") == "j")
    val scan = s.catalog.scanOnly("sg", "c")
    assert(scan.columns.contains("__pj_v") && !scan.columns.contains("__pn_v"))
    // mixed-type comparison follows jsonb type-rank order (number >
    // string in PG jsonb btree order): both rows sort below any number
    assert(s.cypher("MATCH (a:c) WHERE a.v > 9999 RETURN a").count() == 0)
    assert(s.cypher("MATCH (a:c) WHERE a.v < 9999 RETURN a").count() == 2)
    assert(strings(s.cypher("MATCH (a:c) WHERE a.v = 'ten' RETURN a.v")) ==
      Seq("\"ten\""))
  }

  test("absent keys and json-null values behave like the fallback path") {
    val s = freshSession()
    s.createVLabel("n")
    s.cypher("CREATE (:n {a: 1}), (:n {b: 2}), (:n {a: 3, b: 4})")
    // rows lacking `a` read null sidecars -> excluded by any comparison
    assert(s.cypher("MATCH (x:n) WHERE x.a >= 1 RETURN x").count() == 2)
    assert(s.cypher("MATCH (x:n) WHERE x.a IS NULL RETURN x").count() == 1)
    assert(s.cypher("MATCH (x:n) WHERE x.b = 2 RETURN x").count() == 1)
  }

  test("inheritance subtree aligns sidecars across member labels") {
    val s = freshSession()
    s.createVLabel("base")
    s.createVLabel("kid", parents = Seq("base"))
    s.cypher("CREATE (:base {p: 1})")
    s.cypher("CREATE (:kid {p: 2, extra: 'e'})")
    // subtree scan: `p` shredded in both; `extra` only in kid (base
    // contributes typed nulls)
    assert(s.cypher("MATCH (x:base) WHERE x.p > 0 RETURN x").count() == 2)
    assert(s.cypher("MATCH (x:base) WHERE x.extra = 'e' RETURN x").count() == 1)
    assert(s.cypher("MATCH (x:ONLY base) WHERE x.p > 0 RETURN x").count() == 1)
  }

  test("non-identifier keys are not shredded but stay queryable") {
    val s = freshSession()
    s.createVLabel("w")
    s.cypher("CREATE (:w {`weird key!`: 5, ok: 6})")
    val lm = s.catalog.label("sg", "w").get
    assert(!lm.shred.contains("weird key!"))
    assert(lm.shred("ok") == "n")
    assert(s.cypher("MATCH (x:w) WHERE x.`weird key!` = 5 RETURN x").count() == 1)
  }

  test("string predicates (STARTS WITH) run on the raw-string sidecar") {
    val s = freshSession()
    s.createVLabel("t")
    s.cypher("CREATE (:t {name: 'alpha'}), (:t {name: 'beta'})")
    assert(s.catalog.label("sg", "t").get.shred("name") == "s")
    assert(strings(s.cypher(
      "MATCH (x:t) WHERE x.name STARTS WITH 'al' RETURN x.name")) ==
      Seq("\"alpha\""))
  }

  test("labels exceeding the key cap disable shredding but stay correct") {
    val s = freshSession()
    s.createVLabel("big")
    val props = (1 to 40).map(i => s"k$i: $i").mkString(", ")
    s.cypher(s"CREATE (:big {$props})")
    val lm = s.catalog.label("sg", "big").get
    assert(lm.shredOff)
    assert(!s.catalog.scanOnly("sg", "big").columns.exists(_.startsWith("__p")))
    assert(s.cypher("MATCH (x:big) WHERE x.k7 = 7 RETURN x").count() == 1)
  }

  test("shred-key discovery never collects more than the cap (r12 item 2)") {
    // a write batch with machine-generated keys (k_000001..., common in
    // scraped/LLM corpora) may hold millions of distinct keys; the
    // classify agg's driver collect is hard-bounded at ShredMaxKeys + 1
    // rows, and hitting the bound routes callers to shredOff — same
    // decision, O(cap) driver memory on the 100-TB ingest path
    val s = freshSession()
    import spark.implicits._
    val df = (1 to 500)
      .map(i => f"""{"k_$i%06d": $i}""").toDF("properties")
    val types = s.catalog.batchKeyTypes(df)
    assert(types.size == 33, s"collect must cap at ShredMaxKeys+1, got ${types.size}")
    // end to end: the capped discovery still disables shredding
    s.createVLabel("wide")
    val props = (1 to 64).map(i => s"g_$i: $i").mkString(", ")
    s.cypher(s"CREATE (:wide {$props})")
    assert(s.catalog.label("sg", "wide").get.shredOff)
    assert(s.cypher("MATCH (x:wide) WHERE x.g_33 = 33 RETURN x").count() == 1)
  }

  test("edge properties shred too: predicates use the typed sidecar") {
    val s = freshSession()
    s.createVLabel("v")
    s.createELabel("e")
    s.cypher("CREATE (:v {n: 1}), (:v {n: 2})")
    s.cypher("MATCH (a:v {n: 1}), (b:v {n: 2}) CREATE (a)-[:e {w: 10}]->(b)")
    s.cypher("MATCH (a:v {n: 2}), (b:v {n: 1}) CREATE (a)-[:e {w: 99}]->(b)")
    assert(s.catalog.label("sg", "e").get.shred("w") == "n")
    val out = s.cypher(
      "MATCH (a)-[r:e]->(b) WHERE r.w > 50 RETURN r.w AS w")
    assert(out.collect().map(_.getString(0)).toSeq == Seq("99"))
  }

  test("SET invalidates sidecars: post-write reads see fresh values") {
    val s = freshSession()
    s.createVLabel("u")
    s.cypher("CREATE (:u {k: 1})")
    val out = s.cypher(
      "MATCH (x:u) SET x.k = 100 WITH x MATCH (y:u) WHERE y.k = 100 RETURN y.k")
    assert(strings(out) == Seq("100"))
    // and a fresh scan sees the re-shredded table
    assert(s.cypher("MATCH (x:u) WHERE x.k > 50 RETURN x").count() == 1)
  }
}
