package graft.cypher

import java.nio.file.Files
import graft.SparkTestBase
import graft.api.CypherSession
import graft.graph.GraphCatalog
import org.scalatest.funsuite.AnyFunSuite

/** `spark.graft.maxDepth`: the engine's pragmatic expansion cap
  * (default 64; the reference runs VLE unbounded, execGraphVle.c:33).
  * A request the cap would TRUNCATE — an upper bound past the cap, or
  * an unbounded pattern whose expansion still extends at the cap —
  * raises a loud depth-exceeded error instead of silently dropping
  * paths; raising the conf lifts the cap. Patterns that exhaust below
  * the cap never pay or see any of this.
  */
class DepthCapSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  private def chainSession(n: Int): CypherSession = {
    val root = Files.createTempDirectory("graft_depth").toString
    val s = new CypherSession(spark, new GraphCatalog(spark, root))
    s.createGraph("deep")
    s.createVLabel("v"); s.createELabel("e")
    s.cypher(s"UNWIND range(0, ${n - 1}) AS i CREATE (:v {n: i})")
    s.cypher(
      "MATCH (x:v), (y:v) WHERE y.n = x.n + 1 CREATE (x)-[:e]->(y)")
    s
  }

  test("VLE past 64 hops needs a raised spark.graft.maxDepth") {
    val s = chainSession(70)
    val q =
      """MATCH (a:v {n: 0})-[es:e*69..69]->(b:v)
        |RETURN b.n AS n""".stripMargin
    // default cap 64 cannot serve the 69-hop request: loud error, not
    // a silent empty result
    val e = intercept[IllegalStateException] { s.cypher(q).count() }
    assert(e.getMessage.contains("maxDepth"), e.getMessage)
    spark.conf.set("spark.graft.maxDepth", "80")
    try {
      assert(s.cypher(q).collect().map(_.getString(0)).toSeq == Seq("69"))
      // unbounded upper also reaches the chain's end under the raised
      // cap — and exhausts there, so no depth error fires
      val far = s.cypher(
        """MATCH (a:v {n: 0})-[es:e*65..]->(b:v)
          |RETURN count(*) AS c""".stripMargin).collect().head.getString(0)
      assert(far == "5") // lengths 65..69
    } finally spark.conf.unset("spark.graft.maxDepth")
  }

  test("unbounded VLE on a 100-edge chain: loud depth-exceeded, lifted by the conf") {
    val s = chainSession(101) // 100 edges end to end
    val q =
      """MATCH (a:v {n: 0})-[es:e*..]->(b:v {n: 100})
        |RETURN count(*) AS c""".stripMargin
    // at the default cap the expansion still extends at depth 64:
    // the truncation is an error the user can act on
    val e = intercept[IllegalStateException] { s.cypher(q).count() }
    assert(e.getMessage.contains("depth cap 64"), e.getMessage)
    spark.conf.set("spark.graft.maxDepth", "120")
    try {
      assert(s.cypher(q).collect().head.getString(0) == "1")
    } finally spark.conf.unset("spark.graft.maxDepth")
  }

  test("patterns that exhaust below the cap see no depth error") {
    val s = chainSession(10)
    val c = s.cypher(
      """MATCH (a:v {n: 0})-[es:e*..]->(b:v)
        |RETURN count(*) AS c""".stripMargin).collect().head.getString(0)
    assert(c == "9")
  }
}
