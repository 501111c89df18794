package graft.cypher

import java.nio.file.Files
import graft.SparkTestBase
import graft.api.CypherSession
import graft.graph.GraphCatalog
import org.scalatest.funsuite.AnyFunSuite

/** `spark.graft.maxDepth`: the engine's pragmatic expansion cap
  * (default 64; the reference runs VLE unbounded, execGraphVle.c:33).
  * The cap must clamp deeper requests by default and lift when the
  * session raises the conf.
  */
class DepthCapSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  test("VLE past 64 hops needs a raised spark.graft.maxDepth") {
    val root = Files.createTempDirectory("graft_depth").toString
    val s = new CypherSession(spark, new GraphCatalog(spark, root))
    s.createGraph("deep")
    s.createVLabel("v"); s.createELabel("e")
    s.cypher("UNWIND range(0, 69) AS i CREATE (:v {n: i})")
    s.cypher(
      "MATCH (x:v), (y:v) WHERE y.n = x.n + 1 CREATE (x)-[:e]->(y)")
    val q =
      """MATCH (a:v {n: 0})-[es:e*69..69]->(b:v)
        |RETURN b.n AS n""".stripMargin
    // default cap 64 clamps the 69-hop request: no match
    assert(s.cypher(q).count() == 0)
    spark.conf.set("spark.graft.maxDepth", "80")
    try {
      assert(s.cypher(q).collect().map(_.getString(0)).toSeq == Seq("69"))
      // unbounded upper also reaches the chain's end under the raised cap
      val far = s.cypher(
        """MATCH (a:v {n: 0})-[es:e*65..]->(b:v)
          |RETURN count(*) AS c""".stripMargin).collect().head.getString(0)
      assert(far == "5") // lengths 65..69
    } finally spark.conf.unset("spark.graft.maxDepth")
  }
}
