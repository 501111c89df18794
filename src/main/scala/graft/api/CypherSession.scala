package graft.api

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.cypher.{Builder, Parser}
import graft.graph.GraphCatalog
import graft.jsonb._

/** Public entry point: a session over a GraphCatalog with a current
  * graph (`SET graph_path` analog — check_graph_path guc.c:4670) and
  * `cypher(query, params) -> DataFrame` (SURVEY §3.3: results register
  * as temp views for SQL interop; LOAD pulls Spark tables in).
  */
final class CypherSession(
    val spark: SparkSession,
    val catalog: GraphCatalog,
    private var currentGraph: String = null) {

  def setGraphPath(g: String): Unit = {
    require(catalog.graphExists(g), s"graph \"$g\" does not exist")
    currentGraph = g
  }
  def graphPath: String = currentGraph

  // DDL ------------------------------------------------------------
  def createGraph(name: String, ifNotExists: Boolean = false): Unit = {
    catalog.createGraph(name, ifNotExists)
    // implicit base vertex label: unlabeled CREATE (n) targets it
    // (the ag_vertex base table of the reference, ag_vertex.h:29-33)
    if (catalog.graphExists(name) && catalog.label(name, "ag_vertex").isEmpty)
      catalog.createLabel(name, "ag_vertex", 'v', Nil, ifNotExists = true)
    if (currentGraph == null) currentGraph = name
  }
  def dropGraph(name: String, ifExists: Boolean = false): Unit =
    catalog.dropGraph(name, ifExists)
  def createVLabel(name: String, parents: Seq[String] = Nil,
      ifNotExists: Boolean = false): Unit =
    catalog.createLabel(currentGraph, name, 'v', parents, ifNotExists)
  def createELabel(name: String, parents: Seq[String] = Nil,
      ifNotExists: Boolean = false): Unit =
    catalog.createLabel(currentGraph, name, 'e', parents, ifNotExists)

  /** Run a Cypher statement; returns the final clause's DataFrame. */
  def cypher(query: String, params: Map[String, Any] = Map.empty): DataFrame = {
    require(currentGraph != null, "no graph selected (setGraphPath)")
    val ast = Parser.parse(query)
    val b = new Builder(spark, catalog, currentGraph, params.map {
      case (k, v) => k -> toJValue(v)
    }, name => spark.table(name))
    lastBuilder = b
    b.run(ast)
  }

  @volatile private var lastBuilder: Builder = null

  /** Hybrid SQL with embedded Cypher subqueries (SURVEY §3.3):
    * `SELECT ... FROM (MATCH ... RETURN ...) t ...` (cypher-in-FROM,
    * reference gram.y:12369-12399) and
    * `... WHERE EXISTS (MATCH ... RETURN ...)` (EXISTS sublink,
    * gram.y:14110-14125). Each parenthesized `(MATCH ...)` block is
    * compiled by the Cypher engine, registered as a temp view, and the
    * SQL re-runs through Spark — one logical plan end to end, like the
    * reference's single Query tree. Correlated sublinks are not
    * supported (document: uncorrelated EXISTS only).
    */
  def sql(query: String): DataFrame = {
    val s = query
    val out = new StringBuilder
    var i = 0
    var n = 0
    def skipString(from: Int): Int = { // past the closing quote ('' escapes)
      var k = from + 1
      while (k < s.length) {
        if (s.charAt(k) == '\'') {
          if (k + 1 < s.length && s.charAt(k + 1) == '\'') k += 2
          else return k + 1
        } else k += 1
      }
      k
    }
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\'') {
        val e = skipString(i); out.append(s.substring(i, e)); i = e
      } else if (c == '(') {
        var j = i + 1
        while (j < s.length && s.charAt(j).isWhitespace) j += 1
        if (s.regionMatches(true, j, "MATCH", 0, 5)) {
          var depth = 1
          var k = i + 1
          while (k < s.length && depth > 0) {
            s.charAt(k) match {
              case '(' => depth += 1; k += 1
              case ')' => depth -= 1; k += 1
              case '\'' => k = skipString(k)
              case _ => k += 1
            }
          }
          val inner = s.substring(i + 1, k - 1)
          val view = s"__cypher_sub_$n"; n += 1
          cypher(inner).createOrReplaceTempView(view)
          val isExists = out.toString.replaceAll("\\s+$", "")
            .toUpperCase.endsWith("EXISTS")
          if (isExists) out.append(s"(SELECT * FROM $view)")
          else out.append(view)
          i = k
        } else { out.append(c); i += 1 }
      } else { out.append(c); i += 1 }
    }
    spark.sql(out.toString)
  }

  /** get_last_graph_write_stats() (cypher_funcs.c:1185). */
  def lastWriteStats: Map[String, Long] = Option(lastBuilder).map { b =>
    Map(
      "insertedvertices" -> b.insertedVertices,
      "insertededges" -> b.insertedEdges,
      "updatedproperties" -> b.updatedProperties,
      "deletedvertices" -> b.deletedVertices,
      "deletededges" -> b.deletedEdges)
  }.getOrElse(Map.empty)

  private def toJValue(v: Any): JValue = v match {
    case null => JNull
    case j: JValue => j
    case s: String => JStr(s)
    case b: Boolean => JBool(b)
    case i: Int => JNum(java.math.BigDecimal.valueOf(i.toLong))
    case l: Long => JNum(java.math.BigDecimal.valueOf(l))
    case d: Double => JNum(new java.math.BigDecimal(d.toString))
    case bd: BigDecimal => JNum(bd.bigDecimal)
    case seq: Seq[_] => JArr(seq.map(toJValue).toVector)
    case m: Map[_, _] =>
      Jsonb.mkObj(m.toSeq.map { case (k, x) => k.toString -> toJValue(x) })
    case other => throw new IllegalArgumentException(
      s"unsupported parameter type: ${other.getClass}")
  }
}
