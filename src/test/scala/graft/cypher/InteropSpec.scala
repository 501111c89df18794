package graft.cypher

import java.nio.file.Files
import graft.SparkTestBase
import graft.api.CypherSession
import graft.graph.GraphCatalog
import org.scalatest.funsuite.AnyFunSuite

/** SQL ⇄ Cypher hybrid surface (SURVEY §3.3): Cypher results are
  * DataFrames (register as views for SQL), SQL tables enter Cypher via
  * LOAD FROM — one engine, no runtime boundary.
  */
class InteropSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  private lazy val s: CypherSession = {
    val root = Files.createTempDirectory("graft_interop").toString
    val ses = new CypherSession(spark, new GraphCatalog(spark, root))
    ses.createGraph("ig")
    ses.createVLabel("city")
    ses.createELabel("road")
    ses.createELabel("rail")
    ses.cypher(
      """CREATE (:city {name: 'a', pop: 10}), (:city {name: 'b', pop: 20}),
        |       (:city {name: 'c', pop: 30})""".stripMargin)
    ses.cypher("MATCH (x:city {name: 'a'}), (y:city {name: 'b'}) CREATE (x)-[:road {km: 5}]->(y)")
    ses.cypher("MATCH (x:city {name: 'b'}), (y:city {name: 'c'}) CREATE (x)-[:rail {km: 7}]->(y)")
    ses
  }

  test("Cypher result as SQL table (cypher-in-FROM analog)") {
    import graft.expr.J
    import org.apache.spark.sql.functions.col
    s.cypher("MATCH (c:city) RETURN c.name AS name, c.pop AS pop")
      .select(J.asText(col("name")).as("name"), J.toLong(col("pop")).as("pop"))
      .createOrReplaceTempView("cities")
    val out = spark.sql(
      "SELECT name FROM cities WHERE pop > 15 ORDER BY name").collect()
    assert(out.map(_.getString(0)).toSeq == Seq("b", "c"))
  }

  test("SQL table into Cypher via LOAD FROM (rowid analog)") {
    import spark.implicits._
    Seq(("a", "alpha"), ("c", "gamma")).toDF("key", "word")
      .createOrReplaceTempView("aliases")
    val out = s.cypher(
      """LOAD FROM aliases AS al
        |MATCH (c:city) WHERE c.name = al.key
        |RETURN al.word AS word ORDER BY word""".stripMargin)
    assert(out.collect().map(_.getString(0)).toSeq ==
      Seq("\"alpha\"", "\"gamma\""))
  }

  test("multi-type relationship alternation [:road|rail]") {
    val out = s.cypher(
      """MATCH (x:city)-[e:road|rail]->(y:city)
        |RETURN x.name AS x, y.name AS y, e.km AS km ORDER BY km""".stripMargin)
    assert(out.collect().map(r => (r.getString(0), r.getString(1), r.getString(2))).toSeq ==
      Seq(("\"a\"", "\"b\"", "5"), ("\"b\"", "\"c\"", "7")))
  }

  test("type(e) distinguishes edge labels") {
    val out = s.cypher(
      """MATCH ()-[e]->() RETURN type(e) AS t ORDER BY t""")
    assert(out.collect().map(_.getString(0)).toSeq ==
      Seq("\"rail\"", "\"road\""))
  }

  test("hybrid sql(): cypher subquery in FROM (gram.y:12369-12399)") {
    val out = s.sql(
      """SELECT name, pop FROM
        |  (MATCH (c:city) RETURN c.name AS name, c.pop AS pop) t
        |WHERE CAST(pop AS INT) > 15 ORDER BY name""".stripMargin)
    assert(out.collect().map(_.getString(0)).toSeq ==
      Seq("\"b\"", "\"c\""))
  }

  test("hybrid sql(): EXISTS (MATCH ...) sublink (gram.y:14110-14125)") {
    import spark.implicits._
    Seq(1, 2).toDF("v").createOrReplaceTempView("two_rows")
    val hit = s.sql(
      """SELECT v FROM two_rows
        |WHERE EXISTS (MATCH (c:city {name: 'a'}) RETURN c) ORDER BY v""".stripMargin)
    assert(hit.collect().map(_.getInt(0)).toSeq == Seq(1, 2))
    val miss = s.sql(
      """SELECT v FROM two_rows
        |WHERE EXISTS (MATCH (c:city {name: 'zzz'}) RETURN c)""".stripMargin)
    assert(miss.count() == 0)
  }

  test("hybrid sql(): correlated EXISTS sublink on property equality") {
    import spark.implicits._
    Seq(("a", 1), ("b", 2), ("zzz", 3)).toDF("cname", "v")
      .createOrReplaceTempView("corr_names")
    // cities a, b, c exist -> rows a and b survive, zzz doesn't
    val out = s.sql(
      """SELECT v FROM corr_names t
        |WHERE EXISTS (MATCH (c:city) WHERE c.name = t.cname RETURN c)
        |ORDER BY v""".stripMargin)
    assert(out.collect().map(_.getInt(0)).toSeq == Seq(1, 2))
  }

  test("hybrid sql(): correlated EXISTS with inequality + graph-only conjunct") {
    import spark.implicits._
    Seq(5L, 15L, 25L).toDF("minpop").createOrReplaceTempView("corr_pops")
    // cities with pop > minpop AND name <> 'c' -> pops 10, 20 qualify
    // for minpop 5 and 15; for 25 only city c (pop 30) exceeds, but the
    // graph-only conjunct excludes it
    val out = s.sql(
      """SELECT minpop FROM corr_pops t
        |WHERE EXISTS (MATCH (c:city) WHERE c.pop > t.minpop AND NOT c.name = 'c' RETURN c)
        |ORDER BY minpop""".stripMargin)
    assert(out.collect().map(_.getLong(0)).toSeq == Seq(5L, 15L))
  }

  test("monotone correlated EXISTS collapses to a broadcast scalar aggregate") {
    import spark.implicits._
    Seq(5L, 15L, 25L, 30L).toDF("minpop").createOrReplaceTempView("mono_pops")
    // single-inequality sublink: EXISTS(c.pop > t.minpop) == max(pop) >
    // t.minpop — max pop is 30, so strict > keeps 5/15/25 and drops 30
    val df = s.sql(
      """SELECT minpop FROM mono_pops t
        |WHERE EXISTS (MATCH (c:city) WHERE c.pop > t.minpop RETURN c)
        |ORDER BY minpop""".stripMargin)
    assert(df.collect().map(_.getLong(0)).toSeq == Seq(5L, 15L, 25L))
    // the plan is the scalar-aggregate shape (one uncorrelated max_by
    // + a 1-row comparison), not a per-row semi-join over the view
    val plan = df.queryExecution.optimizedPlan.toString
    assert(plan.contains("max_by"), plan)
    // non-strict boundary keeps minpop = 30
    assert(s.sql(
      """SELECT minpop FROM mono_pops t
        |WHERE EXISTS (MATCH (c:city) WHERE c.pop >= t.minpop RETURN c)"""
        .stripMargin).count() == 4)
    // < uses the MIN side: min pop is 10 -> minpop in {15, 25, 30}
    assert(s.sql(
      """SELECT minpop FROM mono_pops t
        |WHERE EXISTS (MATCH (c:city) WHERE c.pop < t.minpop RETURN c)"""
        .stripMargin).count() == 3)
    // flipped literal-first spelling normalizes through the same door
    assert(s.sql(
      """SELECT minpop FROM mono_pops t
        |WHERE EXISTS (MATCH (c:city) WHERE t.minpop < c.pop RETURN c)
        |ORDER BY minpop""".stripMargin)
      .collect().map(_.getLong(0)).toSeq == Seq(5L, 15L, 25L))
    // graph-only conjunct emptying the view: aggregate is NULL, EXISTS
    // is false everywhere (never true-by-vacuity)
    assert(s.sql(
      """SELECT minpop FROM mono_pops t
        |WHERE EXISTS (MATCH (c:city) WHERE c.pop > t.minpop AND c.name = 'zzz' RETURN c)"""
        .stripMargin).count() == 0)
    // NULL outer operand: the jsonb comparison against the extremum is
    // NULL, so EXISTS is false for that row — same as the general
    // decorrelated path (a NULL satisfies no comparison in either form)
    spark.sql("SELECT * FROM VALUES (5L), (CAST(NULL AS BIGINT)) v(minpop)")
      .createOrReplaceTempView("mono_pops_null")
    assert(s.sql(
      """SELECT minpop FROM mono_pops_null t
        |WHERE EXISTS (MATCH (c:city) WHERE c.pop > t.minpop RETURN c)"""
        .stripMargin).collect().map(_.getLong(0)).toSeq == Seq(5L))
  }

  test("hybrid sql(): string literals containing MATCH stay literal") {
    val out = s.sql("SELECT '(MATCH literal)' AS x")
    assert(out.collect().head.getString(0) == "(MATCH literal)")
  }

  test("hybrid sql(): identifiers starting with MATCH are not Cypher blocks") {
    import spark.implicits._
    // r10 verdict item 1: `(matches.score > 1)` / `(match_score + 1)`
    // are legal SQL over identifiers — a word-boundary check must keep
    // them out of the Cypher parser
    Seq((1, 5), (2, 0)).toDF("id", "score").createOrReplaceTempView("matches")
    val out = s.sql(
      "SELECT id FROM matches WHERE (matches.score > 1) ORDER BY id")
    assert(out.collect().map(_.getInt(0)).toSeq == Seq(1))
    Seq((1, 5)).toDF("id", "match_score").createOrReplaceTempView("ms")
    assert(s.sql("SELECT (match_score + 1) AS v FROM ms")
      .collect().head.getInt(0) == 6)
  }

  test("hybrid sql(): non-Cypher (MATCH...) text falls through to SQL") {
    import spark.implicits._
    // a parenthesized comparison over a column named `match`: starts
    // with MATCH at a word boundary but doesn't parse as Cypher —
    // scanner must emit the text unchanged instead of erroring
    Seq((1, true), (2, false)).toDF("id", "match")
      .createOrReplaceTempView("flags")
    val out = s.sql(
      "SELECT id FROM flags WHERE (match = true) ORDER BY id")
    assert(out.collect().map(_.getInt(0)).toSeq == Seq(1))
  }

  test("hybrid sql(): SQL comments and quoted identifiers are skipped") {
    import spark.implicits._
    Seq(1).toDF("v").createOrReplaceTempView("one_row")
    // a (MATCH ...) inside a line comment, a block comment, and a
    // double-quoted identifier must not trigger the Cypher door
    val out = s.sql(
      """SELECT v -- not a block: (MATCH (c:city) RETURN c)
        |/* nor this: (MATCH (c) RETURN c) */
        |FROM one_row""".stripMargin)
    assert(out.collect().head.getInt(0) == 1)
    // Spark's default mode reads double quotes as STRING literals —
    // either way the scanner must skip to the closing quote instead of
    // compiling the contents as Cypher
    assert(s.sql("""SELECT "(MATCH not cypher)" AS x""")
      .collect().head.getString(0) == "(MATCH not cypher)")
  }

  test("hybrid sql(): Cypher-block strings containing parens don't break depth tracking") {
    import spark.implicits._
    Seq(1).toDF("v").createOrReplaceTempView("one_row2")
    // the ')' inside the Cypher string literal must not close the block
    val hit = s.sql(
      """SELECT v FROM one_row2
        |WHERE EXISTS (MATCH (c:city) WHERE c.name = ')' RETURN c)
        |   OR EXISTS (MATCH (c:city {name: 'a'}) RETURN c)""".stripMargin)
    assert(hit.collect().map(_.getInt(0)).toSeq == Seq(1))
  }

  test("hybrid sql(): comment before a real Cypher block") {
    // a commented-out (MATCH ...) must be skipped while the real block
    // after it still compiles
    val out = s.sql(
      """SELECT name FROM -- dead: (MATCH (z:nope) RETURN z)
        |  (MATCH (c:city) RETURN c.name AS name) t
        |ORDER BY name LIMIT 1""".stripMargin)
    assert(out.collect().head.getString(0) == "\"a\"")
  }

  test("hybrid sql(): double-quoted Cypher strings containing parens (r11 item 2)") {
    import spark.implicits._
    Seq(1).toDF("v").createOrReplaceTempView("one_row3")
    // Cypher accepts BOTH quote chars — a ')' inside a double-quoted
    // Cypher string must not close the block
    val out = s.sql(
      """SELECT v FROM one_row3
        |WHERE EXISTS (MATCH (c:city) WHERE c.name = ")" RETURN c)
        |   OR EXISTS (MATCH (c:city {name: 'a'}) RETURN c)""".stripMargin)
    assert(out.collect().map(_.getInt(0)).toSeq == Seq(1))
  }

  test("hybrid sql(): backslash-escaped quote inside a Cypher string (r11 item 2)") {
    import spark.implicits._
    Seq(1).toDF("v").createOrReplaceTempView("one_row4")
    // the Cypher lexer reads \' as an escaped quote: the string is
    // `')` and the trailing ')' after it closes the BLOCK, not the
    // string — an un-escape-aware scan ends the string at the \' and
    // then miscounts everything after it
    val out = s.sql(
      """SELECT v FROM one_row4
        |WHERE EXISTS (MATCH (c:city) WHERE c.name = '\')' RETURN c)
        |   OR EXISTS (MATCH (c:city {name: 'a'}) RETURN c)""".stripMargin)
    assert(out.collect().map(_.getInt(0)).toSeq == Seq(1))
  }

  test("hybrid sql(): Cypher comments inside a block hide parens (r11 item 2)") {
    import spark.implicits._
    Seq(1).toDF("v").createOrReplaceTempView("one_row5")
    val out = s.sql(
      """SELECT v FROM one_row5
        |WHERE EXISTS (MATCH (c:city) // dead paren )
        |              WHERE c.name = 'a' /* another ) */ RETURN c)""".stripMargin)
    assert(out.collect().map(_.getInt(0)).toSeq == Seq(1))
  }

  test("hybrid sql(): backslash escape in a SQL string before a MATCH (r11 advice)") {
    // Spark's lexer honors \" inside a double-quoted string literal:
    // the (MATCH ...) is part of the LITERAL and must not be compiled
    // and substituted with a view name
    val lit = s.sql("""SELECT "a\" then (MATCH (c:city) RETURN c)" AS x""")
      .collect().head.getString(0)
    assert(lit == """a" then (MATCH (c:city) RETURN c)""")
  }

  test("hybrid sql(): nested SQL block comments (r11 advice)") {
    import spark.implicits._
    Seq(1).toDF("v").createOrReplaceTempView("one_row6")
    // Spark nests bracketed comments: the (MATCH :nolabel) is still
    // inside the OUTER comment after the inner */ — compiling it would
    // error on the unknown label
    val out = s.sql(
      """SELECT v /* outer /* inner */ (MATCH (x:nolabel) RETURN x) */
        |FROM one_row6""".stripMargin)
    assert(out.collect().head.getInt(0) == 1)
  }

  test("hybrid sql(): nested Cypher block inside an unparsable candidate (r11 advice)") {
    import spark.implicits._
    Seq((1, true), (2, false)).toDF("id", "match")
      .createOrReplaceTempView("flags2")
    // `(match = true AND EXISTS (MATCH ...))` starts with MATCH at a
    // word boundary but is SQL over a boolean column; the parse-failed
    // outer candidate must be re-scanned so the genuine nested Cypher
    // block is still discovered and compiled
    val out = s.sql(
      """SELECT id FROM flags2
        |WHERE (match = true AND
        |       EXISTS (MATCH (c:city {name: 'a'}) RETURN c))
        |ORDER BY id""".stripMargin)
    assert(out.collect().map(_.getInt(0)).toSeq == Seq(1))
  }

  test("hybrid sql(): trailing backslash surfaces as a parse error, not an index error") {
    // a string whose last char is a lone backslash made the skipper
    // overshoot the input; the scan must clamp and let Spark report
    // the malformed SQL
    val e = intercept[Exception] { s.sql("SELECT 'abc\\") }
    assert(!e.isInstanceOf[StringIndexOutOfBoundsException], e.toString)
  }

  test("idtext() renders the graphid display form labid.locid") {
    // graphid_out (graph.c:145-186) displays "labid.locid"; id() keeps
    // the packed long so ordering matches graphid comparison order
    val out = s.cypher(
      "MATCH (c:city {name: 'a'}) RETURN idtext(c) AS t, id(c) AS i")
    val r = out.collect().head
    val packed = r.getString(1).toLong
    val expect = "\"" + (packed >>> 48) + "." + (packed & ((1L << 48) - 1)) + "\""
    assert(r.getString(0) == expect)
  }

  test("hybrid sql(): backtick-quoted label with parens in a MATCH block (r12 item 1)") {
    // the block scanner is now lexer-driven (Parser.Lexer.matchingParen):
    // a backtick-quoted identifier may legally contain parens, and the
    // pre-r13 char scanner closed the block at the quoted ')' and
    // rejected a legal query
    s.createVLabel("weird)label")
    s.cypher("CREATE (:`weird)label` {name: 'z'})")
    val out = s.sql(
      "SELECT name FROM (MATCH (n:`weird)label`) RETURN n.name AS name) t")
    assert(out.collect().map(_.getString(0)).toSeq == Seq("\"z\""))
  }

  test("hybrid sql(): backtick-quoted variable containing '(' in a block") {
    val out = s.sql(
      "SELECT nm FROM (MATCH (`a(b`:city) RETURN `a(b`.name AS nm) t ORDER BY nm")
    assert(out.collect().map(_.getString(0)).toSeq ==
      Seq("\"a\"", "\"b\"", "\"c\""))
  }

  test("hybrid sql(): backticked SQL identifier containing '(match' is not a block") {
    import spark.implicits._
    Seq(("x", 1)).toDF("a", "b").createOrReplaceTempView("bt_ident")
    val out = s.sql("SELECT a AS `col (match y` FROM bt_ident")
    assert(out.columns.toSeq == Seq("col (match y"))
    assert(out.collect().map(_.getString(0)).toSeq == Seq("x"))
  }

  test("Lexer.matchingParen: no token class can hide a paren") {
    import Parser.Lexer.matchingParen
    val s1 = "(a ')' b) tail"
    assert(matchingParen(s1, 0) == s1.indexOf(" tail"))
    val s2 = "(`x)y` + 1) rest"
    assert(matchingParen(s2, 0) == s2.indexOf(" rest"))
    val s3 = "(a // )\n) z"
    assert(matchingParen(s3, 0) == s3.indexOf(" z"))
    val s4 = "(a /* ) */ b) w"
    assert(matchingParen(s4, 0) == s4.indexOf(" w"))
    val s5 = "(unbalanced `also(unclosed"
    assert(matchingParen(s5, 0) == s5.length)
    val s6 = "((n)-[:r]->(m)) q"
    assert(matchingParen(s6, 0) == s6.indexOf(" q"))
  }

  test("RETURN * projects all named variables") {
    val out = s.cypher("MATCH (c:city {name: 'a'})-[e:road]->(d) RETURN *")
    assert(out.columns.toSeq == Seq("c", "e", "d"))
    assert(out.count() == 1)
  }
}
