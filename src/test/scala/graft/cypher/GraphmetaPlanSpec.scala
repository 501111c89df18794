package graft.cypher

import graft.SparkTestBase
import graft.api.CypherSession
import graft.graph.{GraphCatalog, GraphId}
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** ag_graphmeta-driven MATCH planning: the (start, edge, end) count
  * matrix picks broadcast sides for typed hops over SKEWED label
  * combinations sharing one edge table — a selectivity Spark's
  * whole-table size estimate cannot see. Differential: results are
  * identical with planning on and off; plan-shape: the small combo
  * broadcasts (with auto-broadcast disabled, so the hint is provably
  * ours), the big combo does not, and a write that grows the small
  * combo past the cap invalidates the cached stats and flips the plan.
  */
class GraphmetaPlanSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  private def buildSkewed(): CypherSession = {
    val root = java.nio.file.Files.createTempDirectory("graft_gm").toString
    val s = new CypherSession(spark, new GraphCatalog(spark, root))
    s.createGraph("g")
    s.createVLabel("big"); s.createVLabel("small"); s.createVLabel("hub")
    s.createELabel("t")
    def labid(l: String) = s.catalog.label("g", l).get.labid
    val bigId = GraphId.pack(labid("big"), 0L)
    val smallId = GraphId.pack(labid("small"), 0L)
    val hubId = GraphId.pack(labid("hub"), 0L)
    val tId = GraphId.pack(labid("t"), 0L)
    // vertices: 3000 big, 30 small, 50 hub
    s.catalog.append("g", "big", spark.range(3000).select(
      (lit(bigId) + col("id")).as("id"),
      concat(lit("{\"k\": "), col("id"), lit("}")).as("properties")))
    s.catalog.append("g", "small", spark.range(30).select(
      (lit(smallId) + col("id")).as("id"),
      concat(lit("{\"k\": "), col("id"), lit("}")).as("properties")))
    s.catalog.append("g", "hub", spark.range(50).select(
      (lit(hubId) + col("id")).as("id"),
      concat(lit("{\"k\": "), col("id"), lit("}")).as("properties")))
    // edges, one shared elabel: 3000 (big)->(hub), 30 (small)->(hub)
    s.catalog.append("g", "t", spark.range(3000).select(
      (lit(tId) + col("id")).as("id"),
      (lit(bigId) + col("id")).as("start"),
      (lit(hubId) + pmod(col("id"), lit(50))).as("end"),
      lit("{}").as("properties")))
    s.catalog.append("g", "t", spark.range(30).select(
      (lit(tId) + lit(5000) + col("id")).as("id"),
      (lit(smallId) + col("id")).as("start"),
      (lit(hubId) + pmod(col("id"), lit(50))).as("end"),
      lit("{}").as("properties")))
    s
  }

  private def withConf(pairs: (String, String)*)(body: => Unit): Unit = {
    val prev = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    try { pairs.foreach { case (k, v) => spark.conf.set(k, v) }; body }
    finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("small typed hop broadcasts from graphmeta counts; big hop does not") {
    val s = buildSkewed()
    withConf("spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.graft.graphmetaBroadcastRows" -> "1000") {
      val smallQ = "MATCH (c:small)-[:t]->(h:hub) RETURN count(*) AS n"
      val bigQ = "MATCH (a:big)-[:t]->(h:hub) RETURN count(*) AS n"
      val pSmall = s.cypher(smallQ).queryExecution.executedPlan.toString
      assert(pSmall.contains("BroadcastHashJoin"), pSmall)
      val pBig = s.cypher(bigQ).queryExecution.executedPlan.toString
      assert(!pBig.contains("BroadcastHashJoin"), pBig)
      // toggle off: the small hop loses the hint too
      withConf("spark.graft.graphmetaPlanning" -> "false") {
        val pOff = s.cypher(smallQ).queryExecution.executedPlan.toString
        assert(!pOff.contains("BroadcastHashJoin"), pOff)
      }
      // undirected: filters install per orientation branch, so the
      // small combo still broadcasts and the big one still must not
      val pUndirS = s.cypher(
        "MATCH (c:small)-[:t]-(h:hub) RETURN count(*) AS n")
        .queryExecution.executedPlan.toString
      assert(pUndirS.contains("BroadcastHashJoin"), pUndirS)
      val pUndirB = s.cypher(
        "MATCH (a:big)-[:t]-(h:hub) RETURN count(*) AS n")
        .queryExecution.executedPlan.toString
      assert(!pUndirB.contains("BroadcastHashJoin"), pUndirB)
    }
  }

  test("endpoint labid ranges reach the edge scan as pushed filters") {
    val s = buildSkewed()
    val p = s.cypher("MATCH (c:small)-[:t]->(h:hub) RETURN count(*) AS n")
      .queryExecution.executedPlan.toString
    // the start-endpoint range lands in PushedFilters of the edge scan
    val pushed = p.linesIterator.filter(_.contains("PushedFilters")).mkString("\n")
    assert(pushed.contains("start") && pushed.contains("end"), p)
  }

  test("differential: identical results with planning on and off") {
    val s = buildSkewed()
    def run(q: String): Seq[String] =
      s.cypher(q).collect().toSeq.map(_.toString).sorted
    val qs = Seq(
      "MATCH (c:small)-[:t]->(h:hub) RETURN count(*) AS n",
      "MATCH (a:big)-[:t]->(h:hub) RETURN h.k AS hk, count(*) AS n",
      "MATCH (c:small)-[:t]->(h:hub)<-[:t]-(a:big) RETURN count(*) AS n",
      "MATCH (h:hub)<-[:t]-(c:small) RETURN c.k AS ck ORDER BY ck",
      "MATCH (x)-[:t]->(h:hub) RETURN count(*) AS n",
      "MATCH (c:small)-[:t]-(h:hub) RETURN h.k AS hk, count(*) AS n")
    withConf("spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.graft.graphmetaBroadcastRows" -> "1000") {
      for (q <- qs) {
        val on = run(q)
        withConf("spark.graft.graphmetaPlanning" -> "false") {
          val off = run(q)
          assert(on == off, q)
        }
      }
    }
  }

  test("chain reorder: a rare far end becomes the traversal head") {
    val s = buildSkewed()
    // add a tiny second hop off the hubs: (hub)-[:u]->(rare), 5 edges
    s.cypher("CREATE VLABEL rare"); s.cypher("CREATE ELABEL u")
    def labid(l: String) = s.catalog.label("g", l).get.labid
    val rareId = GraphId.pack(labid("rare"), 0L)
    val hubId = GraphId.pack(labid("hub"), 0L)
    val uId = GraphId.pack(labid("u"), 0L)
    s.catalog.append("g", "rare", spark.range(5).select(
      (lit(rareId) + col("id")).as("id"),
      concat(lit("{\"k\": "), col("id"), lit("}")).as("properties")))
    s.catalog.append("g", "u", spark.range(5).select(
      (lit(uId) + col("id")).as("id"),
      (lit(hubId) + col("id")).as("start"),
      (lit(rareId) + col("id")).as("end"),
      lit("{}").as("properties")))
    val b = new Builder(spark, s.catalog, "g", Map.empty,
      nm => spark.table(nm))
    val q = "MATCH (a:big)-[:t]->(h:hub)-[:u]->(r:rare) RETURN count(*) AS n"
    val pp = Parser.parse(q).first.clauses.collectFirst {
      case m: Ast.Match => m.paths.head
    }.get
    val init = graft.cypher.State(
      spark.range(1).toDF("__dummy"), Vector.empty)
    // 3000-edge first hop, 5-edge last hop -> reversed: rare leads
    val re = b.reorderPath(init, pp)
    assert(re.head.label.contains("rare"), re)
    assert(re.tail.head._1.direction == -1, re) // <-[:u]- after flip
    // the reversed build returns identical results
    def run(): Long = s.cypher(q).collect().head.get(0).toString.toLong
    val on = run()
    spark.conf.set("spark.graft.graphmetaPlanning", "false")
    try assert(run() == on)
    finally spark.conf.unset("spark.graft.graphmetaPlanning")
    // symmetric shape with the rare end FIRST stays as written
    val q2 = "MATCH (r:rare)<-[:u]-(h:hub)<-[:t]-(a:big) RETURN count(*) AS n"
    val pp2 = Parser.parse(q2).first.clauses.collectFirst {
      case m: Ast.Match => m.paths.head
    }.get
    assert(b.reorderPath(init, pp2) eq pp2)
  }

  test("chain anchor: a selective MIDDLE hop anchors the build") {
    val s = buildSkewed()
    // 3-hop chain with a tiny middle hop: (big)-[:t 3000]->(hub)
    // -[:m 3]->(mid)-[:w 1000]->(tl). Neither end-for-end orientation
    // starts small; the anchored build must start at hop m.
    s.cypher("CREATE VLABEL mid"); s.cypher("CREATE VLABEL tl")
    s.cypher("CREATE ELABEL m"); s.cypher("CREATE ELABEL w")
    def labid(l: String) = s.catalog.label("g", l).get.labid
    val hubId = GraphId.pack(labid("hub"), 0L)
    val midId = GraphId.pack(labid("mid"), 0L)
    val tlId = GraphId.pack(labid("tl"), 0L)
    val mId = GraphId.pack(labid("m"), 0L)
    val wId = GraphId.pack(labid("w"), 0L)
    s.catalog.append("g", "mid", spark.range(10).select(
      (lit(midId) + col("id")).as("id"),
      concat(lit("{\"k\": "), col("id"), lit("}")).as("properties")))
    s.catalog.append("g", "tl", spark.range(100).select(
      (lit(tlId) + col("id")).as("id"),
      concat(lit("{\"k\": "), col("id"), lit("}")).as("properties")))
    s.catalog.append("g", "m", spark.range(3).select(
      (lit(mId) + col("id")).as("id"),
      (lit(hubId) + col("id")).as("start"),
      (lit(midId) + col("id")).as("end"),
      lit("{}").as("properties")))
    s.catalog.append("g", "w", spark.range(1000).select(
      (lit(wId) + col("id")).as("id"),
      (lit(midId) + pmod(col("id"), lit(10))).as("start"),
      (lit(tlId) + pmod(col("id"), lit(100))).as("end"),
      lit("{}").as("properties")))
    val b = new Builder(spark, s.catalog, "g", Map.empty,
      nm => spark.table(nm))
    val q = "MATCH (a:big)-[:t]->(h:hub)-[:m]->(x:mid)-[:w]->(z:tl) " +
      "RETURN count(*) AS n"
    val pp = Parser.parse(q).first.clauses.collectFirst {
      case m2: Ast.Match => m2.paths.head
    }.get
    val init = graft.cypher.State(
      spark.range(1).toDF("__dummy"), Vector.empty)
    // end hops 3000 / 1000, middle hop 3: anchor at hop index 1
    assert(b.reorderPath(init, pp) eq pp) // no end is 4x the other way
    assert(b.chooseAnchor(init, pp) == Some(1), b.chooseAnchor(init, pp))
    // grouped projection + WHERE downstream of the anchored build
    def run(query: String): Seq[String] =
      s.cypher(query).collect().toSeq.map(_.toString).sorted
    val qs = Seq(q,
      "MATCH (a:big)-[:t]->(h:hub)-[:m]->(x:mid)-[:w]->(z:tl) " +
        "RETURN x.k AS xk, count(*) AS n",
      "MATCH (a:big)-[:t]->(h:hub)-[:m]->(x:mid)-[:w]->(z:tl) " +
        "WHERE z.k < 50 RETURN count(*) AS n")
    for (query <- qs) {
      val on = run(query)
      spark.conf.set("spark.graft.graphmetaPlanning", "false")
      try assert(on == run(query), query)
      finally spark.conf.unset("spark.graft.graphmetaPlanning")
    }
    // a selective FIRST hop keeps the forward build (anchor == end)
    val qFirst = "MATCH (h:hub)-[:m]->(x:mid)-[:w]->(z:tl)<-[:w]-(x2:mid) " +
      "RETURN count(*) AS n"
    val ppF = Parser.parse(qFirst).first.clauses.collectFirst {
      case m2: Ast.Match => m2.paths.head
    }.get
    assert(b.chooseAnchor(init, ppF).isEmpty)
    // RETURN * schema must be IDENTICAL with planning on and off: the
    // anchored build re-emits vars in pattern order (a stats refresh
    // must never change a query's visible column order)
    val qStar = "MATCH (a:big)-[:t]->(h:hub)-[:m]->(x:mid)-[:w]->(z:tl) " +
      "RETURN * LIMIT 1"
    val colsOn = s.cypher(qStar).columns.toSeq
    spark.conf.set("spark.graft.graphmetaPlanning", "false")
    val colsOff = try s.cypher(qStar).columns.toSeq
      finally spark.conf.unset("spark.graft.graphmetaPlanning")
    assert(colsOn == colsOff, s"$colsOn vs $colsOff")
    assert(colsOn == Seq("a", "h", "x", "z"), colsOn)
    // differential with an undirected middle hop and a prop constraint
    // on a leftward-walked node (the anchored build flips directions
    // and must keep per-node quals)
    val qs2 = Seq(
      "MATCH (a:big)-[:t]->(h:hub)-[:m]-(x:mid)-[:w]->(z:tl) " +
        "RETURN count(*) AS n",
      "MATCH (a:big {k: 5})-[:t]->(h:hub)-[:m]->(x:mid)-[:w]->(z:tl) " +
        "RETURN z.k AS zk, count(*) AS c")
    for (query <- qs2) {
      val on = run(query)
      spark.conf.set("spark.graft.graphmetaPlanning", "false")
      try assert(on == run(query), query)
      finally spark.conf.unset("spark.graft.graphmetaPlanning")
    }
  }

  test("flip + anchor co-fire keeps pattern-order schema") {
    // estimates [400, 2, 100]: reorderPath flips (100*4 <= 400), then
    // the flipped estimates [100, 2, 400] anchor the middle hop —
    // both stats rewrites fire on one chain, and RETURN * must still
    // come out in the WRITTEN pattern's order
    val root = java.nio.file.Files.createTempDirectory("graft_gmfa").toString
    val s = new CypherSession(spark, new GraphCatalog(spark, root))
    s.createGraph("g")
    Seq("q1", "q2", "q3", "q4").foreach(s.createVLabel(_))
    Seq("r1", "r2", "r3").foreach(s.createELabel(_))
    def labid(l: String) = s.catalog.label("g", l).get.labid
    def addV(l: String, n: Int): Unit =
      s.catalog.append("g", l, spark.range(n).select(
        (lit(GraphId.pack(labid(l), 0L)) + col("id")).as("id"),
        concat(lit("{\"k\": "), col("id"), lit("}")).as("properties")))
    def addE(l: String, n: Int, from: String, nf: Int, to: String, nt: Int): Unit =
      s.catalog.append("g", l, spark.range(n).select(
        (lit(GraphId.pack(labid(l), 0L)) + col("id")).as("id"),
        (lit(GraphId.pack(labid(from), 0L)) + pmod(col("id"), lit(nf))).as("start"),
        (lit(GraphId.pack(labid(to), 0L)) + pmod(col("id"), lit(nt))).as("end"),
        lit("{}").as("properties")))
    addV("q1", 100); addV("q2", 20); addV("q3", 10); addV("q4", 50)
    addE("r1", 400, "q1", 100, "q2", 20)
    addE("r2", 2, "q2", 20, "q3", 10)
    addE("r3", 100, "q3", 10, "q4", 50)
    val q = "MATCH (a:q1)-[:r1]->(b:q2)-[:r2]->(c:q3)-[:r3]->(d:q4) " +
      "RETURN * LIMIT 1"
    val b = new Builder(spark, s.catalog, "g", Map.empty,
      nm => spark.table(nm))
    val pp = Parser.parse(
      q.replace("RETURN * LIMIT 1", "RETURN count(*) AS n"))
      .first.clauses.collectFirst { case m2: Ast.Match => m2.paths.head }.get
    val init = graft.cypher.State(
      spark.range(1).toDF("__dummy"), Vector.empty)
    val flipped = b.reorderPath(init, pp)
    assert(!(flipped eq pp), "flip must fire")          // 100*4 <= 400
    assert(b.chooseAnchor(init, flipped) == Some(1))    // then anchor
    val colsOn = s.cypher(q).columns.toSeq
    spark.conf.set("spark.graft.graphmetaPlanning", "false")
    val colsOff = try s.cypher(q).columns.toSeq
      finally spark.conf.unset("spark.graft.graphmetaPlanning")
    assert(colsOn == Seq("a", "b", "c", "d"), colsOn)
    assert(colsOn == colsOff, s"$colsOn vs $colsOff")
    // and the results agree
    val cq = "MATCH (a:q1)-[:r1]->(b:q2)-[:r2]->(c:q3)-[:r3]->(d:q4) " +
      "RETURN b.k AS bk, count(*) AS n"
    val on = s.cypher(cq).collect().toSeq.map(_.toString).sorted
    spark.conf.set("spark.graft.graphmetaPlanning", "false")
    val off = try s.cypher(cq).collect().toSeq.map(_.toString).sorted
      finally spark.conf.unset("spark.graft.graphmetaPlanning")
    assert(on == off)
    assert(on.nonEmpty)
  }

  test("seeded differential fuzz: random densities, random chains, on == off") {
    // random edge densities make reorderPath/chooseAnchor decisions
    // vary per seed; every decision must be invisible in the results
    for (seed <- Seq(11, 47, 83)) {
      val rnd = new scala.util.Random(seed)
      val root = java.nio.file.Files
        .createTempDirectory(s"graft_gmfz$seed").toString
      val s = new CypherSession(spark, new GraphCatalog(spark, root))
      s.createGraph("g")
      val vls = Seq("f1", "f2", "f3", "f4")
      vls.foreach(s.createVLabel(_))
      val els = Seq("e1", "e2", "e3")
      els.foreach(s.createELabel(_))
      def labid(l: String) = s.catalog.label("g", l).get.labid
      val sizes = vls.map(_ => 5 + rnd.nextInt(60))
      vls.zip(sizes).foreach { case (l, n) =>
        s.catalog.append("g", l, spark.range(n).select(
          (lit(GraphId.pack(labid(l), 0L)) + col("id")).as("id"),
          concat(lit("{\"k\": "), col("id") % 7, lit("}")).as("properties")))
      }
      els.zipWithIndex.foreach { case (l, i) =>
        val n = 1 + rnd.nextInt(300) // densities spanning the 4x bars
        s.catalog.append("g", l, spark.range(n).select(
          (lit(GraphId.pack(labid(l), 0L)) + col("id")).as("id"),
          (lit(GraphId.pack(labid(vls(i)), 0L)) +
            pmod(col("id"), lit(sizes(i)))).as("start"),
          (lit(GraphId.pack(labid(vls(i + 1)), 0L)) +
            pmod(col("id") * 7 + 3, lit(sizes(i + 1)))).as("end"),
          lit("{}").as("properties")))
      }
      val qs = Seq(
        "MATCH (a:f1)-[:e1]->(b:f2)-[:e2]->(c:f3)-[:e3]->(d:f4) " +
          "RETURN count(*) AS n",
        "MATCH (a:f1)-[:e1]->(b:f2)-[:e2]->(c:f3)-[:e3]->(d:f4) " +
          "WHERE d.k > 2 RETURN b.k AS bk, count(*) AS n",
        "MATCH (a:f1)-[:e1]->(b:f2)-[:e2]-(c:f3)-[:e3]->(d:f4) " +
          "RETURN a.k AS ak, d.k AS dk, count(*) AS n",
        "MATCH (a:f1 {k: 1})-[:e1]->(b:f2)-[:e2]->(c:f3)-[:e3]->(d:f4) " +
          "RETURN count(*) AS n")
      for (q <- qs) {
        val on = s.cypher(q).collect().toSeq.map(_.toString).sorted
        spark.conf.set("spark.graft.graphmetaPlanning", "false")
        val off = try s.cypher(q).collect().toSeq.map(_.toString).sorted
          finally spark.conf.unset("spark.graft.graphmetaPlanning")
        assert(on == off, s"seed=$seed $q")
      }
    }
  }

  test("a write invalidates the cached stats and flips the plan") {
    val s = buildSkewed()
    withConf("spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.graft.graphmetaBroadcastRows" -> "1000",
      // disable the staleness window so the invalidation is immediate
      "spark.graft.graphmetaRefreshSecs" -> "0") {
      val q = "MATCH (c:small)-[:t]->(h:hub) RETURN count(*) AS n"
      assert(s.cypher(q).queryExecution.executedPlan.toString
        .contains("BroadcastHashJoin"))
      // grow the small combo past the cap (append bypasses no caches —
      // the file fingerprint changes, the matrix recomputes)
      def labid(l: String) = s.catalog.label("g", l).get.labid
      val smallId = GraphId.pack(labid("small"), 0L)
      val hubId = GraphId.pack(labid("hub"), 0L)
      val tId = GraphId.pack(labid("t"), 0L)
      s.catalog.append("g", "t", spark.range(2000).select(
        (lit(tId) + lit(10000) + col("id")).as("id"),
        (lit(smallId) + pmod(col("id"), lit(30))).as("start"),
        (lit(hubId) + pmod(col("id"), lit(50))).as("end"),
        lit("{}").as("properties")))
      val pAfter = s.cypher(q).queryExecution.executedPlan.toString
      assert(!pAfter.contains("BroadcastHashJoin"), pAfter)
    }
  }
}
