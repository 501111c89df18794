package graft

import org.scalatest.funsuite.AnyFunSuite

/** Plan-shape assertions: the properties the 100 TB story depends on —
  * predicate pushdown reaching parquet, constant dims broadcast,
  * whole-stage codegen over the jsonb expressions.
  */
class ExplainSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  private val sf = "/root/testdata/sf0.001"

  private def planOf(name: String): String = {
    val df = SparkEntry.queries(name)(spark, sf)
    df.queryExecution.executedPlan.toString
  }

  test("jsonpath filter: lax leading key compiles to a pushed sidecar filter") {
    val s = pipeline.GraphQueries.session(spark, sf)
    // lax non-predicate path with a leading member step: the shredded
    // __pj_acctbal sidecar's IS NOT NULL is exact (lax $.k on a missing
    // key is empty -> exists false) and reaches the parquet scan
    val q = "MATCH (c:customer) " +
      "WHERE jsonb_path_exists(properties(c), '$.acctbal ? (@ > 9000)') " +
      "RETURN count(*) AS n"
    val df = s.cypher(q)
    val p = df.queryExecution.executedPlan.toString
    // the bare-item filter shape upgrades to the typed __pn_ pushdown;
    // a shape outside it (the wildcard chain below) shows the plain
    // presence guard
    assert(p.contains("GreaterThan(__pn_acctbal"), p)
    val pWild = s.cypher("MATCH (c:customer) " +
      "WHERE jsonb_path_exists(properties(c), '$.acctbal.type()') " +
      "RETURN count(*) AS n").queryExecution.executedPlan.toString
    assert(pWild.contains("IsNotNull(__pj_acctbal)"), pWild)
    // result parity with the plain property predicate
    val viaPath = df.collect().head.get(0).toString.toLong
    val viaProp = s.cypher(
      "MATCH (c:customer) WHERE c.acctbal > 9000 RETURN count(*) AS n")
      .collect().head.get(0).toString.toLong
    assert(viaPath == viaProp && viaPath > 0, s"$viaPath vs $viaProp")
    // strict paths must NOT gain the guard (missing-key ERROR surfaces)
    val pStrict = s.cypher(
      "MATCH (c:customer) " +
        "WHERE jsonb_path_exists(properties(c), 'strict $.acctbal ? (@ > 9000)') " +
        "RETURN count(*) AS n").queryExecution.executedPlan.toString
    assert(!pStrict.contains("IsNotNull(__pj_acctbal)"), pStrict)
    // predicate paths always emit one item — no guard either
    val pPred = s.cypher(
      "MATCH (c:customer) " +
        "WHERE jsonb_path_exists(properties(c), '$.acctbal > 9000') " +
        "RETURN count(*) AS n").queryExecution.executedPlan.toString
    assert(!pPred.contains("IsNotNull(__pj_acctbal)"), pPred)
    // and the predicate-path form is `exists`-true for every row
    // (one boolean/null item per doc), matching the reference
    val nAll = s.cypher(
      "MATCH (c:customer) RETURN count(*) AS n").collect().head.get(0)
      .toString.toLong
    val nPredPath = s.cypher(
      "MATCH (c:customer) " +
        "WHERE jsonb_path_exists(properties(c), '$.acctbal > 9000') " +
        "RETURN count(*) AS n").collect().head.get(0).toString.toLong
    assert(nPredPath == nAll, s"$nPredPath vs $nAll")
    // jsonb_path_match (the @@ form): a top-level `$.k ...` PREDICATE
    // requires the key — and the exact `$.k OP lit` shape upgrades all
    // the way to the typed __pn_ comparison (see the dedicated test)
    val qm = "MATCH (c:customer) " +
      "WHERE jsonb_path_match(properties(c), '$.acctbal > 9000') " +
      "RETURN count(*) AS n"
    val dfm = s.cypher(qm)
    assert(dfm.queryExecution.executedPlan.toString
      .contains("GreaterThan(__pn_acctbal"), qm)
    assert(dfm.collect().head.get(0).toString.toLong == viaProp)
    // OR at the top must NOT gain the guard (the other branch can be
    // true without the key)
    val pOr = s.cypher(
      "MATCH (c:customer) " +
        "WHERE jsonb_path_match(properties(c), " +
        "'$.acctbal > 9000 || $.name starts with \"Cust\"') " +
        "RETURN count(*) AS n").queryExecution.executedPlan.toString
    assert(!pOr.contains("IsNotNull(__pj_"), pOr)
    // non-predicate match paths keep their missing-key error semantics
    val pNp = s.cypher(
      "MATCH (c:customer) " +
        "WHERE jsonb_path_match(properties(c), '$.acctbal', NULL, true) " +
        "RETURN count(*) AS n").queryExecution.executedPlan.toString
    assert(!pNp.contains("IsNotNull(__pj_acctbal)"), pNp)
  }

  test("jsonpath match `$.k OP literal` upgrades to a typed value pushdown") {
    val s = pipeline.GraphQueries.session(spark, sf)
    // the exact single-step form gains a __pn_ comparison that reaches
    // parquet (row-group min/max pruning) — not just key presence
    val q = "MATCH (c:customer) " +
      "WHERE jsonb_path_match(properties(c), '$.acctbal > 9000') " +
      "RETURN count(*) AS n"
    val df = s.cypher(q)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("GreaterThan(__pn_acctbal"), p)
    val viaProp = s.cypher(
      "MATCH (c:customer) WHERE c.acctbal > 9000 RETURN count(*) AS n")
      .collect().head.get(0).toString.toLong
    assert(df.collect().head.get(0).toString.toLong == viaProp && viaProp > 0)
    // flipped literal-first spelling flips the operator
    val pf = s.cypher("MATCH (c:customer) " +
      "WHERE jsonb_path_match(properties(c), '9000 < $.acctbal') " +
      "RETURN count(*) AS n").queryExecution.executedPlan.toString
    assert(pf.contains("GreaterThan(__pn_acctbal"), pf)
    // string equality pushes the raw-string shred comparison
    val ps = s.cypher("MATCH (c:customer) " +
      """WHERE jsonb_path_match(properties(c), '$.mktsegment == "BUILDING"') """ +
      "RETURN count(*) AS n")
    val psPlan = ps.queryExecution.executedPlan.toString
    assert(psPlan.contains("EqualTo(__ps_mktsegment,BUILDING)"), psPlan)
    val viaSeg = s.cypher("MATCH (c:customer) " +
      "WHERE c.mktsegment = 'BUILDING' RETURN count(*) AS n")
      .collect().head.get(0).toString.toLong
    assert(ps.collect().head.get(0).toString.toLong == viaSeg && viaSeg > 0)
    // chained operand (`$.k.b OP lit`) must NOT get the typed guard
    // (it compares a NESTED value) — it keeps the presence guard only
    val pc = s.cypher("MATCH (c:customer) " +
      "WHERE jsonb_path_match(properties(c), '$.acctbal.x > 9000') " +
      "RETURN count(*) AS n").queryExecution.executedPlan.toString
    assert(!pc.contains("GreaterThan(__pn_acctbal"), pc)
    assert(pc.contains("IsNotNull(__pj_acctbal)"), pc)
    // strict stays fully unguarded
    val pstr = s.cypher("MATCH (c:customer) " +
      "WHERE jsonb_path_match(properties(c), 'strict $.acctbal > 9000') " +
      "RETURN count(*) AS n").queryExecution.executedPlan.toString
    assert(!pstr.contains("__pn_acctbal") && !pstr.contains("IsNotNull(__pj_acctbal)"),
      pstr)
    // exists twin: the filter-step spelling `$.k ? (@ OP lit)` gets the
    // SAME typed comparison (a non-empty result requires the filter to
    // have passed) — the q74 shape now prunes by row-group min/max
    val dfe = s.cypher("MATCH (c:customer) " +
      "WHERE jsonb_path_exists(properties(c), '$.acctbal ? (@ > 9000)') " +
      "RETURN count(*) AS n")
    val pe = dfe.queryExecution.executedPlan.toString
    assert(pe.contains("GreaterThan(__pn_acctbal"), pe)
    assert(dfe.collect().head.get(0).toString.toLong == viaProp)
    // flipped operand inside the filter
    val pef = s.cypher("MATCH (c:customer) " +
      "WHERE jsonb_path_exists(properties(c), '$.acctbal ? (9000 < @)') " +
      "RETURN count(*) AS n").queryExecution.executedPlan.toString
    assert(pef.contains("GreaterThan(__pn_acctbal"), pef)
    // trailing steps after the filter keep the (still-necessary) guard
    val pet = s.cypher("MATCH (c:customer) " +
      "WHERE jsonb_path_exists(properties(c), '$.acctbal ? (@ > 9000).x') " +
      "RETURN count(*) AS n").queryExecution.executedPlan.toString
    assert(pet.contains("GreaterThan(__pn_acctbal"), pet)
    // a predicate over @.b is NOT the bare item — presence guard only
    val pem = s.cypher("MATCH (c:customer) " +
      "WHERE jsonb_path_exists(properties(c), '$.acctbal ? (@.b > 9000)') " +
      "RETURN count(*) AS n").queryExecution.executedPlan.toString
    assert(!pem.contains("GreaterThan(__pn_acctbal"), pem)
    assert(pem.contains("IsNotNull(__pj_acctbal)"), pem)
    // AND-spine: the range filter pushes BOTH bounds (row-group range
    // pruning); result parity with the native double predicate
    val dfr = s.cypher("MATCH (c:customer) " +
      "WHERE jsonb_path_exists(properties(c), " +
      "'$.acctbal ? (@ > 1000 && @ < 2000)') RETURN count(*) AS n")
    val pr = dfr.queryExecution.executedPlan.toString
    // the PushedFilters list renders truncated ("LessThan(__pn_acctba…")
    // — assert on the untruncated Filter node's two bound comparisons
    assert(pr.contains("GreaterThan(__pn_acctbal"), pr)
    assert(pr.contains("> 1000.0") && pr.contains("< 2000.0"), pr)
    val viaRange = s.cypher("MATCH (c:customer) " +
      "WHERE c.acctbal > 1000 AND c.acctbal < 2000 RETURN count(*) AS n")
      .collect().head.get(0).toString.toLong
    assert(dfr.collect().head.get(0).toString.toLong == viaRange && viaRange > 0)
    // an OR branch under the AND contributes nothing; the AND's other
    // leaf still pushes
    val por = s.cypher("MATCH (c:customer) " +
      "WHERE jsonb_path_match(properties(c), " +
      "'$.acctbal > 1000 && ($.acctbal < 2000 || $.name == \"x\")') " +
      "RETURN count(*) AS n").queryExecution.executedPlan.toString
    assert(por.contains("> 1000.0"), por)
    assert(!por.contains("< 2000.0"), por)
  }

  test("string RANGE comparisons push the raw-string shred — jsonpath " +
      "codepoint order == parquet binary min/max order") {
    val s = pipeline.GraphQueries.session(spark, sf)
    // match form `$.k < "lit"`
    val dm = s.cypher("MATCH (c:customer) " +
      """WHERE jsonb_path_match(properties(c), '$.mktsegment < "F"') """ +
      "RETURN count(*) AS n")
    val pm = dm.queryExecution.executedPlan.toString
    assert(pm.contains("LessThan(__ps_mktsegment"), pm)
    // native Cypher string range now pushes too (engine string order is
    // codepoint order — Jsonb.codepointCmp — which IS the binary order
    // of the shred column's parquet stats)
    val dn = s.cypher(
      "MATCH (c:customer) WHERE c.mktsegment < 'F' RETURN count(*) AS n")
    val pn = dn.queryExecution.executedPlan.toString
    assert(pn.contains("LessThan(__ps_mktsegment"), pn)
    val a = dm.collect().head.get(0).toString.toLong
    assert(a == dn.collect().head.get(0).toString.toLong && a > 0)
    // exists twin with BOTH range bounds on the AND-spine
    val de = s.cypher("MATCH (c:customer) WHERE jsonb_path_exists(" +
      """properties(c), '$.mktsegment ? (@ >= "B" && @ < "H")') """ +
      "RETURN count(*) AS n")
    val pe = de.queryExecution.executedPlan.toString
    assert(pe.contains(">= B") && pe.contains("< H"), pe)
    val viaNative = s.cypher("MATCH (c:customer) " +
      "WHERE c.mktsegment >= 'B' AND c.mktsegment < 'H' " +
      "RETURN count(*) AS n").collect().head.get(0).toString.toLong
    assert(de.collect().head.get(0).toString.toLong == viaNative &&
      viaNative > 0)
    // anchored like_regex derives a literal-prefix startswith guard
    val dlr = s.cypher("MATCH (c:customer) WHERE jsonb_path_match(" +
      """properties(c), '$.mktsegment like_regex "^BU[A-Z]+"') """ +
      "RETURN count(*) AS n")
    val plr = dlr.queryExecution.executedPlan.toString
    assert(plr.contains("StringStartsWith(__ps_mktsegment,BU)") ||
      plr.contains("StartsWith(__ps_mktsegment"), plr)
    val viaPrefix = s.cypher("MATCH (c:customer) " +
      "WHERE c.mktsegment STARTS WITH 'BU' RETURN count(*) AS n")
      .collect().head.get(0).toString.toLong
    assert(dlr.collect().head.get(0).toString.toLong == viaPrefix &&
      viaPrefix > 0)
    // native Cypher =~ with an anchored pattern gets the same conjunct
    val dre = s.cypher("MATCH (c:customer) " +
      "WHERE c.mktsegment =~ '^BU[A-Z]+' RETURN count(*) AS n")
    val pre2 = dre.queryExecution.executedPlan.toString
    assert(pre2.contains("StartsWith(__ps_mktsegment"), pre2)
    assert(dre.collect().head.get(0).toString.toLong == viaPrefix)
  }

  test("jsonpath filter: chained member path pushes the LEADING key guard") {
    // `$.a.b…` — lax evaluation of any chain rooted at member a yields
    // empty when top-level a is missing, so `__pj_a IS NOT NULL` is a
    // sound (necessary) conjunct for exists AND for a top-level
    // predicate comparing the chain; the full jsonpath evaluation
    // stays in the filter, so the guard only prunes, never decides
    val root = java.nio.file.Files.createTempDirectory("graft_llk").toString
    val s = new graft.api.CypherSession(spark,
      new graft.graph.GraphCatalog(spark, root))
    s.createGraph("g"); s.createVLabel("doc")
    s.cypher("CREATE (:doc {a: {b: 1}}), (:doc {a: {c: 2}}), (:doc {x: 3})")
    val dfc = s.cypher("MATCH (n:doc) " +
      "WHERE jsonb_path_exists(properties(n), '$.a.b') RETURN count(*) AS n")
    val pc = dfc.queryExecution.executedPlan.toString
    assert(pc.contains("IsNotNull(__pj_a)"), pc)
    assert(dfc.collect().head.get(0).toString.toLong == 1L)
    // match form: predicate over a chained operand requires the root key
    val dfm = s.cypher("MATCH (n:doc) " +
      "WHERE jsonb_path_match(properties(n), '$.a.b == 1') RETURN count(*) AS n")
    val pm = dfm.queryExecution.executedPlan.toString
    assert(pm.contains("IsNotNull(__pj_a)"), pm)
    assert(dfm.collect().head.get(0).toString.toLong == 1L)
    // array-step chain keeps the leading-member guard too
    val dfa = s.cypher("MATCH (n:doc) " +
      "WHERE jsonb_path_exists(properties(n), '$.a[0].b') RETURN count(*) AS n")
    assert(dfa.queryExecution.executedPlan.toString
      .contains("IsNotNull(__pj_a)"), "array-step chain")
    // wildcard leading step must NOT gain any guard (no single key)
    val pw = s.cypher("MATCH (n:doc) " +
      "WHERE jsonb_path_exists(properties(n), '$.*.b') RETURN count(*) AS n")
      .queryExecution.executedPlan.toString
    assert(!pw.contains("IsNotNull(__pj_"), pw)
  }

  test("q01: filter + projection push into the parquet scan") {
    val p = planOf("q01_filter_project")
    assert(p.contains("PushedFilters: ["), p)
    assert(p.contains("GreaterThan(l_quantity"), p)
    // column pruning: only the 5 needed columns in ReadSchema
    assert(!p.contains("l_extendedprice"), p)
  }

  test("q04: constant dims broadcast, no cartesian products") {
    val p = planOf("q04_join_multiway")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("g02: Cypher chain join compiles to pruned-scan equi-joins") {
    val p = planOf("g02_chain_join")
    // pattern joins become hash equi-joins (no cartesian fallback)
    assert(p.contains("BroadcastHashJoin") || p.contains("SortMergeJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
    // the property predicate compiles against the shredded decimal
    // sidecar and reaches the parquet source as a pushed filter — no
    // jsonb evaluation in the scan at all
    assert(p.contains("PushedFilters: [IsNotNull(__pn_totalprice), " +
      "GreaterThan(__pn_totalprice"), p)
    assert(!p.contains("jsonb_gt"), p)
    // unused struct fields are pruned from the read schema
    assert(p.contains("ReadSchema: struct<id:bigint>"), p)
  }

  test("p05: ANN pair join broadcasts the query side (no cartesian)") {
    val p = planOf("p05_ann_bruteforce")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
    // the codegen'd dot kernel is in the plan (not HOF lambdas)
    assert(p.contains("fvec_dot"), p)
  }

  test("p13: IVF assignment is pure expressions — no Scala UDF in the plan") {
    // the cell-assignment pass touches every corpus vector; it must
    // stay inside codegen (FloatVecDot over the broadcast centroid
    // literals), never fall back to boxed per-row UDF evaluation
    val df = SparkEntry.queries("p13_ann_ivf")(spark, sf)
    val analyzed = df.queryExecution.analyzed.toString
    assert(!analyzed.contains("UDF"), analyzed.take(2000))
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("ScalaUDF") && !p.contains("BatchEvalPython"), p.take(2000))
    assert(p.contains("fvec_dot"), p.take(2000))
  }

  test("p45: PQ encode + ADC scan are pure expressions — no Scala UDF in the plan") {
    // encoding touches every corpus vector and the ADC join touches
    // every (query, code) pair; both must stay inside codegen
    // (FloatVecDot sub-distances, element_at table lookups)
    val df = SparkEntry.queries("p45_ann_pq")(spark, sf)
    val analyzed = df.queryExecution.analyzed.toString
    assert(!analyzed.contains("UDF"), analyzed.take(2000))
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("ScalaUDF") && !p.contains("BatchEvalPython"), p.take(2000))
    // the encode stage materializes behind a localCheckpoint barrier
    // (the persisted-code-table artifact), so its plan is checked on
    // the un-checkpointed builder: codegen'd fvec_dot, no UDF
    val vecs = graft.relational.Tables.load(spark, sf, "embeddings")
    val enc = pipeline.Similarity.pqEncode(vecs,
      pipeline.Similarity.pqCodebook(dim = 64, numSub = 8, k = 16))
    val ep = enc.queryExecution.executedPlan.toString
    assert(ep.contains("fvec_dot"), ep.take(2000))
    assert(!ep.contains("ScalaUDF"), ep.take(2000))
  }

  test("p53/p54: sketch sides broadcast — probes never shuffle the sketch") {
    // count-min estimate joins the ≤ d·w counter table broadcast;
    // Bloom probe joins the ≤ m set-bit table broadcast; neither may
    // degenerate to a cartesian or shuffle the key side against it
    val p53 = planOf("p53_heavy_hitters")
    assert(p53.contains("BroadcastHashJoin"), p53.take(2000))
    assert(!p53.contains("CartesianProduct"), p53.take(2000))
    val p54 = planOf("p54_bloom_filter")
    assert(p54.contains("BroadcastHashJoin"), p54.take(2000))
    assert(!p54.contains("CartesianProduct"), p54.take(2000))
  }

  test("q02: aggregation is partial+final (map-side combine)") {
    val p = planOf("q02_agg_groupby")
    assert(p.contains("HashAggregate"), p)
    // partial + final pair
    assert("HashAggregate".r.findAllIn(p).length >= 2, p)
  }

  test("p22: decontamination is a broadcast semi-join (corpus never shuffles grams)") {
    val p = planOf("p22_decontam")
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftSemi"), p)
  }

  test("q48: lateral top-n is one aggregation + broadcast dim, no re-execution per row") {
    val p = planOf("q48_lateral_topn")
    assert(p.contains("BroadcastHashJoin"), p)
    // a single partial+final aggregate pair feeds the rank window
    assert("HashAggregate".r.findAllIn(p).length == 2, p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q44: pivot aggregates map-side (partial+final), no per-value scans") {
    val p = planOf("q44_pivot")
    // one scan of orders only
    assert("Scan parquet".r.findAllIn(p).length == 1, p)
    assert("HashAggregate".r.findAllIn(p).length >= 2, p)
  }

  test("p19: tfidf corpus size joins as broadcast (no shuffled cross join)") {
    val p = planOf("p19_tfidf")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("p94: exact-k sampling plans through the custom TopKPerKey operator") {
    val p = planOf("p94_exact_k_sample")
    assert(p.contains("TopKPerKeyFinal"), p)
    assert(p.contains("TopKPerKeyPartial"), p)
    assert(!p.contains("Window"), p) // no rank window, no partition sort
  }

  test("p67: bm25 prunes postings by the broadcast query vocabulary, no UDFs") {
    val p = planOf("p67_bm25")
    // the corpus token stream meets the query vocabulary in a
    // broadcast join BEFORE any aggregation exchange — corpus cost is
    // proportional to matching postings, not corpus size
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BatchEvalPython") && !p.contains("ScalaUDF"), p)
  }

  test("q63: interval join broadcasts the window table (event side never shuffles)") {
    val p = planOf("q63_interval_join")
    assert(p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
    // no exchange below the join: the only shuffle is the aggregation's
    val joinPart = p.substring(p.indexOf("BroadcastNestedLoopJoin"))
    assert(!joinPart.contains("Exchange hashpartitioning"), p)
  }

  test("p33: embedding decontam broadcasts the eval set, corpus side has no shuffle before the pair loop") {
    val p = planOf("p33_embed_decontam")
    assert(p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.contains("fvec_dot"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("p32: line dedup shuffles 8-byte hashes, not line text") {
    val p = planOf("p32_line_dedup")
    // the window exchange partitions on the xxhash64 column
    assert(p.contains("hashpartitioning(lh"), p)
  }

  test("q04: eager aggregation sits below the join chain (order-grain partials shuffle, not lineitems)") {
    val p = planOf("q04_join_multiway")
    // the lineitem pre-aggregation appears before (deeper than) the
    // first fact join: its partial HashAggregate must be on the scan
    // side of the orders join
    val firstJoin = Seq(p.indexOf("SortMergeJoin"), p.indexOf("ShuffledHashJoin"),
      p.indexOf("BroadcastHashJoin")).filter(_ >= 0).min
    val aggs = "HashAggregate".r.findAllMatchIn(p).map(_.start).toSeq
    assert(aggs.count(_ > firstJoin) >= 2, p) // partial+final below a join
  }

  test("p37: incremental dedup anti-join carries digests only (text pruned from both shuffles)") {
    val p = planOf("p37_incremental_dedup")
    assert(p.contains("LeftAnti"), p)
    // no exchange partitions on or carries the text column — text is
    // consumed map-side into the 16-byte digest before any shuffle
    val excLines = p.linesIterator.filter(_.contains("Exchange")).toSeq
    assert(excLines.nonEmpty, p)
    assert(excLines.forall(!_.contains("text#")), excLines.mkString("\n"))
  }

  test("s06 shape: mapGroupsWithState plans FlatMapGroupsWithState over keyed state") {
    import org.apache.spark.sql.functions._
    // batch twin of the streaming query — same operator, no stream
    val sp = spark
    import sp.implicits._
    val ev = graft.relational.Tables.load(spark, sf, "events")
      .where(col("user_id") < 10)
      .select(col("event_id"), col("ts"), col("user_id"),
        col("event_type"), col("value"))
      .as[graft.streaming.EventStreams.Event]
    val out = graft.streaming.EventStreams.runningUserTotals(ev)
    val p = out.queryExecution.executedPlan.toString
    assert(p.contains("FlatMapGroupsWithState") || p.contains("MapGroups"), p)
  }

  test("partitioned layout prunes unread partitions before any file opens") {
    import graft.relational.{Bucketing, Tables}
    val dir = java.nio.file.Files.createTempDirectory("graft_part").toString
    Bucketing.writePartitioned(
      Tables.load(spark, sf, "documents"), s"$dir/docs", "source")
    val all = spark.read.parquet(s"$dir/docs")
    val sources = all.select("source").distinct().count()
    assert(sources > 1) // otherwise pruning proves nothing
    val one = all.where(org.apache.spark.sql.functions.col("source") === "web")
    val scan = one.queryExecution.executedPlan.collectLeaves().head
    val ss = scan.toString
    // the source predicate lands in PartitionFilters (directory-level
    // pruning), NOT PushedFilters (row-group skipping)
    assert(ss.contains("PartitionFilters") &&
      ss.replaceAll("(?s).*PartitionFilters: \\[([^\\]]*)\\].*", "$1")
        .contains("source"), ss)
    // and the pruned scan reads strictly fewer files than the full one
    def files(df: org.apache.spark.sql.DataFrame): Long =
      df.queryExecution.executedPlan.collectLeaves().head match {
        case f: org.apache.spark.sql.execution.FileSourceScanExec =>
          f.selectedPartitions.totalNumberOfFiles
        case other => fail(s"unexpected leaf: $other")
      }
    assert(files(one) < files(all))
    assert(one.count() ==
      Tables.load(spark, sf, "documents")
        .where(org.apache.spark.sql.functions.col("source") === "web").count())
  }

  test("bucketed tables join with no exchange and no sort (co-located layout)") {
    import graft.relational.{Bucketing, Tables}
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      Bucketing.writeBucketed(Tables.load(spark, sf, "orders"),
        "bkt_orders", "o_custkey", 4)
      Bucketing.writeBucketed(Tables.load(spark, sf, "customer"),
        "bkt_customer", "c_custkey", 4)
      val j = Bucketing.colocatedJoin(spark, "bkt_orders", "bkt_customer",
        "o_custkey", "c_custkey")
      val p = j.queryExecution.executedPlan.toString
      assert(p.contains("SortMergeJoin"), p)
      assert(!p.contains("Exchange"), p)
      // row-count sanity: same as the unbucketed join
      val want = Tables.load(spark, sf, "orders").join(
        Tables.load(spark, sf, "customer"),
        org.apache.spark.sql.functions.col("o_custkey") ===
          org.apache.spark.sql.functions.col("c_custkey")).count()
      assert(j.count() == want)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS bkt_orders")
      spark.sql("DROP TABLE IF EXISTS bkt_customer")
    }
  }

  test("g03: OPTIONAL MATCH key-correlates — no row-tag materialization barrier") {
    // id-identified correlated refs run the inner match per distinct
    // entity and left-join by id; no monotonically_increasing_id tag,
    // no eager checkpoint (Scan ExistingRDD) of the bound relation
    val p = planOf("g03_optional_match")
    assert(!p.contains("monotonically_increasing_id"), p)
    assert(!p.contains("ExistingRDD"), p)
  }

  test("g41: pattern-exists qual key-correlates — no row-tag materialization barrier") {
    // the NOT exists((a)-[:placed]->(...)) predicate must evaluate per
    // distinct customer and join back by id; the old per-row plan
    // tagged the exploded pair join with monotonically_increasing_id
    // behind a localCheckpoint (a Scan ExistingRDD barrier that
    // materialized |pairs| rows and cut every downstream optimization)
    val p = planOf("g41_foaf_pattern")
    assert(!p.contains("ExistingRDD"), p)
    assert(!p.contains("monotonically_increasing_id"), p)
    assert(!p.contains("CartesianProduct"), p)
    // count-only pair rewrite: the quadratic (a,b) self-join is gone —
    // the pair count comes from a suffix-count window over ONE
    // adjacency scan (partitioned by the middle vertex id)
    assert(p.contains("Window"), p)
  }
}
