package graft.cypher

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.expr.J
import Ast._
import Kind._

/** Iterative graph algorithms as driver-side DataFrame loops
  * (SURVEY §2.4, §3.4, §4.3: no custom physical operators — Catalyst
  * plans each level; localCheckpoint bounds lineage).
  *
  * Scale design: frontier expansion is one equi-join per level (shuffle
  * on vertex id); shortest-path search prunes by a visited-(origin,
  * vertex) set (anti-join), so each vertex enters the frontier once per
  * origin — O(V) frontier rows per origin instead of path explosion.
  */
object Algo {

  /** Checkpoint cadence for iterative loops (keeps lineage bounded). */
  private val CheckpointEvery = 4
  // synthetic-name suffix for unnamed path/rel variables: a process
  // counter, NOT hashCode%1000 — two unnamed shortestpath patterns in
  // one query could collide mod 1000 and bind duplicate column names
  // (r12 review). Names are transient plan artifacts; run-to-run
  // stability is not required, uniqueness is.
  private val synthSeq = new java.util.concurrent.atomic.AtomicLong(0L)
  /** Safety cap for unbounded expansions (reference: INT_MAX,
    * execGraphVle.c:33 — we cap pragmatically; uniqueness bounds
    * terminate loops well before this on real data). Configurable per
    * session via `spark.graft.maxDepth` for the rare genuinely deeper
    * traversal — a documented deviation from the reference's
    * unbounded default.
    */
  private val DefaultMaxDepth = 64
  private def maxDepthOf(spark: org.apache.spark.sql.SparkSession): Int =
    spark.conf.get("spark.graft.maxDepth", DefaultMaxDepth.toString).toInt

  /** Skew-safe frontier→adjacency join for the iterative loops.
    *
    * A supernode (hub vertex) concentrates a level's frontier⋈edges
    * shuffle on one task: every frontier row arriving at the hub AND
    * the hub's whole adjacency hash to the same partition, and AQE's
    * skew split cannot amortize it because each BFS/VLE level is a
    * fresh shuffle. With `spark.graft.skew.salt = S > 1`, adjacency
    * rows of hubs (traversal degree >= `spark.graft.skew.hubDegree`)
    * are split into S sub-keys by a deterministic edge-id hash, and
    * each frontier row bound for a hub is replicated S ways — the
    * hub's expansion product becomes S parallel tasks. Non-hub rows
    * pay one broadcast-hash probe and keep salt 0, so results are
    * row-identical to the unsalted join (SkewSaltSpec asserts this).
    * Off by default (salt = 1): the plans are byte-identical to the
    * pre-salt ones and the degree aggregation never runs.
    */
  private[cypher] final class Expander(spark: org.apache.spark.sql.SparkSession,
      E: DataFrame, edgeKey: String) {
    private val salt = spark.conf.get("spark.graft.skew.salt", "1").toInt
    private val hubDegree =
      spark.conf.get("spark.graft.skew.hubDegree", "100000").toLong
    // lazy: the degree aggregation only runs when a join actually
    // happens with salting on (bfs2 builds one Expander per direction
    // but a run may never expand one of them)
    private lazy val hubs: Option[DataFrame] =
      if (salt <= 1) None
      else {
        val h = E.groupBy(col(edgeKey).as("__hub")).count()
          .where(col("count") >= hubDegree).select("__hub")
          .localCheckpoint(true)
        if (h.isEmpty) None else Some(h)
      }
    /** Adjacency with hub rows fanned across `salt` sub-keys. */
    private[cypher] lazy val salted: DataFrame = hubs match {
      case None => E
      case Some(h) =>
        E.join(broadcast(h), col(edgeKey) === col("__hub"), "left")
          .withColumn("__esalt", when(col("__hub").isNotNull,
            pmod(hash(col("__edge").getField("id")), lit(salt)))
            .otherwise(lit(0)))
          .drop("__hub")
    }
    /** frontier ⋈ E on `fKey === edgeKey && extra`, skew-safe. */
    def join(frontier: DataFrame, fKey: Column, extra: Column): DataFrame =
      hubs match {
        case None => frontier.join(E, fKey === col(edgeKey) && extra)
        case Some(h) =>
          val f = frontier.join(broadcast(h), fKey === col("__hub"), "left")
            .withColumn("__fsalt", explode(when(col("__hub").isNotNull,
              sequence(lit(0), lit(salt - 1))).otherwise(array(lit(0)))))
            .drop("__hub")
          f.join(salted,
            fKey === col(edgeKey) && col("__fsalt") === col("__esalt") && extra)
            .drop("__fsalt", "__esalt")
      }
  }

  // ================================================================ VLE

  /** Variable-length expansion -[e:t*lo..hi]-> joined onto the frame.
    * Produces relName (array<edge>) and `relName__vs` (array<vertex> of
    * the vertices after each hop) columns, then binds the target node.
    * Mirrors execGraphVle.c DFS semantics: per-path edge uniqueness,
    * zero-length support, undirected via both-orientation scan.
    */
  /** @param needVerts whether the expansion must carry intermediate
    *   vertex STRUCTS (only a bound path variable consumes them —
    *   nodes(p)/graphpath construction). Without one, the per-level
    *   join against the all-labels vertex union — the widest scan in
    *   the loop — is skipped entirely and the array stays empty.
    */
  def vleJoin(b: Builder, st0: State, prevName: String, rel: RelPattern,
      node: NodePattern, relName: String, lo: Long,
      hiOpt: Option[Long], needVerts: Boolean = true): (State, String) = {
    val spark = b.spark
    val MaxDepth = maxDepthOf(spark)
    val hi = hiOpt.getOrElse(MaxDepth.toLong).min(MaxDepth.toLong)

    val E = {
      // keep the loop frames narrow: drop shred sidecar passthroughs
      val base = b.edgeScan(rel.types, rel.direction, rel.only)
        .select(col("__edge"), col("__s"), col("__e"))
      rel.props match {
        case Some(pe) =>
          // constant prop constraint on every traversed edge
          val comp = b.compiler(State(base, Vector.empty))
          val propsCol = col("__edge").getField("properties")
          val qual = pe match {
            case MapExpr(fields) =>
              fields.map { case (k, v) =>
                J.eq(J.getKey(propsCol, k), comp.toJ(comp.compile(v)))
              }.reduceOption(_ && _).getOrElse(lit(true))
            case other => J.contains(propsCol, comp.toJ(comp.compile(other)))
          }
          base.where(qual)
        case None => base
      }
    }

    val ex = new Expander(spark, E, "__s")

    val V = b.vertexScan(None, only = false)
      .select(struct(col("id"), col("properties")).as("__v"), col("id").as("__vid"))

    // seed the expansion from the frame's bound start vertices only
    // (semi-join on the snapshotted origin set) — a selective outer
    // pattern must not pay a whole-graph expansion
    val origins = st0.df
      .select(col(Compiler.q(prevName)).getField("id").as("__origin"))
      .distinct().localCheckpoint(true)

    // depth-1 frontier
    def firstFrontier: DataFrame = {
      val seeded = E.join(origins, col("__s") === col("__origin"), "left_semi")
      val withV =
        if (needVerts) seeded.join(V, col("__e") === col("__vid"))
        else seeded
      withV.select(col("__s").as("__start"), col("__e").as("__cur"),
        array(col("__edge")).as("__edges"),
        array(col("__edge").getField("id")).as("__ids"),
        (if (needVerts) array(col("__v")) else b.emptyVertexArray)
          .as("__verts"))
    }

    var frontier = firstFrontier
    var results: DataFrame = null
    def accumulate(k: Long, df: DataFrame): Unit =
      if (k >= math.max(lo, 1L) && k <= hi) {
        results = if (results == null) df else results.unionAll(df)
      }
    accumulate(1L, frontier)

    // Emptiness probes cost a full materialization of the frontier
    // plan, so only pay them when the remaining depth is unbounded in
    // practice (short bounded ranges like *2..3 just run their <=2
    // extra joins lazily inside the final plan).
    val probeEmptiness = hi - 1L > CheckpointEvery
    var k = 1L
    var exhausted = false
    while (k < hi && !exhausted) {
      if (probeEmptiness) exhausted = frontier.isEmpty
      if (!exhausted) {
        val step = ex.join(frontier, col("__cur"),
          !array_contains(col("__ids"), col("__edge").getField("id")))
        val withV =
          if (needVerts) step.join(V, col("__e") === col("__vid"))
          else step
        val next = withV
          .select(col("__start"), col("__e").as("__cur"),
            concat(col("__edges"), array(col("__edge"))).as("__edges"),
            concat(col("__ids"), array(col("__edge").getField("id"))).as("__ids"),
            (if (needVerts) concat(col("__verts"), array(col("__v")))
             else col("__verts")).as("__verts"))
        k += 1
        frontier = if (k % CheckpointEvery == 0) next.localCheckpoint(true) else next
        accumulate(k, frontier)
      }
    }

    // Loud cap (the reference's default bound is INT_MAX,
    // execGraphVle.c:33, so an unbounded `*..` never truncates there):
    // when the pattern's upper bound came from the cap rather than the
    // query AND the expansion can still extend past it, error instead
    // of silently dropping the deeper paths — the user raises
    // spark.graft.maxDepth (checkpoint cadence keeps lineage bounded)
    // or writes an explicit upper bound.
    if (hiOpt.forall(_ > MaxDepth.toLong) && !exhausted) {
      val more = ex.join(frontier, col("__cur"),
        !array_contains(col("__ids"), col("__edge").getField("id")))
      if (more.head(1).nonEmpty) throw new IllegalStateException(
        s"variable-length expansion exceeded the depth cap $MaxDepth with " +
          "paths still extending; raise spark.graft.maxDepth or bound the " +
          "pattern (reference default is unbounded, execGraphVle.c:33)")
    }

    var vle = if (results == null)
      spark.createDataFrame(java.util.Collections.emptyList[org.apache.spark.sql.Row](),
        StructType(Seq(
          StructField("__start", LongType), StructField("__cur", LongType),
          StructField("__edges", ArrayType(b.edgeStructType)),
          StructField("__ids", ArrayType(LongType)),
          StructField("__verts", ArrayType(b.vertexStructType)))))
      else results

    if (lo == 0L) {
      // zero-length path: every origin vertex joins to itself with
      // empty arrays (isZeroLengthVLE parse_graph.c:198,2388-2404);
      // origins come from bound vertex scans, so no existence re-check
      val zero = origins
        .select(col("__origin").as("__start"), col("__origin").as("__cur"),
          b.emptyEdgeArray.as("__edges"), b.emptyLongArray.as("__ids"),
          b.emptyVertexArray.as("__verts"))
      vle = zero.unionAll(vle)
    }

    joinExpansion(b, st0, prevName, node, relName, vle)
  }

  /** Join an expansion relation (cols __start/__cur/__edges/__verts)
    * onto the outer frame and bind the target node.
    */
  private def joinExpansion(b: Builder, st0: State, prevName: String,
      node: NodePattern, relName: String, vle: DataFrame): (State, String) = {
    var st = st0
    val prevId = col(Compiler.q(prevName)).getField("id")
    val expansion = vle.select(col("__start").as(s"__vs0_$relName"),
      col("__cur").as(s"__ve_$relName"),
      col("__edges").as(relName),
      col("__verts").as(s"${relName}__vs"))
    var df = st.df.join(expansion, prevId === col(s"__vs0_$relName"))
    st = State(df, st.vars :+ (relName -> KEL))
    val nodeName = node.variable.getOrElse(s"__vt_$relName")
    if (st.has(nodeName)) {
      df = st.df.where(col(s"__ve_$relName") === col(Compiler.q(nodeName)).getField("id"))
      st = State(df, st.vars)
      // a label on the re-bound target is a constraint, not a scan —
      // it must filter here exactly like the fresh-bind scan would
      // (ONLY = exact label, otherwise inheritance subtree), including
      // the unknown-label / wrong-kind diagnostics
      node.label.foreach { l =>
        b.labelOfKind(l, 'v')
        val labids = b.labidsOf(l, node.only).toSeq
        st = State(st.df.where(
          shiftrightunsigned(col(Compiler.q(nodeName)).getField("id"), 48)
            .cast("int").isin(labids: _*)), st.vars)
      }
    } else {
      val scan = b.vertexScan(node.label, node.only)
        .select(struct(col("id"), col("properties")).as(nodeName))
      df = st.df.join(scan,
        col(s"__ve_$relName") === col(Compiler.q(nodeName)).getField("id"))
      st = State(df, st.vars :+ (nodeName -> KV))
    }
    node.props.foreach { pe =>
      val comp = b.compiler(st)
      val propsCol = col(Compiler.q(nodeName)).getField("properties")
      val qual = pe match {
        case MapExpr(fields) =>
          fields.map { case (k, v) =>
            J.eq(J.getKey(propsCol, k), comp.toJ(comp.compile(v)))
          }.reduceOption(_ && _).getOrElse(lit(true))
        case other => J.contains(propsCol, comp.toJ(comp.compile(other)))
      }
      st = State(st.df.where(qual), st.vars)
    }
    st = State(st.df.drop(s"__vs0_$relName", s"__ve_$relName"), st.vars)
    (st, nodeName)
  }

  // ==================================================== shortest paths

  /** shortestpath/allshortestpaths/dijkstra over a single-hop-var
    * pattern (parse_shortestpath.c surface). BFS with visited-set
    * pruning: each (origin, vertex) enters the frontier at its minimal
    * depth only (the set-based analog of nodeShortestpath.c's two-sided
    * hash expansion).
    */
  def findPaths(b: Builder, st0: State, p: PathPattern,
      finder: PathFinder): (State, Vector[(String, Kind)]) = {
    require(p.tail.length == 1, "path finder patterns take exactly one relationship")
    val (rel, targetNode) = p.tail.head
    val sourceNode = p.head

    // bind endpoints first (label/prop constrained scans or bound vars)
    var (st, srcName) = b.bindNode(st0, sourceNode)
    // snapshot source ids BEFORE the target binds (its scan cross-joins
    // into the frame; the origin set must not pay that product)
    val srcId0 = col(Compiler.q(srcName)).getField("id")
    val origins = st.df.select(srcId0.as("__origin")).distinct()
      .localCheckpoint(true)
    val (st2, tgtName) = b.bindNode(st, targetNode)
    st = st2
    val tgtId0 = col(Compiler.q(tgtName)).getField("id")
    // target snapshot is only consumed by the two-sided strategy — the
    // (default) one-sided search must not pay the extra materialization
    lazy val targets = st.df.select(tgtId0.as("__target")).distinct()
      .localCheckpoint(true)

    // reference restrictions (parse_shortestpath.c): dijkstra rejects
    // variable-length relationships outright (checkRelFormatForDijkstra,
    // parse_shortestpath.c:1068-1079 "variable length relationship is
    // not supported"); shortestpath allows minimal length 0 or 1 only
    // (parse_shortestpath.c:238-247)
    finder match {
      case _: PathFinder.Dijkstra if rel.varLength.isDefined =>
        throw new IllegalArgumentException(
          "variable length relationship is not supported")
      case _ =>
        if (rel.varLength.flatMap(_._1).exists(_ > 1L))
          throw new IllegalArgumentException(
            "only 0 or 1 is allowed for minimal length")
    }
    val (lo, hi) = rel.varLength.getOrElse((Some(1L), Some(1L)))
    val loV = lo.getOrElse(1L)
    val MaxDepth = maxDepthOf(b.spark)
    val hiV = hi.getOrElse(MaxDepth.toLong).min(MaxDepth.toLong)
    // true when the effective bound came from the ENGINE cap, not the
    // query (reference searches to LONG_MAX for `[*]`,
    // parse_shortestpath.c:458) — the searches fail loud if they hit it
    // with pairs still unmatched and paths still extending. The message
    // distinguishes an unbounded pattern from an explicit user bound the
    // cap CLIPPED ([*..100] with cap 64): only "raise the cap" applies
    // to the latter (r10 ADVICE).
    val capped = hi.getOrElse(Long.MaxValue) > MaxDepth.toLong
    val capMsg: Option[String] =
      if (!capped) None
      else Some(hi match {
        case Some(u) =>
          s"shortest-path search exceeded the depth cap $MaxDepth " +
            s"(spark.graft.maxDepth), which clipped the query's explicit " +
            s"upper bound [*..$u], with endpoint pairs still unmatched " +
            s"and the frontier still extending; raise spark.graft.maxDepth " +
            s"to at least $u"
        case None =>
          s"shortest-path search exceeded the depth cap $MaxDepth " +
            "with endpoint pairs still unmatched and the frontier still " +
            "extending; raise spark.graft.maxDepth or bound the pattern " +
            "(the reference searches unbounded, parse_shortestpath.c:458)"
      })
    val synthId = synthSeq.incrementAndGet()
    val relName = rel.variable.getOrElse(s"__sp_e_$synthId")

    // Source-constrained search: expand only from the bound source
    // vertices instead of every vertex (the set-based analog of the
    // reference seeding its two-sided hash expansion from the outer
    // tuple's endpoints, nodeShortestpath.c SP_GET_PARAMETER).
    // Search strategy (spark.graft.pathSearch): "onesided" (default) =
    // forward frontier expansion with visited pruning — wins when
    // forward exploration dead-ends early (typical for selective
    // sources over DAG-ish topologies); "twosided" = meet-in-middle
    // from both endpoint sets (the Hash2Side analog) — wins on deep
    // paths between small endpoint sets over high-branching graphs.
    // Both are cross-validated against the VLE path universe
    // (PathFinderCrossCheckSpec).
    val twoSided = b.spark.conf
      .get("spark.graft.pathSearch", "onesided") match {
      case "twosided" => true
      case "auto" =>
        // Cost-based strategy choice from catalog-level stats (the
        // lakehouse stand-in for the reference's auto-gathered
        // ag_graphmeta): meet-in-middle halves the depth exponent, so
        // it wins whenever the graph EXPANDS — avg out-degree d > 1
        // makes one-sided cost |S|·d^L vs two-sided (|S|+|T|)·d^(L/2).
        // On contracting/DAG-ish topologies (d ≤ ~1.5) forward
        // frontiers die out fast and one-sided avoids the second
        // frontier's bookkeeping. Both counts are footer-cheap row
        // counts of the label parquet, negligible next to the search.
        // undirected patterns union both orientations in edgeScan —
        // halve the count or the effective out-degree doubles and the
        // choice flips to twosided too eagerly (r12 review). The /2 is
        // an APPROXIMATION in the presence of self-loops (a self-loop
        // contributes two identical rows to the union, so eCnt slightly
        // undercounts a true undirected edge count) — acceptable here
        // because this feeds only the d > 1.5 cost heuristic, never a
        // result (r12 advice; count distinct edge ids if exactness
        // ever matters)
        val eRaw = b.edgeScan(rel.types, rel.direction, rel.only).count()
        val eCnt = if (rel.direction == 0) eRaw / 2 else eRaw
        val vCnt = b.vertexScan(None, only = false).count()
        val choice = vCnt > 0 && eCnt * 2 > vCnt * 3 // d > 1.5
        // thread-local probe, NOT session conf: two concurrent queries
        // on one session must not clobber each other's value (same fix
        // as lastDijkstraRounds)
        lastPathSearchChoice.set(if (choice) "twosided" else "onesided")
        choice
      case _ => false
    }
    val paths = finder match {
      case PathFinder.Dijkstra(weight, qual, limitK) =>
        dijkstra(b, rel, relName, weight, qual, limitK.getOrElse(1L), origins,
          targets)
      case PathFinder.AllShortest =>
        if (twoSided)
          bfs2(b, rel, loV, hiV, keepAll = true, origins, targets, capMsg)
        else bfs(b, rel, loV, hiV, keepAll = true, origins, targets, capMsg)
      case _ =>
        if (twoSided)
          bfs2(b, rel, loV, hiV, keepAll = false, origins, targets, capMsg)
        else bfs(b, rel, loV, hiV, keepAll = false, origins, targets, capMsg)
    }

    // join on both endpoints
    val srcId = col(Compiler.q(srcName)).getField("id")
    val tgtId = col(Compiler.q(tgtName)).getField("id")
    var df = st.df.join(paths,
      srcId === col("__start") && tgtId === col("__cur"))
    // path variable struct: vertices = [src] ++ verts, edges
    val pv = p.variable.getOrElse(s"__sp_p_$synthId")
    df = df.withColumn(pv, struct(
      concat(array(col(Compiler.q(srcName))), col("__verts")).as("vertices"),
      col("__edges").as("edges")))
    df = df.drop("__start", "__cur", "__verts", "__ids")
      .withColumnRenamed("__edges", relName)
    val newVars = Vector(relName -> KEL, pv -> KP)
    (State(df, st.vars ++ newVars), Vector(relName -> KEL))
  }

  /** Level-synchronous BFS from every vertex (origins resolve at join
    * time); visited-set pruning keeps one/all minimal-depth paths.
    */
  /** One representative path per (origin, current) — deterministic min
    * by the edge-id array. An aggregation (min_by) rather than a
    * row_number window: partial aggregation combines map-side, so the
    * exchange carries one row per pair instead of sorting the whole
    * frontier through it.
    */
  private def firstArrival(frontier: DataFrame): DataFrame =
    frontier.groupBy("__start", "__cur")
      .agg(min_by(struct(col("__edges"), col("__ids"), col("__vids")),
        col("__ids")).as("__p"))
      .select(col("__start"), col("__cur"), col("__p.__edges").as("__edges"),
        col("__p.__ids").as("__ids"), col("__p.__vids").as("__vids"))

  private def bfs(b: Builder, rel: RelPattern, lo: Long, hi: Long,
      keepAll: Boolean, origins: DataFrame, targets: => DataFrame,
      capMsg: Option[String]): DataFrame = {
    val E0 = b.edgeScan(rel.types, rel.direction, rel.only)
    val E = E0.select(col("__edge"), col("__s"), col("__e"))
    val ex = new Expander(b.spark, E, "__s")
    val V = b.vertexScan(None, only = false)
      .select(struct(col("id"), col("properties")).as("__v"), col("id").as("__vid"))

    // The search carries vertex IDS only (__vids); vertex structs are
    // re-attached once at the end for the surviving minimal paths —
    // the per-level vertex join (the widest scan in the loop) happens
    // once instead of once per level.
    var frontier = E.join(origins, col("__s") === col("__origin"), "left_semi")
      .select(col("__s").as("__start"), col("__e").as("__cur"),
        array(col("__edge")).as("__edges"),
        array(col("__edge").getField("id")).as("__ids"),
        array(col("__e")).as("__vids"))
    if (!keepAll) frontier = firstArrival(frontier)
    // every level is probed for emptiness AND consumed by the final
    // plan: materialize each exactly once (the probe then reads the
    // cached partitions and the result union re-reads them for free)
    frontier = frontier.localCheckpoint(true)
    // note: the origin itself is NOT pre-marked visited — a cycle back
    // to the origin is a valid shortest path (shortestpath((a)-[*]->(a)))
    var visited = frontier
      .select(col("__start").as("__o"), col("__cur").as("__at"))
      .distinct()

    var results: DataFrame = null
    def accumulate(k: Long, df: DataFrame): Unit =
      if (k >= math.max(lo, 1L) && k <= hi) {
        results = if (results == null) df else results.unionAll(df)
      }
    accumulate(1L, frontier)

    var k = 1L
    var exhausted = frontier.isEmpty
    while (k < hi && !exhausted) {
      var next = ex.join(frontier, col("__cur"),
          !array_contains(col("__ids"), col("__edge").getField("id")))
        .select(col("__start"), col("__e").as("__newcur"),
          concat(col("__edges"), array(col("__edge"))).as("__edges"),
          concat(col("__ids"), array(col("__edge").getField("id"))).as("__ids"),
          concat(col("__vids"), array(col("__e"))).as("__vids"))
        .withColumnRenamed("__newcur", "__cur")
      // prune: only first arrivals per (origin, vertex)
      next = next.join(visited,
        next("__start") === visited("__o") && next("__cur") === visited("__at"),
        "left_anti")
      if (!keepAll) next = firstArrival(next)
      k += 1
      frontier = next.localCheckpoint(true)
      exhausted = frontier.isEmpty
      if (!exhausted) {
        accumulate(k, frontier)
        // no distinct/materialize: duplicates are harmless on the
        // anti-join probe side, and each frontier is already
        // checkpointed so the union stays shallow — one less job per
        // level
        visited = visited.unionAll(
          frontier.select(col("__start").as("__o"), col("__cur").as("__at")))
      }
    }

    // Loud cap, target-aware (same philosophy as the VLE cap at line
    // ~201; the reference searches to LONG_MAX for an unbounded
    // pattern, parse_shortestpath.c:458): when the bound came from the
    // ENGINE cap and the frontier is still live, results may be missing
    // pairs that first connect deeper — error UNLESS every requested
    // (origin, target) pair already has its shortest path (then deeper
    // frontiers cannot change the answer). The check runs only in the
    // rare cap-hit case.
    if (capMsg.isDefined && !exhausted) {
      // every matched (start, cur) pair has start IN origins by
      // construction; restricting cur to the target set makes the
      // distinct matched-pair set a SUBSET of origins x targets, so
      // completeness is a count comparison — no |V|^2 cross-product
      // probe just to decide whether to throw (r10 ADVICE; bfs2 keeps
      // the same invariant via its metCount counter)
      var matched = (if (results == null) emptyIdPaths(b) else results)
        .select(col("__start").as("__mo"), col("__cur").as("__mt"))
        .join(targets, col("__mt") === col("__target"), "left_semi")
      if (lo == 0L)
        matched = matched.unionAll(origins
          .join(targets, col("__origin") === col("__target"), "left_semi")
          .select(col("__origin").as("__mo"), col("__origin").as("__mt")))
      val allPairs = origins.count() * targets.count()
      if (matched.distinct().count() < allPairs)
        throw new IllegalStateException(capMsg.get)
    }

    var out = if (results == null) emptyIdPaths(b) else results
    if (lo == 0L) {
      val zero = origins
        .select(col("__origin").as("__start"), col("__origin").as("__cur"),
          b.emptyEdgeArray.as("__edges"), b.emptyLongArray.as("__ids"),
          b.emptyLongArray.as("__vids"))
      out = zero.unionAll(out)
    }
    // keep only minimal depth per pair (visited pruning already ensures
    // min-depth-only arrivals; zero-length needs the same guard)
    val kept =
      if (keepAll)
        out.withColumn("__minlen",
          min(size(col("__ids"))).over(Window.partitionBy("__start", "__cur")))
          .where(size(col("__ids")) === col("__minlen")).drop("__minlen")
      else
        // single-path case: min over (depth, ids) in ONE map-side-
        // combinable aggregation instead of a min-window + rank-window
        out.groupBy("__start", "__cur")
          .agg(min_by(struct(col("__edges"), col("__ids"), col("__vids")),
            struct(size(col("__ids")), col("__ids"))).as("__p"))
          .select(col("__start"), col("__cur"),
            col("__p.__edges").as("__edges"), col("__p.__ids").as("__ids"),
            col("__p.__vids").as("__vids"))
    attachVerts(b, kept, V)
  }

  /** Two-sided (meet-in-middle) BFS — the set-based analog of the
    * reference's Hash2Side executor (nodeShortestpath.c /
    * nodeHash2Side.c): frontiers expand alternately from the bound
    * sources (forward) and targets (backward), so each side explores
    * only half the path depth. Lengths are scanned in increasing order
    * (a meet after expansions (f, b) has length exactly f+b), so the
    * first meet per (source, target) pair is its shortest; met pairs
    * are anti-joined out of later meets.
    *
    * Pruning invariant: every vertex on a shortest path sits at its
    * minimal forward depth from the source AND minimal backward depth
    * from the target (otherwise splicing a shorter prefix/suffix
    * contradicts minimality), so the per-side visited sets preserve
    * every shortest path. Searches carry vertex ids only; structs
    * re-attach once at the end.
    */
  private def bfs2(b: Builder, rel: RelPattern, lo: Long, hi: Long,
      keepAll: Boolean, origins: DataFrame, targets: DataFrame,
      capMsg: Option[String]): DataFrame = {
    val E0 = b.edgeScan(rel.types, rel.direction, rel.only)
    val E = E0.select(col("__edge"), col("__s"), col("__e"))
    // forward expands out of __s (out-adjacency), backward into __e
    // (in-adjacency) — hub degrees differ per direction
    val exF = new Expander(b.spark, E, "__s")
    val exB = new Expander(b.spark, E, "__e")
    val V = b.vertexScan(None, only = false)
      .select(struct(col("id"), col("properties")).as("__v"), col("id").as("__vid"))

    // depth-0 states: the endpoints themselves, empty arrays (cheap
    // projections of the already-snapshotted endpoint sets — no
    // checkpoint needed)
    var fwd = origins.select(col("__origin").as("__start"),
      col("__origin").as("__cur"),
      b.emptyEdgeArray.as("__edges"), b.emptyLongArray.as("__ids"),
      b.emptyLongArray.as("__vids"))
    var bwd = targets.select(col("__target").as("__tgt"),
      col("__target").as("__bcur"),
      b.emptyEdgeArray.as("__bedges"), b.emptyLongArray.as("__bids"),
      b.emptyLongArray.as("__bvids"))

    // the endpoints are NOT pre-marked visited — the same invariant the
    // one-sided search documents: a cycle back to the endpoint is a
    // valid shortest path, and pre-seeding the depth-0 states pruned
    // the only split of a length-1 self-loop when origin == target
    // (r12 review; PathFinderCrossCheckSpec pins it). First re-arrival
    // at an endpoint lands in visited like any other vertex, so later
    // (longer) re-arrivals still prune.
    var visitedF = fwd.select(col("__start").as("__o"), col("__cur").as("__at"))
      .where(lit(false))
    var visitedB = bwd.select(col("__tgt").as("__o"), col("__bcur").as("__at"))
      .where(lit(false))

    // met (source, target) pairs: later meets for them are longer
    // paths. When every pair has met, the search is done — the classic
    // two-sided early exit (both endpoint sets are known up front).
    val allPairs = origins.count() * targets.count()
    var metCount = 0L
    var met: DataFrame = null
    var results: DataFrame = null

    def meets(): DataFrame = {
      var m = fwd.join(bwd, col("__cur") === col("__bcur") &&
          !arrays_overlap(col("__ids"), col("__bids")))
        .select(col("__start"),
          col("__tgt").as("__cur"),
          concat(col("__edges"), col("__bedges")).as("__edges"),
          concat(col("__ids"), col("__bids")).as("__ids"),
          concat(col("__vids"), col("__bvids")).as("__vids"))
      if (met != null)
        m = m.join(met, m("__start") === met("__ms") && m("__cur") === met("__mt"),
          "left_anti")
      m
    }

    def absorb(newMeets: DataFrame, len: Long): Unit = {
      val materialized = newMeets.localCheckpoint(true)
      if (!materialized.isEmpty) {
        if (len >= lo && len <= hi) {
          results = if (results == null) materialized
            else results.unionAll(materialized)
        }
        val pairs = materialized
          .select(col("__start").as("__ms"), col("__cur").as("__mt")).distinct()
        met = (if (met == null) pairs else met.unionAll(pairs).distinct())
          .localCheckpoint(true)
        metCount = met.count()
      }
    }

    // L = 0 would be the zero-length case — excluded here (the lo == 0
    // branch below mirrors the one-sided zero-length semantics)
    var fdepth = 0L
    var bdepth = 0L
    var exhausted = false
    while (fdepth + bdepth < hi && !exhausted && metCount < allPairs) {
      val expandForward = fdepth <= bdepth
      if (expandForward) {
        var next = exF.join(fwd, col("__cur"),
            !array_contains(col("__ids"), col("__edge").getField("id")))
          .select(col("__start"), col("__e").as("__newcur"),
            concat(col("__edges"), array(col("__edge"))).as("__edges"),
            concat(col("__ids"), array(col("__edge").getField("id"))).as("__ids"),
            concat(col("__vids"), array(col("__e"))).as("__vids"))
          .withColumnRenamed("__newcur", "__cur")
        next = next.join(visitedF,
          next("__start") === visitedF("__o") && next("__cur") === visitedF("__at"),
          "left_anti")
        // ALL minimal-depth arrivals stay (unlike the one-sided growing
        // path, the two halves are combined later — pruning one side to
        // a representative could leave only edge-overlapping pairs and
        // lose a valid shortest path); the single-path pick happens at
        // the final per-pair window
        fwd = next.localCheckpoint(true)
        fdepth += 1
        exhausted = fwd.isEmpty
        if (!exhausted) {
          // duplicates are harmless on the anti-join probe side;
          // frontiers are checkpointed so the union stays shallow
          visitedF = visitedF.unionAll(
            fwd.select(col("__start").as("__o"), col("__cur").as("__at")))
          absorb(meets(), fdepth + bdepth)
        }
      } else {
        var next = exB.join(bwd, col("__bcur"),
            !array_contains(col("__bids"), col("__edge").getField("id")))
          .select(col("__tgt"), col("__s").as("__newbcur"),
            concat(array(col("__edge")), col("__bedges")).as("__bedges"),
            concat(array(col("__edge").getField("id")), col("__bids")).as("__bids"),
            concat(array(col("__bcur")), col("__bvids")).as("__bvids"))
          .withColumnRenamed("__newbcur", "__bcur")
        next = next.join(visitedB,
          next("__tgt") === visitedB("__o") && next("__bcur") === visitedB("__at"),
          "left_anti")
        bwd = next.localCheckpoint(true)
        bdepth += 1
        exhausted = bwd.isEmpty
        if (!exhausted) {
          visitedB = visitedB.unionAll(
            bwd.select(col("__tgt").as("__o"), col("__bcur").as("__at")))
          absorb(meets(), fdepth + bdepth)
        }
      }
    }

    // Loud cap, target-aware (see bfs): the two-sided search already
    // tracks met pairs, so the unmatched test is the counter it keeps
    // (zero-length pairs join the met set below, so count them first)
    if (capMsg.isDefined && !exhausted && metCount < allPairs) {
      val zeroPairs = if (lo == 0L)
        origins.join(targets, col("__origin") === col("__target"),
          "left_semi").count()
      else 0L
      val stillMissing =
        if (met == null) allPairs > zeroPairs
        else {
          var m = met
          if (lo == 0L)
            m = m.unionAll(origins
              .join(targets, col("__origin") === col("__target"), "left_semi")
              .select(col("__origin").as("__ms"), col("__origin").as("__mt")))
          origins.crossJoin(targets)
            .join(m, col("__origin") === col("__ms") &&
              col("__target") === col("__mt"), "left_anti")
            .head(1).nonEmpty
        }
      if (stillMissing) throw new IllegalStateException(capMsg.get)
    }

    var out = if (results == null) emptyIdPaths(b) else results
    if (lo == 0L) {
      // zero-length: origin == target pairs (isZeroLengthVLE analog)
      val zero = origins
        .join(targets, col("__origin") === col("__target"), "left_semi")
        .select(col("__origin").as("__start"), col("__origin").as("__cur"),
          b.emptyEdgeArray.as("__edges"), b.emptyLongArray.as("__ids"),
          b.emptyLongArray.as("__vids"))
      out = zero.unionAll(out)
    }
    // minimal length per pair (first-meet scanning already guarantees
    // it for the search; the zero-length branch needs the same guard)
    val kept =
      if (keepAll)
        out.withColumn("__minlen",
          min(size(col("__ids"))).over(Window.partitionBy("__start", "__cur")))
          .where(size(col("__ids")) === col("__minlen")).drop("__minlen")
      else
        out.groupBy("__start", "__cur")
          .agg(min_by(struct(col("__edges"), col("__ids"), col("__vids")),
            struct(size(col("__ids")), col("__ids"))).as("__p"))
          .select(col("__start"), col("__cur"),
            col("__p.__edges").as("__edges"), col("__p.__ids").as("__ids"),
            col("__p.__vids").as("__vids"))
    attachVerts(b, kept, V)
  }

  /** Re-attach vertex structs for surviving paths: posexplode the
    * visited-vertex id array, one join against the vertex scan, rebuild
    * the array in path order. Zero-length paths keep empty arrays.
    */
  private def attachVerts(b: Builder, paths: DataFrame, V: DataFrame): DataFrame = {
    val keyed = paths.withColumn("__pk", monotonically_increasing_id())
      .localCheckpoint(true)
    val exploded = keyed
      .select(col("__pk"), posexplode(col("__vids")).as(Seq("__pos", "__vx")))
      .join(V, col("__vx") === col("__vid"))
      .groupBy("__pk")
      .agg(collect_list(struct(col("__pos"), col("__v"))).as("__pv"))
      .select(col("__pk").as("__pk2"),
        transform(array_sort(col("__pv")), x => x.getField("__v")).as("__verts"))
    keyed.join(exploded, col("__pk") === col("__pk2"), "left")
      .withColumn("__verts", coalesce(col("__verts"), b.emptyVertexArray))
      .drop("__pk", "__pk2", "__vids")
  }

  /** Bellman-Ford-style weighted search keeping top-k cheapest paths
    * per (origin, vertex) (nodeDijkstra.c pairing-heap semantics,
    * set-based: converges in <= V relaxation rounds).
    */
  private def dijkstra(b: Builder, rel: RelPattern, relName: String,
      weight: Expr, qual: Option[Expr], limitK: Long,
      origins: DataFrame, targets: => DataFrame): DataFrame = {
    val E0 = b.edgeScan(rel.types, rel.direction, rel.only)
    // compile weight/qual with the edge struct bound under the rel
    // name — through the BUILDER's compiler factory, so $parameters
    // and label()/type() resolve against the session's parameter map
    // and labid catalog exactly as in any other expression (an empty
    // labid map would silently resolve every label() to NULL and an
    // empty param map would reject a legitimate $param)
    val kinds = Map(relName -> (KE: Kind))
    val comp = b.compilerFor(kinds)
    val E1 = E0.withColumn(relName, col("__edge"))
    // the qual prunes which edges are traversable — evaluate on the
    // scan; the WEIGHT is deferred to traversed edges only (the seed
    // semi-join and each expansion join shrink the edge set first, so
    // the jsonb weight expression never runs over the whole label)
    val E2 = qual.map(q => E1.where(comp.toBool(comp.compile(q)))).getOrElse(E1)
    val E = E2.select(col("__edge"), col("__s"), col("__e"))
    val ex = new Expander(b.spark, E, "__s")
    def withWeight(df: DataFrame): DataFrame =
      df.withColumn(relName, col("__edge"))
        .withColumn("__w",
          coalesce(J.toDouble(comp.toJ(comp.compile(weight))), lit(1.0)))
        .drop(relName)

    val V = b.vertexScan(None, only = false)
      .select(struct(col("id"), col("properties")).as("__v"), col("id").as("__vid"))

    def topK(df: DataFrame): DataFrame =
      if (limitK == 1L) {
        // cheapest-path-only (the default): min_by aggregation instead
        // of a rank window — partial aggregation combines map-side
        val payload = df.columns.filterNot(Set("__start", "__cur"))
        df.groupBy("__start", "__cur")
          .agg(min_by(struct(payload.map(col): _*),
            struct(col("__dist"), size(col("__ids")), col("__ids")))
            .as("__p"))
          .select(col("__start") +: col("__cur") +:
            payload.map(c => col(s"__p.$c").as(c)): _*)
      } else {
        val w = Window.partitionBy("__start", "__cur")
          .orderBy(col("__dist"), size(col("__ids")), col("__ids"))
        df.withColumn("__rn", row_number().over(w))
          .where(col("__rn") <= limitK).drop("__rn")
      }

    // ids-only DELTA relaxation (vertex structs re-attach once at the
    // end, like bfs): only paths that entered the top-k set last round
    // expand again — settled paths never rejoin the edge table (the
    // set-based form of Bellman-Ford's "only relax out of changed
    // vertices"). A survivor tag doubles as the convergence test, so a
    // round costs one join + one window — no aggregate-diff pass.
    // An expanded path can never be row-identical to an existing one
    // (it is strictly longer than its source path), so "__new survived
    // the top-k window" exactly means "the best-set changed".
    var best = topK(withWeight(
      E.join(origins, col("__s") === col("__origin"), "left_semi"))
      .select(col("__s").as("__start"), col("__e").as("__cur"),
        array(col("__edge")).as("__edges"),
        array(col("__edge").getField("id")).as("__ids"),
        array(col("__e")).as("__vids"),
        col("__w").as("__dist")))
      .withColumn("__new", lit(1))
      .localCheckpoint(true)

    // Target-side termination (the set-based form of the reference's
    // pairing-heap early exit, nodeDijkstra.c:37-50): the only rows
    // findPaths consumes are (origin, target) pairs, and with
    // NON-NEGATIVE weights an extension is never cheaper than its
    // source path — so once an origin has a full k-set at EVERY
    // target, any frontier path costlier than that origin's worst
    // settled target distance can neither displace a target entry nor
    // lead anywhere that could. Pruning is strict (> bound): an
    // equal-cost path may still win the (dist, length, ids) tiebreak
    // through zero-weight edges. Negative weights break the bound —
    // the conf restores the plain fixpoint (the reference's Dijkstra
    // assumes non-negative weights too).
    val prune = b.spark.conf
      .get("spark.graft.dijkstraTargetPrune", "true") != "false"
    // arming is LAZY (the target snapshot materializes only if a third
    // round happens) and bounded: with an unselective target set (a
    // bare (b) pattern = every vertex) the "all (origin,target) k-sets
    // full" condition essentially never fires, so the per-round bounds
    // aggregation would be pure overhead — past the cap the search
    // just runs the plain fixpoint
    val pruneMaxTargets = b.spark.conf
      .get("spark.graft.dijkstraPruneMaxTargets", "65536").toLong
    lazy val nTargets = {
      val n = targets.count()
      if (n > pruneMaxTargets) 0L else n
    }
    // the bounds aggregation (2 shuffles/round + the frontier join) is
    // pure overhead on shallow searches that finish before any prune
    // could fire — measured ~2x on 2-hop graphs — so pruning arms only
    // from the third round on; deep searches (where it is the
    // asymptotic win) keep the early exit
    def pruneFrontier(f: DataFrame, round: Int): DataFrame = {
      if (!prune || round < 2 || nTargets == 0L) return f
      val bounds = best
        .join(targets, col("__cur") === col("__target"), "left_semi")
        .groupBy("__start", "__cur")
        .agg(count(lit(1)).as("__n"), max(col("__dist")).as("__kd"))
        .groupBy("__start")
        .agg(count(lit(1)).as("__nt"), min(col("__n")).as("__minn"),
          max(col("__kd")).as("__bound"))
        .where(col("__nt") === nTargets && col("__minn") === limitK)
        .select(col("__start").as("__bstart"), col("__bound"))
      f.join(bounds, col("__start") === col("__bstart"), "left")
        .where(col("__bound").isNull || col("__dist") <= col("__bound"))
        .drop("__bstart", "__bound")
    }

    var rounds = 0
    var frontier = pruneFrontier(best, rounds)
    val MaxDepth = maxDepthOf(b.spark)
    var live = frontier.head(1).nonEmpty
    while (rounds < MaxDepth && live) {
      val expanded = withWeight(
        ex.join(frontier, col("__cur"),
          !array_contains(col("__ids"), col("__edge").getField("id"))))
        .select(col("__start"), col("__e").as("__cur2"),
          concat(col("__edges"), array(col("__edge"))).as("__edges"),
          concat(col("__ids"), array(col("__edge").getField("id"))).as("__ids"),
          concat(col("__vids"), array(col("__e"))).as("__vids"),
          (col("__dist") + col("__w")).as("__dist"))
        .withColumnRenamed("__cur2", "__cur")
        .withColumn("__new", lit(1))
      best = topK(best.withColumn("__new", lit(0)).unionAll(expanded))
        .localCheckpoint(true)
      rounds += 1
      frontier = pruneFrontier(best.where(col("__new") === 1), rounds)
      live = frontier.head(1).nonEmpty
    }
    lastDijkstraRounds.set(rounds)
    // the reference relaxes to convergence (nodeDijkstra's heap drains);
    // stopping at the engine cap with paths still improving could
    // return non-minimal weights — fail loud like the VLE cap instead
    // of silently answering
    if (rounds == MaxDepth && live) throw new IllegalStateException(
      s"dijkstra did not converge within the depth cap $MaxDepth (paths " +
        "still relaxing); raise spark.graft.maxDepth or restrict the " +
        "pattern (the reference searches to convergence, nodeDijkstra.c)")
    attachVerts(b, best.drop("__w", "__dist", "__new"), V)
  }

  /** Test-observability hook: round count of the most recent dijkstra
    * on THIS thread. The previous session-conf form
    * (`spark.graft.dijkstra.lastRounds`) leaked a test probe into
    * shared session state and let concurrent queries clobber each
    * other's value.
    */
  private val lastDijkstraRounds = new ThreadLocal[Integer]
  def lastDijkstraRoundCount: Option[Int] =
    Option(lastDijkstraRounds.get()).map(_.intValue)

  /** Test-observability hook: the auto path-search strategy decision of
    * the most recent findPaths on THIS thread (same rationale as
    * [[lastDijkstraRoundCount]] — a session-conf probe would let
    * concurrent queries clobber each other and mutates user-visible
    * conf as a planning side effect).
    */
  private val lastPathSearchChoice = new ThreadLocal[String]
  def lastPathSearchChoiceValue: Option[String] =
    Option(lastPathSearchChoice.get())

  private def emptyIdPaths(b: Builder): DataFrame =
    b.spark.createDataFrame(java.util.Collections.emptyList[org.apache.spark.sql.Row](),
      StructType(Seq(
        StructField("__start", LongType), StructField("__cur", LongType),
        StructField("__edges", ArrayType(b.edgeStructType)),
        StructField("__ids", ArrayType(LongType)),
        StructField("__vids", ArrayType(LongType)))))
}
