package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

/** Benchmark main: runs every SparkEntry query against
  * SPARK_GRAFT_SF_DIR and prints one JSON line.
  * A small untimed warmup absorbs JVM/codegen/session start-up so
  * per-query numbers measure the plans, not the first-query tax.
  */
object Bench {
  private def deleteRec(p: java.nio.file.Path): Unit = {
    if (java.nio.file.Files.isDirectory(p)) {
      val s = java.nio.file.Files.list(p)
      try s.forEach(deleteRec(_)) finally s.close()
    }
    java.nio.file.Files.deleteIfExists(p)
  }

  /** Builds a Kx key-shifted replica of sfDir (K=10 is the sf1 scale
    * probe, K=100 the sf10 spot probe; dims stay 1x, facts get
    * consistently shifted entity keys) into a caller-created `dir`.
    * Shared with graft.Dev so probe anomalies can be reproduced in
    * isolation. The caller creates the directory FIRST and owns its
    * deletion — so a mid-build failure (the replica is ~Kx sf0.1 on
    * disk) can never leak a partial copy outside the caller's cleanup.
    */
  def makeSf1Replica(spark: SparkSession, sfDir: String, dir: String): Unit =
    makeReplica(spark, sfDir, dir, 10)

  def makeReplica(spark: SparkSession, sfDir: String, dir: String,
      K: Int): Unit = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.DataFrame
    def ld(t: String) = relational.Tables.load(spark, sfDir, t)
    def keySpan(df: DataFrame, c: String): Long =
      df.agg(max(col(c))).head.getLong(0) + 1L
    // SPARK_GRAFT_REPLICA_TABLES (comma list): restrict the Kx
    // treatment to the named tables; everything else copies at 1x with
    // the same layout. A corpus-family third-decade probe (K = 1000,
    // documents/embeddings only) must not pay the ~35-minute / ~17 GB
    // 1000x TPC-H build it never reads.
    val onlyTables = sys.env.get("SPARK_GRAFT_REPLICA_TABLES")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    def scaledT(t: String): Boolean = onlyTables.forall(_.contains(t))
    val C = keySpan(ld("customer"), "c_custkey")
    val O = keySpan(ld("orders"), "o_orderkey")
    val S = keySpan(ld("supplier"), "s_suppkey")
    val P = keySpan(ld("part"), "p_partkey")
    // batched union+append: a single K-way left-deep unionAll fold is
    // fine at K=10/100 but at the K=1000 (sf100) probe the depth-1000
    // plan tree taxes analysis; <=100-child unions append in waves
    def rep(t: String)(shift: (DataFrame, Int) => DataFrame): Unit =
      if (!scaledT(t))
        ld(t).write.mode("overwrite").parquet(s"$dir/$t.parquet")
      else (0 until K).grouped(100).zipWithIndex.foreach { case (g, gi) =>
        g.map(i => shift(ld(t), i)).reduce(_ unionAll _)
          .write.mode(if (gi == 0) "overwrite" else "append")
          .parquet(s"$dir/$t.parquet")
      }
    // dims stay 1x; documents/embeddings ride along unscaled so
    // Tables.registerAll (the hybrid-SQL probe) finds every table.
    // LAYOUT PARITY: the main suite runs on the re-laid benchDir where
    // the map-heavy corpus tables are range-split 16 ways — the replica
    // must match, or text/vector probes on UNSCALED data read one fat
    // file and report a phantom 3-5x "scale" ratio that is really lost
    // scan parallelism (r8: p29 5.4x, p61 5.1x on identical bytes).
    Seq("region", "nation").foreach(t =>
      ld(t).write.mode("overwrite").parquet(s"$dir/$t.parquet"))
    // corpus tables ride along UNSCALED by default (layout parity with
    // benchDir — see the note above). SPARK_GRAFT_SCALE_CORPUS=1 opts
    // the text/vector corpus INTO the Kx replica (key-shifted copies,
    // so every doc gains K-1 exact duplicates — the dup-heavy corpus
    // shape) for second-decade probes of the dedup/LM/packing family.
    val scaleCorpus = sys.env.get("SPARK_GRAFT_SCALE_CORPUS").contains("1") &&
      scaledT("documents")
    if (!scaleCorpus) {
      ld("documents").repartitionByRange(16, col("doc_id"))
        .sortWithinPartitions("doc_id")
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
      ld("embeddings").repartitionByRange(16, col("vec_id"))
        .sortWithinPartitions("vec_id")
        .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    } else {
      val D = keySpan(ld("documents"), "doc_id")
      (0 until K).grouped(100).zipWithIndex.foreach { case (g, gi) =>
        g.map(i => ld("documents")
            .withColumn("doc_id", col("doc_id") + lit(i * D)))
          .reduce(_ unionAll _)
          .repartitionByRange(16, col("doc_id"))
          .sortWithinPartitions("doc_id")
          .write.mode(if (gi == 0) "overwrite" else "append")
          .parquet(s"$dir/documents.parquet")
      }
      // embeddings scale ONLY when SPARK_GRAFT_REPLICA_TABLES names
      // them (r13 advice: a documents-only replica list must not pay a
      // Kx embeddings build it never reads); otherwise they ride along
      // at 1x with the same 16-way range layout as the benchDir copy
      if (scaledT("embeddings")) {
        val V = keySpan(ld("embeddings"), "vec_id")
        (0 until K).grouped(100).zipWithIndex.foreach { case (g, gi) =>
          g.map(i => ld("embeddings")
              .withColumn("vec_id", col("vec_id") + lit(i * V)))
            .reduce(_ unionAll _)
            .repartitionByRange(16, col("vec_id"))
            .sortWithinPartitions("vec_id")
            .write.mode(if (gi == 0) "overwrite" else "append")
            .parquet(s"$dir/embeddings.parquet")
        }
      } else ld("embeddings").repartitionByRange(16, col("vec_id"))
        .sortWithinPartitions("vec_id")
        .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    }
    rep("customer")((d, i) =>
      d.withColumn("c_custkey", col("c_custkey") + lit(i * C)))
    rep("orders")((d, i) => d
      .withColumn("o_orderkey", col("o_orderkey") + lit(i * O))
      .withColumn("o_custkey", col("o_custkey") + lit(i * C)))
    rep("lineitem")((d, i) => d
      .withColumn("l_orderkey", col("l_orderkey") + lit(i * O))
      .withColumn("l_suppkey", col("l_suppkey") + lit(i * S))
      .withColumn("l_partkey", col("l_partkey") + lit(i * P)))
    rep("supplier")((d, i) =>
      d.withColumn("s_suppkey", col("s_suppkey") + lit(i * S)))
    rep("part")((d, i) =>
      d.withColumn("p_partkey", col("p_partkey") + lit(i * P)))
    val ev = ld("events")
    val evSpan = ev.agg((max(col("ts")).cast("long") -
      min(col("ts")).cast("long")) + 3600L).head.getLong(0)
    val E = keySpan(ev, "event_id")
    // same user_id range layout as the benchDir copy (jsonb-parse-heavy
    // map side; user-bounded queries prune whole files via min/max)
    val evWaves = if (scaledT("events")) (0 until K) else (0 until 1)
    evWaves.grouped(100).zipWithIndex.foreach { case (g, gi) =>
      g.map(i => ev
          .withColumn("event_id", col("event_id") + lit(i * E))
          .withColumn("ts", col("ts") +
            expr(s"INTERVAL '${i * evSpan}' SECOND")))
        .reduce(_ unionAll _)
        .repartitionByRange(16, col("user_id"))
        .sortWithinPartitions("user_id", "ts")
        .write.mode(if (gi == 0) "overwrite" else "append")
        .parquet(s"$dir/events.parquet")
    }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // round-close hygiene gate (r12 verdict item 8): every board run —
    // including the driver's round-close one — provably executes
    // tools/hygiene.py (reports == live suites, fresh vs last src
    // commit, all green) and carries the outcome into the summary
    // artifact, so the r10/r11 stale-evidence class can't recur
    // silently. Non-fatal: the bench still measures, but a violation
    // count is loud in the JSON and on stderr.
    val hygiene: String = try {
      val pb = new ProcessBuilder("python3", "tools/hygiene.py")
      pb.redirectErrorStream(true)
      val proc = pb.start()
      val hOut = new String(proc.getInputStream.readAllBytes(),
        java.nio.charset.StandardCharsets.UTF_8)
      val rc = proc.waitFor()
      val last = hOut.linesIterator.toSeq.lastOption.getOrElse("").trim
      System.err.println(s"[bench] hygiene gate rc=$rc: $last")
      if (rc == 0) "OK" else last
    } catch { case e: Throwable => s"unavailable: ${e.getClass.getSimpleName}" }
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      math.min(Runtime.getRuntime.availableProcessors, 32).toString)
    // GraftSession carries the static production confs (codegen class
    // cache sized for a >100-plan workload — the r8 variance root
    // cause — and a bounded SQL status store); the bench tightens the
    // status-store windows further on top (headless, measurement JVM).
    val spark = api.GraftSession.configure(SparkSession.builder())
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // Even with the UI off, the app status store retains the last
      // 1000 jobs/stages; 245 queries x 3 passes -> old-gen bloat ->
      // GC tax on the allocation-heavy queries late in the run.
      .config("spark.sql.ui.retainedExecutions", "24")
      .config("spark.ui.retainedJobs", "100")
      .config("spark.ui.retainedStages", "100")
      .config("spark.ui.retainedTasks", "1000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // the per-query checkpoint unpersist below is deliberate — the
    // RDDs are dead — so the per-RDD "lineage truncated" WARN is noise
    try org.apache.logging.log4j.core.config.Configurator.setLevel(
      "org.apache.spark.rdd.MapPartitionsRDD",
      org.apache.logging.log4j.Level.ERROR)
    catch { case _: Throwable => () }
    // warmup: shuffle, window, higher-order-fn and jsonb codegen paths,
    // plus a first scan of every input table (file listing + footer +
    // page-cache fill are one-time costs, not per-plan costs)
    try {
      spark.range(1000).selectExpr("id % 7 AS k").groupBy("k").count().count()
      spark.range(100).selectExpr("id % 5 AS k", "id AS v")
        .selectExpr("rank() OVER (PARTITION BY k ORDER BY v) AS r").count()
      spark.range(10).selectExpr(
        "aggregate(array(1.0d, 2.0d), 0.0d, (a, x) -> a + x) AS s").count()
      import org.apache.spark.sql.functions.col
      spark.range(10).selectExpr("'{\"k\": 1}' AS p")
        .select(graft.expr.J.getKey(col("p"), "k")).count()
    } catch { case _: Throwable => () }
    // One-time data layout (the COPY/bulk-load analog): the driver's
    // testdata is one row-group per table, so every scan is a single
    // partition and all pre-shuffle work single-threaded. For the
    // text/vector pipeline tables the map side (tokenize, shingle,
    // hash, dot products) dominates, so those two are rewritten into
    // multiple files at ingest (values unchanged) — measured ~2.5x on
    // the corpus-heavy ops. The relational/graph tables stay raw: their
    // plans are shuffle-bound, and extra input splits only add task
    // overhead at this scale (iterative graph loops multiply it per
    // round). Paid once here, like any ETL.
    val benchDir = try {
      val relaid = java.nio.file.Files
        .createTempDirectory("graft_bench_layout").toString
      val nSplit = math.min(cpus.toInt, 16)
      relational.Tables.all.foreach { t =>
        val df = relational.Tables.load(spark, sfDir, t)
        // range-partition + sort on the id so the multi-file layout
        // KEEPS clustering: bounded ops (doc_id < k) prune whole files
        // via row-group min/max, full-corpus ops get nSplit-way scans
        val out = t match {
          case "documents" =>
            df.repartitionByRange(nSplit, col("doc_id"))
              .sortWithinPartitions("doc_id")
          case "embeddings" =>
            df.repartitionByRange(nSplit, col("vec_id"))
              .sortWithinPartitions("vec_id")
          case "events" =>
            // jsonb parsing of props is map-heavy too; range by user_id
            // so the user-bounded queries prune whole files (streaming
            // reads stay a single AvailableNow micro-batch: < 1000
            // files, so no cross-batch watermark hazard)
            df.repartitionByRange(nSplit, col("user_id"))
              .sortWithinPartitions("user_id", "ts")
          case _ => df.coalesce(1)
        }
        out.write.mode("overwrite").parquet(s"$relaid/$t.parquet")
      }
      relaid
    } catch { case _: Throwable => sfDir }
    try {
      // graph bulk load is one-time ETL, not query cost: build it here
      // so gNN timings measure the Cypher plans
      pipeline.GraphQueries.session(spark, benchDir)
    } catch { case _: Throwable => () }
    // Two passes per query: the first (untimed beyond cold_total)
    // compiles the plan's generated code — a one-time cost per plan
    // shape, not engine throughput; the second run measures the plan
    // steady-state. Both totals are reported.
    // Post-query hygiene: drop cached blocks AND the query's own
    // localCheckpoint RDDs. clearCache() only covers DataFrame-level
    // caches; localCheckpoint persists raw RDD blocks that survive
    // until the RDD object is GC'd, so 241 queries x 3 passes in one
    // JVM accumulated storage until later queries paid eviction + GC
    // tax (r5's steady2 pathology: p114 2.6s -> 22.1s in-run). The
    // diff-unpersist is safe because no query reuses another query's
    // checkpoint — cross-query state lives in parquet; RDDs persisted
    // before the query (the one-time graph fixture) are left alone.
    // per-query GC attribution: when a pass-3 number balloons, the
    // gc_ms column says whether the engine's plan got slower or the
    // JVM charged collection tax to an innocent query
    def gcMillis(): Long = {
      import scala.jdk.CollectionConverters._
      java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
        .asScala.map(_.getCollectionTime).sum
    }
    // Per-pass JVM health snapshot for the variance hunt: the gc_ms
    // columns clear the heap, so a pass that balloons with gc≈0 needs
    // the OTHER exhaustion axes on record — JIT code cache (hot loops
    // go interpreted when it saturates), metaspace/class count
    // (generated-class churn), storage blocks (checkpoint leak would
    // show here). Written to bench_full.json's "jvm" section.
    def jvmSnap(): String = {
      import scala.jdk.CollectionConverters._
      val pools = java.lang.management.ManagementFactory
        .getMemoryPoolMXBeans.asScala
      def mb(f: java.lang.management.MemoryPoolMXBean => Boolean): Long =
        pools.filter(f).map(_.getUsage.getUsed).sum / (1024 * 1024)
      val cc = mb(_.getName.startsWith("CodeHeap"))
      val ms = mb(_.getName.contains("Metaspace"))
      val heap = java.lang.management.ManagementFactory.getMemoryMXBean
        .getHeapMemoryUsage.getUsed / (1024 * 1024)
      val classes = java.lang.management.ManagementFactory
        .getClassLoadingMXBean.getLoadedClassCount
      val storage = try {
        val bm = org.apache.spark.SparkEnv.get.blockManager
        val st = bm.master.getStorageStatus
        st.map(s => s.maxMem - s.memRemaining).sum / (1024 * 1024)
      } catch { case _: Throwable => -1L }
      s"""{"code_cache_mb":$cc,"metaspace_mb":$ms,"heap_mb":$heap,""" +
        s""""classes":$classes,"storage_mb":$storage,"gc_total_ms":${gcMillis()}}"""
    }
    val jvmMarks = new scala.collection.mutable.LinkedHashMap[String, String]()
    // per-query attribution for the steady2 variance hunt (r8: driver
    // box showed q28 5.1s / p112 8.9s pass-2 spikes at gc=0 that the
    // per-PASS snapshots could not attribute): any pass-2 query > 3x
    // its pass-1 time gets an immediate post-query snapshot, so the
    // next cross-environment disagreement names its axis in-run.
    val steady2Outliers =
      new scala.collection.mutable.LinkedHashMap[String, String]()
    val lastGcMs = new java.util.concurrent.ConcurrentHashMap[String, Long]()
    // last failure per query: a guard-tripped probe (the pair-state
    // pre-flight failing FAST by design) must be distinguishable from
    // a crash on the probe boards
    val lastErr = new java.util.concurrent.ConcurrentHashMap[String, String]()
    def runQuery(name: String, fn: (SparkSession, String) => org.apache.spark.sql.DataFrame,
        dir: String): Double = {
      val before = spark.sparkContext.getPersistentRDDs.keySet
      val gc0 = gcMillis()
      val t0 = System.nanoTime()
      val ok = try { fn(spark, dir).count(); true }
        catch { case e: Throwable =>
          lastErr.put(name, (e.getClass.getSimpleName + ": " +
            String.valueOf(e.getMessage)).take(160))
          false
        }
      val dt = (System.nanoTime() - t0) / 1e9
      lastGcMs.put(name, gcMillis() - gc0)
      try spark.sharedState.cacheManager.clearCache()
      catch { case _: Throwable => () }
      try spark.sparkContext.getPersistentRDDs
        .filterNot { case (id, _) => before.contains(id) }
        .foreach { case (_, rdd) => rdd.unpersist(blocking = false) }
      catch { case _: Throwable => () }
      if (ok) dt else -1.0
    }
    def runAll(baseline: Map[String, Double] = Map.empty)
        : (Seq[(String, Double)], Map[String, Long]) = {
      val out = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
        val t = runQuery(name, fn, benchDir)
        baseline.get(name).foreach { b =>
          if (b > 0 && t > 3 * b && t > 1.0)
            steady2Outliers(name) =
              s"""{"steady1":${"%.2f".formatLocal(java.util.Locale.ROOT, b)},""" +
                s""""steady2":${"%.2f".formatLocal(java.util.Locale.ROOT, t)},""" +
                s""""gc_ms":${lastGcMs.getOrDefault(name, -1L)},""" +
                s""""snap":${jvmSnap()}}"""
        }
        name -> t
      }
      import scala.jdk.CollectionConverters._
      val gc = lastGcMs.asScala.toMap
      lastGcMs.clear()
      // between passes: a forced GC lets ContextCleaner reclaim shuffle
      // files and broadcast blocks of dead plans, so pass N+1 starts
      // from the same JVM state as pass N (the variance killer)
      System.gc(); Thread.sleep(200)
      (out, gc)
    }
    // SF10-ONLY mode: the 100x probe needs a much larger driver heap
    // than the default bench JVM (the first attempt OOM'd — Spark exit
    // 52 — at sf10 p114 under the ~8 GB sbt heap), so it runs as a
    // separate invocation under SBT_OPTS="-Xmx80g
    // -XX:+UnlockDiagnosticVMOptions -XX:GCLockerRetryAllocationCount=64"
    // (the GCLocker flag because JDK17 G1 GCLocker starvation under
    // 32 JNI-critical compressed-stream threads masquerades as heap
    // OOM) without re-paying the 20-min main suite. The ratio
    // denominators are re-measured min-of-2 on the same benchDir in
    // the same JVM (identical estimator), and the output goes to
    // bench_full_sf10.json for a manual merge — never clobbering the
    // main board.
    val sf10Only = sys.env.get("SPARK_GRAFT_SF10_ONLY").contains("1")
    // SPARK_GRAFT_SF10_PROBES overrides the probe set (comma-separated)
    // so a deadline-cut tail can be re-measured without re-paying the
    // finished probes
    val sf10OnlyProbes = sys.env.get("SPARK_GRAFT_SF10_PROBES")
      .map(_.split(",").toSeq.filter(_.nonEmpty))
      .getOrElse(Seq("p114_aa_degree_capped", "p110_metapath_walk",
        "p57_closeness", "g41_foaf_pattern", "g29_sql_exists_correlated",
        "p107_adamic_adar", "p75_copurchase"))
    jvmMarks("before_cold") = jvmSnap()
    val (cold, _) =
      if (sf10Only) (Seq.empty[(String, Double)], Map.empty[String, Long])
      else runAll()
    jvmMarks("after_cold") = jvmSnap()
    // steady-state = min of two post-codegen runs per query (one run
    // is hostage to GC/host noise; min-of-n is the standard estimator)
    val (s1, gc1) =
      if (sf10Only) (Seq.empty[(String, Double)], Map.empty[String, Long])
      else runAll()
    jvmMarks("after_steady1") = jvmSnap()
    val (s2, gc2) =
      if (sf10Only) (Seq.empty[(String, Double)], Map.empty[String, Long])
      else runAll(baseline = s1.toMap)
    jvmMarks("after_steady2") = jvmSnap()
    val results =
      if (sf10Only) sf10OnlyProbes.filter(SparkEntry.queries.contains).map {
        n =>
          // one UNTIMED warm run first — the same cold/steady split as
          // the main suite: without it the first timed denominator pays
          // codegen/compile, inflating the denominator and understating
          // the 100x ratio for fast queries
          runQuery(n, SparkEntry.queries(n), benchDir)
          val a = runQuery(n, SparkEntry.queries(n), benchDir)
          val b = runQuery(n, SparkEntry.queries(n), benchDir)
          n -> (if (a > 0 && b > 0) math.min(a, b) else math.max(a, b))
      }
      else s1.zip(s2).map { case ((n, a), (_, b)) => n -> math.min(a, b) }
    def f(v: Double): String = "%.2f".formatLocal(java.util.Locale.ROOT, v)
    def escErr(s: String): String = s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => " "
      case c => c.toString
    }
    // ------------------- global wall budget (r13 verdict item 1b)
    // The driver gives the whole bench invocation a finite window
    // (~60 min at r13, and it killed the run: rc 124, parsed null).
    // Probe phases must budget against what is LEFT of that window,
    // not against their own start. Elapsed = this JVM's uptime, which
    // includes sbt compile + fixture build — exactly the time the
    // driver charges against the window.
    val wallBudgetSec = sys.env.get("SPARK_GRAFT_WALL_BUDGET")
      .flatMap(_.trim.toLongOption).getOrElse(3300L)
    def elapsedSec: Long =
      java.lang.management.ManagementFactory.getRuntimeMXBean.getUptime / 1000L
    // 180 s reserve: artifact writes, replica cleanup, spark.stop and
    // the final stdout line must all land inside the driver's window
    def remainingBudgetSec: Long =
      math.max(0L, wallBudgetSec - elapsedSec - 180L)
    // ---------------- board writer (r13 verdict item 1a): called TWICE
    // — once right after steady2 with an empty probe section (a
    // complete, parseable board on disk before the long probe phases
    // start), then again with the probe results. A driver kill mid-
    // probe can no longer erase the finished passes' evidence.
    def writeBoards(sf1T: Seq[(String, Double)],
        sf1S: Map[String, List[(Double, Long)]], sf1E: String,
        sf10E: String, partial: String): String = {
      val fullJson = {
        val rows = if (sf10Only)
          // no cold/steady passes in this mode — min-of-2 denominators only
          results.map { case (n, v) => s"""    "$n": {"min":${f(v)}}""" }
        else results.indices.map { i =>
          val name = results(i)._1
          s"""    "$name": {"cold":${f(cold(i)._2)},"steady1":${f(s1(i)._2)},""" +
            s""""steady2":${f(s2(i)._2)},"min":${f(results(i)._2)},""" +
            s""""gc1_ms":${gc1.getOrElse(name, -1L)},"gc2_ms":${gc2.getOrElse(name, -1L)}}"""
        }
        val sf1Rows = sf1T.map { case (n, v) =>
          // per-query sf1/sf0.1 ratio alongside the raw time so scale
          // regressions read directly off the file; every raw sample +
          // its gc delta rides along so an outlier row carries its own
          // adjudication evidence (retried samples are the tail entries)
          val base = results.collectFirst { case (bn, bv) if bn == n => bv }
          val ratio = base.filter(b => b > 0.005 && v > 0)
            .map(b => s""","ratio":${f(v / b)}""").getOrElse("")
          val runs = sf1S.getOrElse(n, Nil)
          val detail = if (runs.isEmpty) "" else
            s""","runs":[${runs.map(r => f(r._1)).mkString(",")}]""" +
              s""","gc_ms":[${runs.map(_._2).mkString(",")}]"""
          s"""    "$n": {"sec":${f(v)}$ratio$detail}"""
        }
        val errField =
          (if (sf1E != null) s""",\n  "sf1_error": "${escErr(sf1E)}""""
           else "") +
            (if (sf10E != null)
              s""",\n  "sf10_error": "${escErr(sf10E)}"""" else "") +
            (if (partial != null)
              s""",\n  "partial": "${escErr(partial)}"""" else "")
        val jvmSection = jvmMarks.map { case (k, v) => s"""    "$k": $v""" }
          .mkString(",\n")
        val outlierSection = steady2Outliers
          .map { case (k, v) => s"""    "$k": $v""" }.mkString(",\n")
        // second-decade rows live in bench_sf10.json (merged per probe,
        // never dropped by a plain run); this file carries the pointer
        s"""{\n  "sf": "$sfDir",\n  "queries": {\n${rows.mkString(",\n")}\n  },\n""" +
          s"""  "sf1_probe_10x": {\n${sf1Rows.mkString(",\n")}\n  },\n""" +
          s"""  "sf10_file": "bench_sf10.json",\n""" +
          s"""  "steady2_outliers": {\n$outlierSection\n  },\n""" +
          s"""  "jvm": {\n$jvmSection\n  }$errField\n}\n"""
      }
      val fullFile = if (sf10Only) "bench_full_sf10.json" else "bench_full.json"
      try java.nio.file.Files.writeString(
        java.nio.file.Paths.get(fullFile), fullJson)
      catch { case _: Throwable => () }
      val total = if (results.nonEmpty) results.map(_._2).sum else 0.0
      val coldTotal = if (cold.nonEmpty) cold.map(_._2).sum else 0.0
      val qs = results.sortBy(-_._2).take(60).map { case (k, v) =>
        "\"" + k.takeWhile(_ != '_') + "\":" + f(v) }
        .mkString("{", ",", "}")
      val fams = results.groupBy(_._1.head).toSeq.sortBy(_._1).map {
        case (fam, rs) => "\"" + fam + "\":" + f(rs.map(_._2).sum)
      }.mkString("{", ",", "}")
      // value = steady-state (min over runs); cold_total_sec = 1st run,
      // which pays one-time codegen/planning per plan shape.
      val ratioOf: ((String, Double)) => Double = { case (n, v) =>
        results.collectFirst { case (bn, bv) if bn == n && bv > 0.005 && v > 0 =>
          v / bv }.getOrElse(0.0)
      }
      // each entry carries BOTH the sf1 seconds and the sf1/sf0.1 ratio:
      // r10's board published bare seconds under the "_10x" key and the
      // adjudication record read them as ratios (verdict item 4) — the
      // object form is unambiguous for any consumer
      val sf1Json = sf1T.sortBy(-ratioOf(_)).take(12).map { case (k, v) =>
        "\"" + k.takeWhile(_ != '_') + "\":{\"sec\":" + f(v) +
          ",\"ratio\":" + f(ratioOf((k, v))) + "}" }.mkString("{", ",", "}")
      val sf1Max = sf1T.map(ratioOf).foldLeft(0.0)(math.max)
      // stdout stays bounded: the probe error rides as a short flag here,
      // full text is in bench_full.json
      val sf1Flag = if (sf1E != null) s""","sf1_error":true""" else ""
      val partialFlag =
        if (partial != null) s""","partial":"${escErr(partial)}"""" else ""
      val summary =
        s"""{"metric":"total","value":${f(total)},"unit":"sec","queries":$qs,""" +
          s""""families":$fams,"n_queries":${results.length},""" +
          s""""cold_total_sec":${f(coldTotal)},"sf1_10x":$sf1Json,""" +
          s""""sf1_probes":${sf1T.length},"sf1_max_ratio":${f(sf1Max)}$sf1Flag$partialFlag,""" +
          s""""hygiene":"${escErr(hygiene)}","sf":"$sfDir","full":"$fullFile"}"""
      // the summary also goes to a FILE the harness can read directly —
      // a stdout scrape must never be the only copy (r9: BENCH_r09.json
      // parsed null even though the run finished green). An sf10-only
      // run writes its OWN summary file: it must not clobber the main
      // board's bench_summary.json with a 7-probe mini-board.
      try java.nio.file.Files.writeString(
        java.nio.file.Paths.get(
          if (sf10Only) "bench_summary_sf10.json" else "bench_summary.json"),
        summary + "\n")
      catch { case _: Throwable => () }
      summary
    }
    if (!sf10Only) {
      writeBoards(Nil, Map.empty, null, null,
        "steady passes complete; sf1 probes pending")
      System.err.println(s"[bench] steady board written " +
        s"(elapsed ${elapsedSec}s, budget ${wallBudgetSec}s, " +
        s"remaining ${remainingBudgetSec}s)")
    }
    // -------------------------------------------------- sf1 scale probe
    // Empirical scale validation for the heavy hitters: replicate the
    // sf0.1 tables 10x with consistently shifted entity keys (dimension
    // tables nation/region stay fixed — real scale-up grows facts, not
    // dims; events keep their users and grow 10x per-user volume) and
    // run each probe query once. A design that scales ~linearly lands
    // at <= ~10x its sf0.1 time; superlinear growth here flags a plan
    // that would not survive 100 TB. Disable with SPARK_GRAFT_SF1=0.
    var sf1Error: String = null
    var sf1Dir: String = null
    // every raw probe sample (sec, gc_ms) in run order — the evidence
    // trail that lets a second machine adjudicate an outlier without
    // re-running (r8's driver/builder disagreement had no per-probe
    // record to argue from)
    var sf1Samples: Map[String, List[(Double, Long)]] = Map.empty
    val sf1Times: Seq[(String, Double)] =
      if (sf10Only || sys.env.get("SPARK_GRAFT_SF1").contains("0")) Nil
      else if (remainingBudgetSec < 120) {
        // not enough window left even for the replica build: record
        // WHY the probe section is empty instead of overrunning the
        // driver's kill (r13: rc 124 erased the whole board)
        sf1Error = s"wall budget exhausted before sf1 probes " +
          s"(elapsed ${elapsedSec}s of ${wallBudgetSec}s)"
        Nil
      } else try {
        val dir = java.nio.file.Files
          .createTempDirectory("graft_sf1_probe").toString
        sf1Dir = dir // assigned BEFORE the build so a failure cleans up
        makeSf1Replica(spark, sfDir, dir)
        // Probe set: the known heavy hitters FIRST (a deadline expiry
        // must cut the cheap tail, not the signal), then the ENTIRE
        // suite (writes and streams included — superlinear stragglers
        // hide outside any pre-picked set; r5's worst sf1 ratio was
        // g29's 6.2x, r7's was p110's 16.3x, neither a known heavy
        // when first flagged).
        val heavies = Seq(
          "s05_stream_interval_join", "s09_stream_outer_join",
          "p107_adamic_adar", "p110_metapath_walk",
          "p114_aa_degree_capped", "p75_copurchase")
        // the tail is SHUFFLED (fixed seed — runs stay comparable):
        // alphabetical order clusters each family into one contiguous
        // wall-clock window, so a single contended window on a noisy
        // host flags a whole family at once (r8: the driver board's 21
        // "breaches" were all q-family, all in one stretch, and its
        // own steady passes contradicted them). Decorrelating family
        // from position makes that failure mode read as scattered
        // noise instead of a fake design signal.
        val rest = new scala.util.Random(42L).shuffle(
          SparkEntry.queries.keys.filterNot(heavies.contains).toSeq.sorted)
        val probes = heavies ++ rest
        // graph bulk load at sf1 is one-time ETL, untimed (same rule as
        // the main suite's warmup) — g41's probe number must measure
        // the query, not the 10x ingest
        try pipeline.GraphQueries.session(spark, dir)
        catch { case _: Throwable => () }
        val resolved = probes.filter(SparkEntry.queries.contains)
        val unknown = probes.filterNot(SparkEntry.queries.contains)
        // phase deadline = min(own 1800 s cap, remaining GLOBAL wall
        // budget): r13's run spent its window before this phase and the
        // 1800 s self-budget ran the program straight past the driver's
        // kill. The probe loop already drops and records deadline-cut
        // probes — a tiny remainder yields a parsed board with a
        // "deadline dropped N probes" note instead of rc 124.
        val phaseSec = math.min(1800L, remainingBudgetSec)
        System.err.println(s"[bench] sf1 probe phase budget: ${phaseSec}s " +
          s"(elapsed ${elapsedSec}s of ${wallBudgetSec}s wall budget)")
        val deadline = System.nanoTime() + phaseSec * 1000000000L
        // each probe's samples: (sec, gc_ms) per run, in run order
        val samples = new scala.collection.mutable.LinkedHashMap[
          String, List[(Double, Long)]]()
        def probeOnce(name: String): Unit = {
          val t = runQuery(name, SparkEntry.queries(name), dir)
          val gc = lastGcMs.getOrDefault(name, -1L)
          samples(name) = samples.getOrElse(name, Nil) :+ ((t, gc))
        }
        def bestOf(name: String): Double = {
          val ok = samples.getOrElse(name, Nil).map(_._1).filter(_ > 0)
          if (ok.isEmpty) -1.0 else ok.min
        }
        def probeRatio(name: String): Double = {
          val v = bestOf(name)
          results.collectFirst {
            case (bn, bv) if bn == name && bv > 0.005 && v > 0 => v / bv
          }.getOrElse(0.0)
        }
        // Two time-DECORRELATED passes (was: both samples back-to-back,
        // so one contended window polluted both). A GC settle between
        // passes puts pass B on the same JVM footing. min-of-2 stays
        // the estimator: write queries pay one-time fixture creation on
        // their first sample (r6: g30 9.6x first, 2x steady).
        for (n <- resolved if System.nanoTime() < deadline) probeOnce(n)
        System.gc(); Thread.sleep(200)
        for (n <- resolved
             if System.nanoTime() < deadline && samples.contains(n))
          probeOnce(n)
        // Outlier auto-retry: a probe still >8x after min-of-2 gets up
        // to two more ISOLATED samples behind a GC settle before being
        // reported — a real superlinear plan reproduces (p110's r7
        // 16.3x did, every retry); a contended window does not (the
        // driver board's 21 phantom breaches would have cleared here).
        for (n <- resolved if samples.contains(n)) {
          var retries = 0
          while (retries < 2 && System.nanoTime() < deadline &&
              probeRatio(n) > 8.0) {
            System.gc(); Thread.sleep(200)
            probeOnce(n)
            retries += 1
          }
        }
        val ran = resolved.filter(samples.contains)
          .map(n => n -> bestOf(n))
        sf1Samples = samples.toMap
        // dropped/unknown/FAILED probes are recorded, not silently
        // absent — an omitted or -1 entry must be distinguishable
        // from "not probed" on the stdout summary too
        val dropped = resolved.filterNot(samples.contains)
        val failed = ran.collect { case (n, v) if v < 0 => n }
        val notes = Seq(
          if (failed.nonEmpty)
            Some(s"${failed.length} probes FAILED: " +
              failed.take(8).mkString(",")) else None,
          if (dropped.nonEmpty)
            Some(s"deadline dropped ${dropped.length} probes: " +
              dropped.take(8).mkString(",")) else None,
          if (unknown.nonEmpty)
            Some(s"unknown probes: ${unknown.mkString(",")}") else None
        ).flatten
        if (notes.nonEmpty) sf1Error = notes.mkString("; ")
        ran
      } catch {
        // a broken probe must be distinguishable from a disabled one:
        // record the failure for the summary line instead of swallowing
        case e: Throwable =>
          sf1Error = (e.getClass.getSimpleName + ": " +
            String.valueOf(e.getMessage)).take(200)
          Nil
      } finally {
        // the 10x replica is ~10x sf0.1 on disk — never leak it
        if (sf1Dir != null) try deleteRec(java.nio.file.Paths.get(sf1Dir))
        catch { case _: Throwable => () }
      }
    jvmMarks("after_sf1") = jvmSnap()
    // ------------------------------------------- sf10 spot probe (100x)
    // Second decade of scale for the quadratic-family heavy hitters:
    // sf1 is one decade above bench; the wedge/co-occurrence operators'
    // 100-TB claims deserve a second. 100x key-shifted replica (~2 GB
    // at the default sf0.1 input), same layout-parity rules, min-of-2
    // over two decorrelated passes. OPT-IN (SPARK_GRAFT_SF10=1): the
    // probe block adds ~10-25 min; the committed bench_full.json
    // carries the section so every round's numbers stay on record
    // without taxing the per-round driver run.
    var sf10Error: String = null
    var sf10Dir: String = null
    var sf10Samples: Map[String, List[(Double, Long)]] = Map.empty
    // per-probe UNTIMED warm-pass seconds (r13 verdict item 2) — kept
    // out of the min-of-N estimator but published on the row so the
    // post-replica-build I/O cost stays on record
    var sf10Warm: Map[String, Double] = Map.empty
    // replica factor override (default 100 = the sf10 probe). K=1000 is
    // the sf100 / third-decade spot probe: results go to bench_sf100
    // .json under key sf100_probe_1000x — NEVER merged into the sf10
    // board (conflating decades is the r9 evidence-loss class of bug).
    val sfK = sys.env.getOrElse("SPARK_GRAFT_SFK", "100").toInt
    val sf10Times: Seq[(String, Double)] =
      if (!sf10Only && !sys.env.get("SPARK_GRAFT_SF10").contains("1")) Nil
      else if (remainingBudgetSec < 120) {
        // mirror the sf1 pre-build guard (r14 ADVICE): with a nearly
        // exhausted wall budget the Kx replica build alone can overrun
        // the driver's kill — record WHY the section is empty instead
        sf10Error = s"wall budget exhausted before sf10 probes " +
          s"(elapsed ${elapsedSec}s of ${wallBudgetSec}s)"
        Nil
      } else try {
        val dir = java.nio.file.Files
          .createTempDirectory("graft_sf10_probe").toString
        sf10Dir = dir
        makeReplica(spark, sfDir, dir, sfK)
        // the probe log must PROVE the replica's scale (an unscaled
        // table would silently publish a flat "100x" ratio): one count
        // per headline table, comparable against the base sf dir
        for (t <- Seq("lineitem", "events", "documents")) {
          val n = spark.read.parquet(s"$dir/$t.parquet").count()
          val base = spark.read.parquet(s"$sfDir/$t.parquet").count()
          System.err.println(s"[sf10] replica $t rows = $n " +
            s"(base $base, x${if (base > 0) n / base else -1})")
        }
        // the heavy family from the sf1 board: exact wedge quadratics
        // (p107/p75 — expected superlinear, the documented crossover),
        // their capped 100-TB form (p114 — must stay near-linear),
        // multi-source BFS (p57), the frontier walk (p110), and the
        // heaviest Cypher pattern joins (g41, g29)
        val probes = sf10OnlyProbes.filter(SparkEntry.queries.contains)
        // the 100x graph bulk load is expensive AND leaves persisted
        // label-table state that competes with the probes' execution
        // memory — build it only when a g-probe actually needs it
        // (p-only probe sets measured cleaner without it)
        if (probes.exists(_.startsWith("g")))
          try pipeline.GraphQueries.session(spark, dir)
          catch { case _: Throwable => () }
        // own cap AND the remaining global wall budget (see the sf1
        // phase note): opt-in solo runs usually have a huge wall
        // budget, driver runs do not
        val budget = math.min(
          sys.env.getOrElse("SPARK_GRAFT_SF10_SEC", "1500").toLong,
          remainingBudgetSec)
        val deadline = System.nanoTime() + budget * 1000000000L
        val samples = new scala.collection.mutable.LinkedHashMap[
          String, List[(Double, Long)]]()
        def probeOnce(name: String): Unit = {
          val t0 = System.nanoTime()
          val t = runQuery(name, SparkEntry.queries(name), dir)
          samples(name) = samples.getOrElse(name, Nil) :+
            ((t, lastGcMs.getOrDefault(name, -1L)))
          System.err.println(f"[sf10] $name: $t%.2f s " +
            f"(wall ${(System.nanoTime() - t0) / 1e9}%.1f)")
        }
        // 100x data on the bench's 32 shuffle partitions puts ~10x the
        // sf1 per-partition state into each task (the first attempt
        // died on 2 GB execution-page requests): raise the partition
        // count for this phase — the SAME knob a real 100 TB deployment
        // turns (more, smaller tasks; AQE coalesces the light stages) —
        // and restore it after.
        // SPARK_GRAFT_SF10_RUNS raises the per-probe pass count (e.g.
        // 3 for a min-of-3 adjudication row) — one invocation, one
        // replica build, one window: samples stay co-measured.
        // Parsed BEFORE any state mutation (and tolerantly): a
        // malformed env value must not throw after setProperty/conf
        // have been flipped and leak them past the finally (r12 advice)
        val passes = math.max(1,
          sys.env.get("SPARK_GRAFT_SF10_RUNS")
            .flatMap(_.trim.toIntOption).getOrElse(2))
        val prevShuffle = spark.conf.get("spark.sql.shuffle.partitions")
        spark.conf.set("spark.sql.shuffle.partitions",
          sys.env.getOrElse("SPARK_GRAFT_SF10_SHUFFLE", "256"))
        // frontier pair-states go DISK_ONLY at this scale (see
        // GraphAnalytics.stateLevel — MEMORY_AND_DISK starves the
        // unified pool at 100x even under an 80 GB heap)
        System.setProperty("graft.state.disk", "1")
        try {
          // one UNTIMED warm pass after the replica build (r13 verdict
          // item 2 — same rule the sf1 path already applies): the first
          // post-build pass pays replica-write page-cache eviction +
          // first-read I/O (r13: p114 763 s warm vs 111 s min, a 7x
          // in-row spread that undermined the envelope reading). Warm
          // seconds are recorded on the row but never enter min-of-N.
          val warm = new scala.collection.mutable.LinkedHashMap[String, Double]()
          for (n <- probes if System.nanoTime() < deadline) {
            val t0 = System.nanoTime()
            runQuery(n, SparkEntry.queries(n), dir)
            warm(n) = (System.nanoTime() - t0) / 1e9
            System.err.println(f"[sf10] $n warm (untimed): ${warm(n)}%.2f s")
          }
          sf10Warm = warm.toMap
          for (_ <- 1 to passes) {
            System.gc(); Thread.sleep(200)
            // only probes whose warm pass ran: a deadline-cut probe
            // must not sneak in a cold first timed sample
            for (n <- probes
                 if System.nanoTime() < deadline && warm.contains(n))
              probeOnce(n)
          }
        } finally {
          spark.conf.set("spark.sql.shuffle.partitions", prevShuffle)
          System.clearProperty("graft.state.disk")
        }
        sf10Samples = samples.toMap
        val dropped = probes.filterNot(samples.contains)
        if (dropped.nonEmpty)
          sf10Error = s"deadline dropped ${dropped.length} probes: " +
            dropped.mkString(",")
        samples.toSeq.map { case (n, runs) =>
          val ok = runs.map(_._1).filter(_ > 0)
          n -> (if (ok.isEmpty) -1.0 else ok.min)
        }
      } catch {
        case e: Throwable =>
          sf10Error = (e.getClass.getSimpleName + ": " +
            String.valueOf(e.getMessage)).take(200)
          Nil
      } finally {
        if (sf10Dir != null) try deleteRec(java.nio.file.Paths.get(sf10Dir))
        catch { case _: Throwable => () }
      }
    jvmMarks("after_sf10") = jvmSnap()
    // ------------------------- second-decade artifact: bench_sf10.json
    // sf10 results live in their OWN merged file: a plain bench run
    // must never drop the second-decade board (r9: the driver's
    // non-sf10 run overwrote bench_full.json and lost the committed
    // sf10_probe_100x section — the evidence survived only in git
    // history). Per-probe merge: probes measured this run replace
    // their row, everything else is preserved, so targeted
    // SPARK_GRAFT_SF10_PROBES runs accumulate a complete board.
    val sf10RowBodies: Seq[(String, String)] = sf10Times.map { case (n, v) =>
      val base = results.collectFirst { case (bn, bv) if bn == n => bv }
      val den = base.filter(_ > 0.005)
        .map(b => s""","den":${f(b)}""").getOrElse("")
      val ratio = base.filter(b => b > 0.005 && v > 0)
        .map(b => s""","ratio":${f(v / b)}""").getOrElse("")
      val runs = sf10Samples.getOrElse(n, Nil)
      val warm = sf10Warm.get(n).map(w => s""","warm":${f(w)}""").getOrElse("")
      val detail = if (runs.isEmpty) "" else
        s""","runs":[${runs.map(r => f(r._1)).mkString(",")}]""" +
          s""","gc_ms":[${runs.map(_._2).mkString(",")}]"""
      val err = if (v < 0)
        Option(lastErr.get(n)).map(e => s""","err":"${escErr(e)}"""")
          .getOrElse("")
      else ""
      // every row states its measurement protocol (r12 verdict item 5:
      // no more ambiguity about which rows are history vs fresh):
      // minN = per-probe pass count this invocation, -warm when the
      // untimed post-replica-build pass ran first (r13 item 2),
      // solo+pinned when scratch state was pinned to a dedicated dir
      val protocol = {
        val pinned =
          if (sys.env.contains("SPARK_GRAFT_TMPDIR")) "-pinned" else ""
        val w = if (sf10Warm.contains(n)) "-warm" else ""
        s""","protocol":"min${runs.length}$w$pinned""""
      }
      n -> s"""{"sec":${f(v)}$ratio$den$warm$detail$err$protocol}"""
    } ++ {
      // a probe whose untimed warm pass ran but whose every timed pass
      // was deadline-cut still publishes its measured evidence (r14
      // ADVICE): a warm-only row with an explicit protocol marker
      val timed = sf10Times.map(_._1).toSet
      sf10Warm.toSeq.filterNot { case (n, _) => timed.contains(n) }
        .map { case (n, w) =>
          n -> s"""{"warm":${f(w)},"protocol":"warm-only"}"""
        }
    }
    // K != 100 gets its OWN file + key (e.g. bench_sf100.json /
    // "sf100_probe_1000x") so decades never mix in one board; a
    // corpus-scaled replica (SPARK_GRAFT_SCALE_CORPUS=1) probes a
    // DIFFERENT workload shape (every doc duplicated K times), so its
    // rows get their own artifact too
    val corpusSfx =
      if (sys.env.get("SPARK_GRAFT_SCALE_CORPUS").contains("1")) "_corpus"
      else ""
    val sfKFile =
      (if (sfK == 100) "bench_sf10" else s"bench_sf${sfK / 10}") +
        corpusSfx + ".json"
    val sfKKey =
      (if (sfK == 100) "sf10_probe_100x" else s"sf${sfK / 10}_probe_${sfK}x") +
        corpusSfx
    if (sf10RowBodies.nonEmpty) try {
      import scala.jdk.CollectionConverters._
      val path = java.nio.file.Paths.get(sfKFile)
      val old = new scala.collection.mutable.LinkedHashMap[String, String]()
      var oldNote: String = null
      if (java.nio.file.Files.exists(path)) {
        var in = false
        java.nio.file.Files.readAllLines(path).asScala.foreach { ln =>
          val t = ln.trim
          if (t.startsWith("\"" + sfKKey + "\"")) in = true
          else if (in && t.startsWith("}")) in = false
          else if (in && t.startsWith("\"")) {
            val name = t.drop(1).takeWhile(_ != '"')
            old(name) = t.substring(t.indexOf(':', name.length + 2) + 1)
              .trim.stripSuffix(",")
          } else if (t.startsWith("\"note\":"))
            oldNote = t.stripPrefix("\"note\":").trim.stripSuffix(",")
        }
      }
      // the scanner above only understands the one-row-per-line format
      // this writer emits; a reformatted file (pretty-printed rows span
      // lines) would parse to zero prior rows and the rewrite would
      // silently drop the committed board — the exact r9 evidence-loss
      // failure this file exists to prevent. Refuse to rewrite ONLY
      // when the file actually carries sf10 rows we failed to parse: a
      // legitimately row-empty file (note-only) is safe to rewrite
      // (r10 ADVICE).
      val fileHasRows = java.nio.file.Files.exists(path) && {
        // line-anchored, not whole-file substring: a note string that
        // QUOTES the marker text must not count as rows-present (r11
        // advice). The writer emits `"<key>": {` at line start with
        // rows on the following lines; a key inside a note value sits
        // mid-line after `"note":`.
        val lines = java.nio.file.Files.readAllLines(path).asScala
          .map(_.trim).filter(_.nonEmpty).toVector
        val h = lines.indexWhere { ln =>
          ln.startsWith("\"" + sfKKey + "\"") && {
            val colon = ln.indexOf(':', sfKKey.length + 2)
            colon >= 0 && ln.substring(colon + 1).trim.startsWith("{")
          }
        }
        val lineAnchored = h >= 0 && {
          val afterBrace = {
            val ln = lines(h)
            ln.substring(ln.indexOf('{') + 1).trim
          }
          if (afterBrace.nonEmpty) !afterBrace.startsWith("}")
          else h + 1 < lines.length && !lines(h + 1).startsWith("}")
        }
        // compacted-file fallback (r12 advice): a one-line/reformatted
        // JSON puts the key mid-line, the line-anchored scan sees
        // nothing, prior rows parse to zero, and an in-place rewrite
        // would silently drop the committed board — the r9 evidence-
        // loss case again. If the marker appears ANYWHERE unescaped
        // with a non-empty object body, count the file as rows-bearing
        // (the merge then routes to the .unmerged side file). A note
        // string QUOTING the marker carries escaped \" quotes and
        // cannot match the unescaped-lookbehind pattern.
        lineAnchored || (h < 0 && {
          val content = lines.mkString("\n")
          ("(?<!\\\\)\"" + java.util.regex.Pattern.quote(sfKKey) +
            "\"\\s*:\\s*\\{\\s*\"").r.findFirstIn(content).isDefined
        })
      }
      val reformatted = fileHasRows && old.isEmpty
      sf10RowBodies.foreach { case (n, body) => old(n) = body }
      val note = sys.env.get("SPARK_GRAFT_SF10_NOTE")
        .map(n => "\"" + escErr(n) + "\"")
        .getOrElse(if (oldNote != null) oldNote else "\"\"")
      val merged =
        s"""{\n  "note": $note,\n  "$sfKKey": {\n""" +
          old.map { case (k, v) => s"""    "$k": $v""" }.mkString(",\n") +
          "\n  }\n}\n"
      if (reformatted) {
        val side = java.nio.file.Paths.get(sfKFile + ".unmerged")
        java.nio.file.Files.writeString(side, merged)
        System.err.println(
          s"[bench] $path exists but no prior sf10 rows parsed (file " +
            "reformatted?) — NOT rewriting it; this run's rows are in " +
            s"$side, merge by hand")
      } else java.nio.file.Files.writeString(path, merged)
    } catch {
      case t: Throwable =>
        // a swallowed failure here silently discards this run's sf10
        // measurements — at least say so on stderr
        System.err.println(s"[bench] bench_sf10.json merge failed: $t")
    }
    // Full per-query detail (long names, cold + both steady runs) goes
    // to a FILE via writeBoards — the harness captures only a bounded
    // tail (~2.4 KB) of stdout, which a 150+-entry long-name line no
    // longer fits (round 3's line was truncated to "parsed": null).
    // This second writeBoards call replaces the post-steady2 partial
    // board with the complete one (probe sections filled in).
    val summary =
      writeBoards(sf1Times, sf1Samples, sf1Error, sf10Error, null)
    // the re-laid-out table copy is bench-local scratch — reclaim it
    if (benchDir != sfDir) try deleteRec(java.nio.file.Paths.get(benchDir))
    catch { case _: Throwable => () }
    // Shutdown ORDER matters for the stdout parse: r9's summary line
    // was pushed out of the harness's bounded tail capture by a
    // RejectedExecutionException storm from executor pools tearing
    // down at JVM exit. Stop Spark FIRST (awaits context shutdown),
    // let straggler pool threads drain, and only then print the
    // summary — the last thing this process writes.
    try spark.stop() catch { case _: Throwable => () }
    try { System.gc(); Thread.sleep(800) } catch { case _: Throwable => () }
    println(summary)
    System.out.flush()
  }
}
