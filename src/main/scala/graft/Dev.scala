package graft

import org.apache.spark.sql.SparkSession

// temporary profiling scratch — not part of the library surface
object Dev {
  def main(args: Array[String]): Unit = {
    val spark = api.GraftSession.configure(SparkSession.builder())
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // mirror the bench's one-time relayout (multi-file corpus tables)
    // into a FIXED dir so Dev timings match bench conditions; reused
    // across invocations. SPARK_GRAFT_DEV_RAW=1 opts back to the raw dir.
    val d = if (sys.env.get("SPARK_GRAFT_DEV_RAW").contains("1"))
      "/root/testdata/sf0.1"
    else {
      import org.apache.spark.sql.functions.col
      val src = "/root/testdata/sf0.1"
      val relaid = "/tmp/graft_dev_layout"
      // reuse gates on the _SUCCESS marker written AFTER the full loop
      // (r14 ADVICE): a crash partway through the relayout must not be
      // silently reused as a complete layout by every later invocation
      if (!java.nio.file.Files.exists(
          java.nio.file.Paths.get(s"$relaid/_SUCCESS"))) {
        java.nio.file.Files.createDirectories(java.nio.file.Paths.get(relaid))
        relational.Tables.all.foreach { t =>
          val df = relational.Tables.load(spark, src, t)
          val out = t match {
            case "documents" =>
              df.repartitionByRange(16, col("doc_id"))
                .sortWithinPartitions("doc_id")
            case "embeddings" =>
              df.repartitionByRange(16, col("vec_id"))
                .sortWithinPartitions("vec_id")
            case "events" =>
              df.repartitionByRange(16, col("user_id"))
                .sortWithinPartitions("user_id", "ts")
            case _ => df.coalesce(1)
          }
          out.write.mode("overwrite").parquet(s"$relaid/$t.parquet")
        }
        java.nio.file.Files.writeString(
          java.nio.file.Paths.get(s"$relaid/_SUCCESS"), "")
      }
      relaid
    }
    val name = args(0)
    if (name == "obsspike") {
      // does Observation fire on localCheckpoint(true) and on a parquet
      // write? (decides whether count() actions can fold into existing
      // materializations on the write path)
      import org.apache.spark.sql.functions._
      val df = spark.range(1000).selectExpr("id", "id % 7 AS k")
      def tryGet(o: org.apache.spark.sql.Observation, lbl: String): Unit = {
        val t = new Thread(() => println(s"$lbl = " + o.get))
        t.setDaemon(true); t.start(); t.join(3000)
        if (t.isAlive) println(s"$lbl = TIMED OUT (metrics did not fire)")
      }
      val obs1 = org.apache.spark.sql.Observation("cp")
      val cp = df.observe(obs1, count(lit(1)).as("n")).localCheckpoint(true)
      println("checkpoint done")
      tryGet(obs1, "obs1")
      val obs2 = org.apache.spark.sql.Observation("wr")
      val out = java.nio.file.Files.createTempDirectory("obsspike").toString
      cp.observe(obs2, count(lit(1)).as("n"), max(col("k")).as("mk"))
        .sortWithinPartitions("k")
        .write.mode("overwrite").parquet(s"$out/t.parquet")
      tryGet(obs2, "obs2")
      spark.stop(); return
    }
    if (name == "g18parts") {
      val s = pipeline.GraphQueries.session(spark, d)
      s.createVLabel("scr", ifNotExists = true)
      def t[A](lbl: String)(f: => A): A = {
        val t0 = System.nanoTime(); val r = f
        println(f"  $lbl: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
      }
      for (round <- 1 to 2) {
        println(s"round $round")
        t("merge")(s.cypher(
          """MATCH (c:customer)-[:in]->(n:nation)
            |WHERE c.acctbal > 9000
            |MERGE (v:scr {name: c.name, nation: n.name, bal: c.acctbal})""".stripMargin))
        t("delete")(s.cypher("MATCH (v:scr) WHERE v.bal < 9500 DELETE v"))
        t("read")(s.cypher(
          "MATCH (v:scr) RETURN v.nation AS nation, count(*) AS n").count())
      }
      spark.stop(); return
    }
    if (name == "g29parts") {
      def t[A](lbl: String)(f: => A): A = {
        val t0 = System.nanoTime(); val r = f
        println(f"  $lbl: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
      }
      val s = t("fixture build")(pipeline.GraphQueries.session(spark, d))
      t("registerAll")(relational.Tables.registerAll(spark, d))
      val sqlText =
        """SELECT count(*) AS n_orders FROM
          |  (SELECT CAST(floor(o_totalprice / 50) AS BIGINT) AS thr
          |   FROM orders WHERE o_totalprice > 400000) t
          |WHERE EXISTS (MATCH (c:customer)
          |  WHERE c.acctbal > t.thr AND c.mktsegment = 'BUILDING' RETURN c)""".stripMargin
      for (round <- 1 to 3) {
        println(s"round $round")
        val df = t("sql() compile")(s.sql(sqlText))
        t("execute")(df.collect())
      }
      spark.stop(); return
    }
    if (name == "p45parts") {
      import org.apache.spark.sql.functions._
      val vecs = relational.Tables.load(spark, d, "embeddings")
      val cb = pipeline.Similarity.pqCodebook(64, 8, 16)
      def t[A](lbl: String)(f: => A): A = {
        val t0 = System.nanoTime(); val r = f
        println(f"  $lbl: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
      }
      println("corpus rows: " + vecs.count())
      for (_ <- 1 to 2) {
        t("encode only")(pipeline.Similarity.pqEncode(vecs, cb).count())
        t("full")(pipeline.Similarity.pqTopK(
          vecs.where(col("vec_id") < 50), vecs, cb, 3).count())
      }
      spark.stop(); return
    }
    if (name == "pollute") {
      // isolate the steady2 inflation: run victim queries, then the
      // suspected polluter family once or twice, then the victims again
      def t[A](lbl: String)(f: => A): A = {
        val t0 = System.nanoTime(); val r = f
        println(f"  $lbl: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
      }
      def rss(): Long = {
        val s = java.nio.file.Files.readAllLines(
          java.nio.file.Paths.get("/proc/self/status"))
        s.stream.filter(_.startsWith("VmRSS")).findFirst.get
          .split("\\s+")(1).toLong / 1024
      }
      val victims = args(1).split(",").toSeq
      val polluters = args(2).split(",").toSeq
      println(s"RSS ${rss()} MB")
      for (r <- 1 to 3; v <- victims)
        t(s"$v pre-$r")(SparkEntry.queries(v)(spark, d).count())
      println(s"RSS ${rss()} MB")
      for (rep <- 1 to 2; p <- polluters)
        t(s"$p pollute-$rep")(SparkEntry.queries(p)(spark, d).count())
      println(s"RSS ${rss()} MB")
      System.gc(); Thread.sleep(200)
      for (r <- 1 to 3; v <- victims)
        t(s"$v post-$r")(SparkEntry.queries(v)(spark, d).count())
      println(s"RSS ${rss()} MB")
      spark.stop(); return
    }
    if (name == "sf1") {
      // reproduce the bench's sf1 probe for a set of queries, in
      // isolation: args(1) = comma-separated query names
      def t[A](lbl: String)(f: => A): A = {
        val t0 = System.nanoTime(); val r = f
        println(f"  $lbl: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
      }
      val dir = java.nio.file.Files
        .createTempDirectory("graft_sf1_probe").toString
      try {
        t("replica build")(Bench.makeSf1Replica(spark, d, dir))
        t("graph fixture")(pipeline.GraphQueries.session(spark, dir))
        val names = args(1).split(",").toSeq
        for (round <- 1 to 3; n <- names) {
          t(s"$n (round $round)")(SparkEntry.queries(n)(spark, dir).count())
        }
        if (args.length > 2 && args(2) == "explain") names.foreach { n =>
          println(s"=== $n ===")
          SparkEntry.queries(n)(spark, dir).explain("formatted")
        }
      } finally {
        def del(p: java.nio.file.Path): Unit = {
          if (java.nio.file.Files.isDirectory(p)) {
            val s = java.nio.file.Files.list(p)
            try s.forEach(del(_)) finally s.close()
          }
          java.nio.file.Files.deleteIfExists(p)
        }
        del(java.nio.file.Paths.get(dir))
      }
      spark.stop(); return
    }
    if (name == "sf10") {
      // isolated sf10 probe: args(1) = comma-separated query names;
      // builds (or reuses) a FIXED-path 100x replica so iterating on
      // one probe doesn't re-pay the build. No graph fixture unless a
      // g-query is probed.
      def t[A](lbl: String)(f: => A): A = {
        val t0 = System.nanoTime(); val r = f
        println(f"  $lbl: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
      }
      val dir = "/tmp/graft_sf10_fixed"
      if (!java.nio.file.Files.exists(
          java.nio.file.Paths.get(s"$dir/lineitem.parquet"))) {
        java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
        t("replica build")(Bench.makeReplica(spark, d, dir, 100))
      } else println("  (reusing existing replica)")
      val names = args(1).split(",").toSeq
      if (names.exists(_.startsWith("g")))
        t("graph fixture")(pipeline.GraphQueries.session(spark, dir))
      spark.conf.set("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SF10_SHUFFLE", "256"))
      // measurement-only conf overrides for this probe window, e.g.
      // SPARK_GRAFT_DEV_CONF="spark.graft.changelog=false"
      sys.env.get("SPARK_GRAFT_DEV_CONF").foreach(_.split(",")
        .filter(_.contains("=")).foreach { kv =>
          val Array(k, v) = kv.split("=", 2); spark.conf.set(k, v)
        })
      System.setProperty("graft.state.disk", "1")
      for (round <- 1 to 2; n <- names) {
        // Bench.runQuery's hygiene: drop the run's own checkpoint
        // blocks between runs or run 2 starts with run 1's pair-state
        // still pinning the unified pool
        val before = spark.sparkContext.getPersistentRDDs.keySet
        t(s"$n (round $round)")(SparkEntry.queries(n)(spark, dir).count())
        try spark.sharedState.cacheManager.clearCache()
        catch { case _: Throwable => () }
        try spark.sparkContext.getPersistentRDDs
          .filterNot { case (id, _) => before.contains(id) }
          .foreach { case (_, rdd) => rdd.unpersist(blocking = false) }
        catch { case _: Throwable => () }
        System.gc()
      }
      if (args.length > 2 && args(2) == "explain") names.foreach { n =>
        println(s"=== $n ===")
        SparkEntry.queries(n)(spark, dir).explain("formatted")
      }
      spark.stop(); return
    }
    if (name == "variantspike") {
      // SURVEY §1.3 deferred decision: would a Spark 4 VariantType-
      // backed properties column beat the canonical-JSON string the
      // engine stores today? Measure the ACCESS tax head-to-head on a
      // 10x replica of the richest table (lineitem -> a 16-key props
      // document), same parquet layout, three access shapes per path:
      //   A numeric single-key extract + aggregate (the q28/q31 shape)
      //   B string-key filter + count (the g05-family predicate shape)
      //   C multi-key extract + group-by (the jsonb-agg render shape)
      // The decision bar (SURVEY §1.3): jsonb equality/containment
      // semantics must stay EXACT — variant has no containment or
      // jsonb btree order, so those ops would still need the string
      // round-trip regardless of what this measures.
      import org.apache.spark.sql.functions._
      def t3(lbl: String)(f: => Long): Unit = {
        f // warm (codegen + page cache)
        val ts = (1 to 3).map { _ =>
          val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
        }
        println(f"  $lbl: min ${ts.min}%.3f s  runs ${ts.map(x => f"$x%.3f").mkString(" ")}")
      }
      val dir = java.nio.file.Files
        .createTempDirectory("graft_variant_spike").toString
      try {
        val li = relational.Tables.load(spark, d, "lineitem")
        val props = to_json(struct(li.columns.map(col): _*))
        val base = (0 until 10).map(i =>
            li.withColumn("props", props)
              .withColumn("id", col("l_orderkey") * 100 + i)
              .select("id", "props"))
          .reduce(_ unionAll _)
        base.repartitionByRange(16, col("id")).sortWithinPartitions("id")
          .write.mode("overwrite").parquet(s"$dir/props_str.parquet")
        base.select(col("id"), parse_json(col("props")).as("props"))
          .repartitionByRange(16, col("id")).sortWithinPartitions("id")
          .write.mode("overwrite").parquet(s"$dir/props_var.parquet")
        val str = spark.read.parquet(s"$dir/props_str.parquet")
        val vnt = spark.read.parquet(s"$dir/props_var.parquet")
        println(s"rows: ${str.count()}  (string vs variant parquet)")
        import graft.expr.J
        t3("A string: J.getKey numeric agg")(
          str.select(J.toLong(J.getKey(col("props"), "l_quantity")).as("q"))
            .groupBy("q").count().count())
        t3("A variant: variant_get numeric agg")(
          vnt.select(expr("variant_get(props, '$.l_quantity', 'long')").as("q"))
            .groupBy("q").count().count())
        t3("B string: J.getKey string filter")(
          str.where(J.asText(J.getKey(col("props"), "l_returnflag")) === "R")
            .count())
        t3("B variant: variant_get string filter")(
          vnt.where(expr("variant_get(props, '$.l_returnflag', 'string')") === "R")
            .count())
        t3("C string: 3-key extract group-by")(
          str.select(
              J.asText(J.getKey(col("props"), "l_returnflag")).as("rf"),
              J.asText(J.getKey(col("props"), "l_linestatus")).as("ls"),
              J.toLong(J.getKey(col("props"), "l_quantity")).as("q"))
            .groupBy("rf", "ls").agg(sum("q")).count())
        t3("C variant: 3-key extract group-by")(
          vnt.select(
              expr("variant_get(props, '$.l_returnflag', 'string')").as("rf"),
              expr("variant_get(props, '$.l_linestatus', 'string')").as("ls"),
              expr("variant_get(props, '$.l_quantity', 'long')").as("q"))
            .groupBy("rf", "ls").agg(sum("q")).count())
        // the engine's own sidecar answer to the same tax, for context:
        // a shredded typed column reads with NO parse on either path
        val shred = base
          .withColumn("__pn_l_quantity",
            get_json_object(col("props"), "$.l_quantity").cast("decimal(38,18)"))
        shred.repartitionByRange(16, col("id")).sortWithinPartitions("id")
          .write.mode("overwrite").parquet(s"$dir/props_shred.parquet")
        val sh = spark.read.parquet(s"$dir/props_shred.parquet")
        t3("A shred: typed sidecar agg")(
          sh.select(col("__pn_l_quantity").cast("long").as("q"))
            .groupBy("q").count().count())
        println("sizes on disk (MB):")
        for (n <- Seq("props_str", "props_var", "props_shred")) {
          val p = java.nio.file.Paths.get(s"$dir/$n.parquet")
          val sz = java.nio.file.Files.walk(p).filter(
            java.nio.file.Files.isRegularFile(_))
            .mapToLong(java.nio.file.Files.size(_)).sum / (1024 * 1024)
          println(s"  $n: $sz")
        }
      } finally {
        def del(p: java.nio.file.Path): Unit = {
          if (java.nio.file.Files.isDirectory(p)) {
            val s = java.nio.file.Files.list(p)
            try s.forEach(del(_)) finally s.close()
          }
          java.nio.file.Files.deleteIfExists(p)
        }
        del(java.nio.file.Paths.get(dir))
      }
      spark.stop(); return
    }
    if (name == "plansweep") {
      // dump every query's formatted plan to a dir + print smell
      // counters (cartesian products, exchange counts, unpushed scans)
      val outDir = if (args.length > 1) args(1) else "/tmp/graft_plans"
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
      val only = if (args.length > 2) args(2).split(",").toSet else Set.empty[String]
      SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (n, fn) =>
        if (only.isEmpty || only.exists(n.startsWith)) {
          try {
            val df = fn(spark, d)
            val plan = df.queryExecution.explainString(
              org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
            java.nio.file.Files.writeString(
              java.nio.file.Paths.get(s"$outDir/$n.txt"), plan)
            def c(p: String) = p.r.findAllIn(plan).length
            val cart = c("CartesianProduct")
            val exch = c("Exchange") - c("ReusedExchange") - c("BroadcastExchange")
            val smj = c("SortMergeJoin")
            val gen = c("Generate")
            val nopush = "PushedFilters: \\[\\]".r.findAllIn(plan).length
            println(f"$n%-32s exch=$exch%2d smj=$smj%2d cart=$cart%2d " +
              f"gen=$gen%2d scans_nofilter=$nopush%2d")
          } catch { case e: Throwable =>
            println(s"$n FAILED: ${e.getClass.getSimpleName} ${String.valueOf(e.getMessage).take(80)}")
          }
        }
      }
      spark.stop(); return
    }
    if (name == "bm25ab") {
      // old (3-corpus-scan) vs new (tf-checkpointed) bm25, interleaved
      import org.apache.spark.sql.DataFrame
      import org.apache.spark.sql.functions._
      val sp2 = spark
      import sp2.implicits._
      val queries = Seq((0L, "spark join window"),
        (1L, "slow fast table value")).toDF("qid", "qtext")
      def oldBm25(): Long = {
        val docs = relational.Tables.load(spark, d, "documents")
        val (idCol, textCol, qidCol, qtextCol, k, k1, b) =
          ("doc_id", "text", "qid", "qtext", 10, 1.2, 0.75)
        val toks = docs.select(col(idCol),
            explode(split(lower(col(textCol)), "\\s+")).as("term"))
          .where(length(col("term")) > 0)
        val dl = toks.groupBy(idCol).agg(count(lit(1)).as("dl"))
        val stats = dl.agg(count(lit(1)).as("n_docs"),
          avg(col("dl").cast("double")).as("avgdl"))
        val qterms = queries.select(col(qidCol),
            explode(split(lower(col(qtextCol)), "\\s+")).as("term"))
          .where(length(col("term")) > 0).distinct()
        val qvocab = qterms.select("term").distinct()
        val toksQ = toks.join(broadcast(qvocab), Seq("term"))
        val tf = toksQ.groupBy(idCol, "term").agg(count(lit(1)).as("n_t"))
        val dfreq = toksQ.select(col(idCol), col("term")).distinct()
          .groupBy("term").agg(count(lit(1)).as("df_t"))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(qidCol).orderBy(col("score").desc, col(idCol))
        tf.join(broadcast(qterms), Seq("term"))
          .join(dl, idCol)
          .join(broadcast(dfreq), Seq("term"))
          .crossJoin(broadcast(stats))
          .withColumn("idf", log(
            (col("n_docs").cast("double") - col("df_t") + 0.5) /
              (col("df_t") + 0.5) + 1.0))
          .withColumn("contrib",
            col("idf") * col("n_t") * (k1 + 1.0) /
              (col("n_t") + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / col("avgdl"))))
          .groupBy(qidCol, idCol)
          .agg(round(sum("contrib"), 6).as("score"))
          .withColumn("rank", row_number().over(w))
          .where(col("rank") <= k)
          .count()
      }
      def newBm25(): Long = pipeline.TextOps.bm25TopK(
        relational.Tables.load(spark, d, "documents"), "doc_id", "text",
        queries, "qid", "qtext", k = 10).count()
      oldBm25(); newBm25()
      val ta = scala.collection.mutable.ArrayBuffer[Double]()
      val tb = scala.collection.mutable.ArrayBuffer[Double]()
      for (_ <- 1 to 5) {
        var t0 = System.nanoTime(); oldBm25()
        ta += (System.nanoTime() - t0) / 1e9
        t0 = System.nanoTime(); newBm25()
        tb += (System.nanoTime() - t0) / 1e9
      }
      println(f"OLD bm25: min ${ta.min}%.2f  runs ${ta.map(t => f"$t%.2f").mkString(" ")}")
      println(f"NEW bm25: min ${tb.min}%.2f  runs ${tb.map(t => f"$t%.2f").mkString(" ")}")
      spark.stop(); return
    }
    if (name == "ab") {
      // interleaved A/B of two query names in ONE JVM (min-of-5 each,
      // alternating) — the only protocol that survives +-40% host noise
      val a = args(1); val bq = args(2)
      val fa = SparkEntry.queries(a); val fb = SparkEntry.queries(bq)
      fa(spark, d).count(); fb(spark, d).count() // warm both
      val ta = scala.collection.mutable.ArrayBuffer[Double]()
      val tb = scala.collection.mutable.ArrayBuffer[Double]()
      for (_ <- 1 to 5) {
        var t0 = System.nanoTime(); fa(spark, d).count()
        ta += (System.nanoTime() - t0) / 1e9
        t0 = System.nanoTime(); fb(spark, d).count()
        tb += (System.nanoTime() - t0) / 1e9
      }
      println(f"A $a: min ${ta.min}%.2f  runs ${ta.map(t => f"$t%.2f").mkString(" ")}")
      println(f"B $bq: min ${tb.min}%.2f  runs ${tb.map(t => f"$t%.2f").mkString(" ")}")
      spark.stop(); return
    }
    if (name == "cypher") {
      // time one Cypher statement (steady min-of-3) + optional explain
      val s = pipeline.GraphQueries.session(spark, d)
      val stmt = args(1)
      s.cypher(stmt).count() // warm
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); s.cypher(stmt).count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"CYPHER min ${ts.min}%.2f s  runs ${ts.map(t => f"$t%.2f").mkString(" ")}")
      if (args.length > 2 && args(2) == "explain")
        s.cypher(stmt).explain("formatted")
      spark.stop(); return
    }
    if (name == "confab") {
      // interleaved conf A/B in ONE JVM (the only protocol that
      // survives +-40% host noise): args(1)=confA "k=v,..." ("-"=none),
      // args(2)=confB, args(3)=queries. min-of-5 each, alternating.
      def applyConf(spec: String): Unit = if (spec != "-")
        spec.split(",").foreach { kv =>
          val Array(k, v) = kv.split("=", 2); spark.conf.set(k, v) }
      def clearConf(spec: String): Unit = if (spec != "-")
        spec.split(",").foreach { kv => spark.conf.unset(kv.split("=", 2)(0)) }
      val (ca, cb) = (args(1), args(2))
      val names = args(3).split(",").toSeq
      names.foreach { n =>
        val fn = SparkEntry.queries(n)
        applyConf(ca); fn(spark, d).count(); clearConf(ca)
        applyConf(cb); fn(spark, d).count(); clearConf(cb) // warm both
        val ta = scala.collection.mutable.ArrayBuffer[Double]()
        val tb = scala.collection.mutable.ArrayBuffer[Double]()
        for (_ <- 1 to 5) {
          applyConf(ca)
          var t0 = System.nanoTime(); fn(spark, d).count()
          ta += (System.nanoTime() - t0) / 1e9
          clearConf(ca); applyConf(cb)
          t0 = System.nanoTime(); fn(spark, d).count()
          tb += (System.nanoTime() - t0) / 1e9
          clearConf(cb)
        }
        println(f"  $n A[$ca] min ${ta.min}%.2f runs ${ta.map(t => f"$t%.2f").mkString(" ")}")
        println(f"  $n B[$cb] min ${tb.min}%.2f runs ${tb.map(t => f"$t%.2f").mkString(" ")}")
      }
      spark.stop(); return
    }
    if (name == "conf") {
      // diagnostic: min-of-3 steady timing for args(2..) queries under
      // a conf override "k=v,k=v" in args(1) ("-" = none)
      if (args(1) != "-") args(1).split(",").foreach { kv =>
        val Array(k, v) = kv.split("=", 2); spark.conf.set(k, v)
      }
      val names = args(2).split(",").toSeq
      names.foreach(n => SparkEntry.queries(n)(spark, d).count()) // warm
      names.foreach { n =>
        val ts = (1 to 3).map { _ =>
          val t0 = System.nanoTime()
          SparkEntry.queries(n)(spark, d).count()
          (System.nanoTime() - t0) / 1e9
        }
        println(f"  $n: min ${ts.min}%.2f s  runs ${ts.map(t => f"$t%.2f").mkString(" ")}")
      }
      spark.stop(); return
    }
    if (name == "jobs") {
      // per-job wall-time attribution for one query: args(1) = query.
      // Shows whether a loop-shaped operator spends its seconds in
      // compute or in per-round job overhead (N tiny jobs x fixed tax).
      val qn = args(1)
      val fn = SparkEntry.queries(qn)
      fn(spark, d).count() // warm (fixture build + codegen)
      fn(spark, d).count()
      case class J(id: Int, t0: Long, var t1: Long = -1L,
        var tasks: Int = 0, var desc: String = "", var graft: String = "")
      val jobs = new scala.collection.mutable.LinkedHashMap[Int, J]()
      val listener = new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            e: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          val j = J(e.jobId, e.time)
          j.tasks = e.stageInfos.map(_.numTasks).sum
          j.desc = Option(e.properties)
            .flatMap(p => Option(p.getProperty("spark.job.description")))
            .getOrElse("") + " | " +
            e.stageInfos.map(si => si.name.take(40)).mkString(";").take(120)
          // first graft.* frame of each stage's submission stack — the
          // operator-level attribution the truncated stage name loses
          j.graft = e.stageInfos.map(_.details.linesIterator
              .find(l => l.contains("graft.") && !l.contains("Dev"))
              .map(_.trim.stripPrefix("at ").take(60)).getOrElse("?"))
            .mkString(" ; ").take(200)
          jobs.synchronized { jobs(e.jobId) = j }
        }
        override def onJobEnd(
            e: org.apache.spark.scheduler.SparkListenerJobEnd): Unit =
          jobs.synchronized { jobs.get(e.jobId).foreach(_.t1 = e.time) }
      }
      spark.sparkContext.addSparkListener(listener)
      // sample the MAIN thread's stack every 20 ms for a poor-man's
      // driver profile: histogram of the deepest graft/spark frame
      val mainThread = Thread.currentThread()
      val hist = new java.util.concurrent.ConcurrentHashMap[String, Integer]()
      @volatile var sampling = true
      val sampler = new Thread(() => {
        while (sampling) {
          val st = mainThread.getStackTrace
          val key = {
            val interesting = st.find(f =>
              f.getClassName.startsWith("graft.") ||
              f.getClassName.contains("catalyst.analysis") ||
              f.getClassName.contains("catalyst.optimizer") ||
              f.getClassName.contains("QueryExecution") ||
              f.getClassName.contains("RuleExecutor") ||
              f.getClassName.contains("CodeGenerator") ||
              f.getClassName.contains("adaptive"))
            val top5 = st.take(30).map(f =>
              f.getClassName.split("\\.").last + "." + f.getMethodName)
            interesting.map(f => f.getClassName.split("\\.").last + "." +
              f.getMethodName + ":" + f.getLineNumber)
              .getOrElse(top5.headOption.getOrElse("?"))
          }
          hist.merge(key, 1, (x, y) => x + y)
          Thread.sleep(20)
        }
      })
      sampler.setDaemon(true); sampler.start()
      val t0 = System.nanoTime()
      val df = fn(spark, d)
      val tBuild = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime()
      df.queryExecution.executedPlan // force analysis+optimize+planning
      val tPlan = (System.nanoTime() - t1) / 1e9
      val t2 = System.nanoTime()
      df.count()
      val tExec = (System.nanoTime() - t2) / 1e9
      val wall = (System.nanoTime() - t0) / 1e9
      println(f"build $tBuild%.2f s (incl. any statements run inside " +
        f"the query fn), plan $tPlan%.2f s, exec $tExec%.2f s")
      sampling = false
      Thread.sleep(300) // let the listener bus drain
      spark.sparkContext.removeSparkListener(listener)
      import scala.jdk.CollectionConverters._
      println("driver stack histogram (20 ms samples, top 25):")
      hist.asScala.toSeq.sortBy(-_._2).take(25).foreach { case (k, n) =>
        println(f"  $n%4d  $k")
      }
      val js = jobs.values.toSeq
      val jsum = js.map(j => math.max(0L, j.t1 - j.t0)).sum / 1e3
      println(f"WALL $wall%.2f s, ${js.length} jobs, job-time sum $jsum%.2f s")
      js.foreach { j =>
        println(f"  job ${j.id}%4d  ${math.max(0L, j.t1 - j.t0) / 1e3}%6.2f s  " +
          f"${j.tasks}%5d tasks  ${j.desc.take(70)}")
        if (j.t1 - j.t0 >= 150) println(f"       graft: ${j.graft}")
      }
      spark.stop(); return
    }
    val fn = SparkEntry.queries(name)
    // warm
    fn(spark, d).count()
    val ts = (1 to 3).map { _ =>
      val t0 = System.nanoTime()
      fn(spark, d).count()
      (System.nanoTime() - t0) / 1e9
    }
    println(f"STEADY min ${ts.min}%.2f s  runs ${ts.map(t => f"$t%.2f").mkString(" ")}")
    if (args.length > 1 && args(1) == "explain") fn(spark, d).explain("formatted")
    spark.stop()
  }
}
