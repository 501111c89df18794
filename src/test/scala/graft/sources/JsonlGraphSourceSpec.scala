package graft.sources

import java.nio.file.{Files, Paths}
import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The DataSource V2 ForeignScan analog end to end: schema inference,
  * per-file partitions, canonical jsonb properties, id-filter and
  * column pushdown, and composition with the Cypher engine via
  * LOAD FROM.
  */
class JsonlGraphSourceSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  private lazy val dir: String = {
    val d = Files.createTempDirectory("graft_jsonl").toString
    // two files -> two input partitions; keys deliberately unsorted so
    // canonicalization is observable
    Files.write(Paths.get(d, "part-0.jsonl"),
      """{"id": 1, "name": "a", "acct": 10}
        |{"id": 2, "acct": 20, "name": "b"}
        |""".stripMargin.getBytes("UTF-8"))
    Files.write(Paths.get(d, "part-1.jsonl"),
      """{"id": 3, "name": "c", "nested": {"z": 1, "a": [1, 2]}}
        |""".stripMargin.getBytes("UTF-8"))
    d
  }

  test("reads JSONL dumps with canonical jsonb properties") {
    val df = spark.read.format("graft-jsonl-graph").load(dir)
    assert(df.schema.fieldNames.toSeq == Seq("id", "properties"))
    assert(df.rdd.getNumPartitions == 2)
    val rows = df.orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(rows == Seq(
      1L -> """{"acct": 10, "name": "a"}""",
      2L -> """{"acct": 20, "name": "b"}""",
      3L -> """{"name": "c", "nested": {"a": [1, 2], "z": 1}}"""))
  }

  test("id filters and column pruning push into the source") {
    val df = spark.read.format("graft-jsonl-graph").load(dir)
      .where(col("id") >= 2).select("id")
    assert(df.collect().map(_.getLong(0)).sorted.toSeq == Seq(2L, 3L))
    // the filter is consumed by the source: no residual Filter node,
    // and the scan advertises it
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [GreaterThanOrEqual(id,2)]"), plan)
    assert(plan.contains("ReadSchema: struct<id:bigint>"), plan)
    assert(!plan.contains("+- Filter"), plan)
  }

  test("write half: per-partition files, canonical lines, overwrite truncates") {
    val out = Files.createTempDirectory("graft_jsonl_w").toString
    val src = spark.read.format("graft-jsonl-graph").load(dir)
    src.repartition(2).write.format("graft-jsonl-graph")
      .mode("append").save(out)
    // one part file per task, interchange-compatible with the reader
    assert(new java.io.File(out).listFiles().count(_.isFile) == 2)
    val back = spark.read.format("graft-jsonl-graph").load(out)
      .orderBy("id").collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    val orig = src.orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(back == orig)
    // raw lines carry the id inline, canonical form
    val lines = new java.io.File(out).listFiles().filter(_.isFile)
      .flatMap(f => scala.io.Source.fromFile(f, "UTF-8").getLines()).sorted
    assert(lines.head == """{"id": 1, "acct": 10, "name": "a"}""", lines.head)
    // append accumulates; overwrite truncates back to one write's worth
    src.write.format("graft-jsonl-graph").mode("append").save(out)
    assert(spark.read.format("graft-jsonl-graph").load(out).count() == 6)
    src.write.format("graft-jsonl-graph").mode("overwrite").save(out)
    assert(spark.read.format("graft-jsonl-graph").load(out)
      .orderBy("id").collect().map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L))
    // schema is validated up front
    intercept[Exception] {
      spark.range(3).toDF("id").write
        .format("graft-jsonl-graph").mode("append").save(out)
    }
  }

  test("a foreign JSONL table joins into Cypher via LOAD FROM") {
    import graft.api.CypherSession
    import graft.graph.GraphCatalog
    import graft.expr.J
    val root = Files.createTempDirectory("graft_jsonl_g").toString
    val s = new CypherSession(spark, new GraphCatalog(spark, root))
    s.createGraph("jg")
    s.createVLabel("acct")
    s.cypher("CREATE (:acct {aid: 1}), (:acct {aid: 3})")
    spark.read.format("graft-jsonl-graph").load(dir)
      .createOrReplaceTempView("dump")
    val out = s.cypher(
      """LOAD FROM dump AS row
        |MATCH (a:acct) WHERE a.aid = row.id
        |RETURN a.aid AS aid ORDER BY aid""".stripMargin)
    assert(out.collect().map(_.getString(0)).toSeq == Seq("1", "3"))
  }
}
