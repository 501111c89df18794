package graft.plans

import graft.SparkTestBase
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TopKPerKeySpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  private def windowTopK(df: org.apache.spark.sql.DataFrame, k: Int) = df
    .withColumn("__rn", row_number().over(
      Window.partitionBy("g").orderBy(col("v").desc, col("id"))))
    .where(col("__rn") <= k).drop("__rn")

  test("topKPerKey equals the window formulation on random data") {
    import spark.implicits._
    for (seed <- Seq(7, 19)) {
      val rnd = new scala.util.Random(seed)
      // hot key 0 gets most rows; values collide to exercise tiebreaks
      val rows = (0 until 3000).map { i =>
        (i.toLong, if (rnd.nextInt(10) < 7) 0L else rnd.nextInt(5).toLong,
          rnd.nextInt(40).toLong)
      }
      val df = rows.toDF("id", "g", "v").repartition(8)
      val want = windowTopK(df, 3).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val got = TopK.topKPerKey(df, Seq("g"),
          Seq(("v", false), ("id", true)), 3).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(got == want, s"seed $seed")
    }
  }

  test("groups smaller than k keep all rows; k=1 is per-key argmin") {
    import spark.implicits._
    val df = Seq((1L, 10L, 5L), (2L, 10L, 3L), (3L, 20L, 9L))
      .toDF("id", "g", "v")
    assert(TopK.topKPerKey(df, Seq("g"), Seq(("v", true)), 5).count() == 3)
    val one = TopK.topKPerKey(df, Seq("g"), Seq(("v", true)), 1)
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSet
    assert(one == Set((10L, 3L), (20L, 9L)))
  }

  test("optimizer rule rewrites declarative row_number <= k onto the operator") {
    import spark.implicits._
    val df = (0 until 500).map(i => (i.toLong, (i % 4).toLong, (i * 7 % 50).toLong))
      .toDF("id", "g", "v").repartition(4)
    def decl() = df
      .withColumn("rn", row_number().over(
        Window.partitionBy("g").orderBy(col("v").desc, col("id"))))
      .where(col("rn") <= 2)
      .select("id", "g", "v")
    val want = decl().collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(decl().queryExecution.executedPlan.toString.contains("Window"))
    TopK.enableRewrite(spark)
    try {
      val after = decl()
      val p = after.queryExecution.executedPlan.toString
      assert(p.contains("TopKPerKeyFinal"), p)
      assert(!p.contains("Window"), p)
      assert(after.collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getLong(2))).toSet == want)
      // NOT rewritten when the rank column survives the projection
      val keepRn = df
        .withColumn("rn", row_number().over(
          Window.partitionBy("g").orderBy(col("v").desc, col("id"))))
        .where(col("rn") <= 2)
      assert(keepRn.queryExecution.executedPlan.toString.contains("Window"))
    } finally TopK.disableRewrite(spark)
  }

  test("partial-pass flush keeps results exact under a tiny key budget (r12)") {
    import spark.implicits._
    // high-cardinality keys with a flush budget of 2 keys: the partial
    // pass flushes constantly (a hot key emits <= k per flush) and the
    // final pass must still merge back to exactly the window result
    val rnd = new scala.util.Random(41)
    val rows = (0 until 2000).map { i =>
      (i.toLong, (i % 311).toLong, rnd.nextInt(50).toLong)
    }
    val df = rows.toDF("id", "g", "v").repartition(8)
    val want = windowTopK(df, 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    spark.conf.set("spark.graft.topk.partialFlushKeys", "2")
    try {
      val got = TopK.topKPerKey(df, Seq("g"),
          Seq(("v", false), ("id", true)), 3).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(got == want)
    } finally spark.conf.unset("spark.graft.topk.partialFlushKeys")
  }

  test("RDD-backed (non-UnsafeRow) children convert instead of CCE (r12)") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    // a raw-Row RDD scan is the execute() contract's InternalRow-only
    // corner — the operator must accept it via the UnsafeProjection
    // fallback path
    val schema = StructType(Seq(StructField("id", LongType),
      StructField("g", LongType), StructField("v", LongType)))
    val rdd = spark.sparkContext.parallelize(
      (0 until 200).map(i => Row(i.toLong, (i % 5).toLong, (i * 13 % 40).toLong)), 4)
    val df = spark.createDataFrame(rdd, schema)
    val want = windowTopK(df, 2).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val got = TopK.topKPerKey(df, Seq("g"),
        Seq(("v", false), ("id", true)), 2).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == want)
  }

  test("plan shape: partial below the exchange, final above, no Window/Sort") {
    import spark.implicits._
    val df = (0 until 100).map(i => (i.toLong, (i % 3).toLong, i.toLong))
      .toDF("id", "g", "v").repartition(4)
    val p = TopK.topKPerKey(df, Seq("g"), Seq(("v", true)), 2)
      .queryExecution.executedPlan.toString
    assert(p.contains("TopKPerKeyPartial"), p)
    assert(p.contains("TopKPerKeyFinal"), p)
    assert(p.indexOf("TopKPerKeyFinal") < p.indexOf("Exchange"), p)
    assert(p.indexOf("Exchange") < p.indexOf("TopKPerKeyPartial"), p)
    assert(!p.contains("Window"), p)
  }
}
