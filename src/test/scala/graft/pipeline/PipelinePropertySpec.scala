package graft.pipeline

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Property tests for the pipeline kernels: structural invariants that
  * must hold for any input, not just the golden fixtures. Seeded
  * generators keep runs deterministic (same style as
  * JsonbPropertySpec).
  */
class PipelinePropertySpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  private def randDoc(rnd: java.util.Random): String = {
    val n = 1 + rnd.nextInt(30)
    (0 until n).map { _ =>
      val len = 1 + rnd.nextInt(6)
      (0 until len).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
    }.mkString(" ")
  }

  test("wordNgrams yields exactly max(0, tokens - n + 1) grams of n tokens each") {
    import spark.implicits._
    val rnd = new java.util.Random(7)
    for (_ <- 1 to 5) {
      val n = 1 + rnd.nextInt(6)
      val docs = (0 until 6).map(i => (i.toLong, randDoc(rnd)))
      val df = docs.toDF("doc_id", "text")
      val grams = TextOps.wordNgrams(df, n, "text", "doc_id")
        .collect().map(r => (r.getLong(0), r.getString(1)))
      val byDoc = grams.groupBy(_._1).view.mapValues(_.length).toMap
      docs.foreach { case (i, t) =>
        val want = math.max(0, t.split("\\s+").length - n + 1)
        assert(byDoc.getOrElse(i, 0) == want, s"doc $i n=$n")
      }
      assert(grams.forall(_._2.split(" ").length == n))
    }
  }

  test("int8 quantization codes stay in [0, 255], min -> 0, argmax preserved") {
    import spark.implicits._
    val rnd = new java.util.Random(11)
    val vecs = (0 until 8).map { i =>
      val n = 2 + rnd.nextInt(15)
      (i.toLong, (0 until n).map(_ => rnd.nextFloat() * 200f - 100f).toList)
    }.filter { case (_, v) => v.max > v.min }
    val rows = vecs.toDF("vec_id", "embedding")
      .select(col("vec_id"), Similarity.quantizeInt8(col("embedding")).as("q"),
        col("embedding"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val q = r.getAs[scala.collection.Seq[Int]]("q")
      val v = r.getAs[scala.collection.Seq[Float]]("embedding")
      assert(q.forall(c => c >= 0 && c <= 255))
      assert(q(v.indexOf(v.max)) == q.max)
      assert(q(v.indexOf(v.min)) == 0)
    }
  }

  test("clusters partition the vertex set with canonical min-member labels") {
    import spark.implicits._
    val rnd = new java.util.Random(13)
    for (round <- 1 to 4) {
      val edges = (0 until 15).map { _ =>
        val a = 1L + rnd.nextInt(20); var b = 1L + rnd.nextInt(20)
        if (a == b) b = if (a == 20L) 1L else a + 1
        (math.min(a, b), math.max(a, b))
      }.distinct
      val pairs = edges.toDF("da", "db")
      // exercise BOTH strategies and require identical results
      val drv = Dedup.clusters(pairs).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toMap
      val dist = Dedup.clusters(pairs, maxDriverPairs = 0L).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toMap
      assert(drv == dist, s"round $round: driver and distributed CC disagree")
      val ids = edges.flatMap(e => Seq(e._1, e._2)).toSet
      assert(drv.keySet == ids)
      drv.foreach { case (id, comp) =>
        assert(comp <= id)
        assert(drv(comp) == comp, "labels are canonical (roots label themselves)")
      }
      edges.foreach { case (a, b) => assert(drv(a) == drv(b)) }
    }
  }
}
