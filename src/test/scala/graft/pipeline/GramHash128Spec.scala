package graft.pipeline

import graft.SparkTestBase
import org.scalatest.funsuite.AnyFunSuite

/** The 128-bit gram-key mode (`spark.graft.gramHash.bits=128`) for
  * the hashed-gram operators (p29/p32/p61/p112/p121/p124): at the
  * third decade 64-bit birthday collisions are statistically certain
  * (expected pairs ≈ n²/2^65), so exactness-critical runs can widen
  * the key to two independently-salted xxhash64 values. Both modes
  * must gate the SAME oracle — i.e. produce identical results at
  * test scale, where the string-keyed oracle already proves the
  * 64-bit key collision-free.
  */
class GramHash128Spec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  private val d = "/root/testdata/sf0.001"
  private val Key = "spark.graft.gramHash.bits"

  private def run(name: String): Seq[String] =
    PipelineQueries.queries(name)(spark, d)
      .collect().map(_.toString).toSeq

  private def with128[A](f: => A): A = {
    spark.conf.set(Key, "128")
    try f finally spark.conf.unset(Key)
  }

  for (q <- Seq("p29_boilerplate", "p32_line_dedup", "p61_repeated_spans",
      "p112_shared_ngram_spans", "p121_lm_perplexity",
      "p124_gram_coverage_dedup")) {
    test(s"$q: 64-bit and 128-bit gram keys produce identical results") {
      val narrow = run(q)
      val wide = with128(run(q))
      assert(wide == narrow)
    }
  }

  test("128-bit mode widens the key to a two-hash struct (plan check)") {
    import org.apache.spark.sql.types.{LongType, StructType}
    // the mode must actually change the exchanged key, not be a no-op:
    // the gram join-key attribute is a two-long struct in 128 mode and
    // a bare long in the default
    def gramType(p: org.apache.spark.sql.DataFrame) =
      p.queryExecution.analyzed.collect { case n => n.output }
        .flatten.find(_.name == "gram").get.dataType
    val wide = with128 {
      gramType(PipelineQueries.queries("p124_gram_coverage_dedup")(spark, d))
    }
    wide match {
      case st: StructType =>
        assert(st.fieldNames.toSeq == Seq("h0", "h1"))
        assert(st.fields.forall(_.dataType == LongType))
      case other => fail(s"expected struct key, got $other")
    }
    val narrow =
      gramType(PipelineQueries.queries("p124_gram_coverage_dedup")(spark, d))
    assert(narrow == LongType)
  }
}
