package graft.streaming

import graft.SparkTestBase
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Drives the streaming operators end-to-end with MemoryStream sources
  * and memory sinks, and checks batch/stream agreement for the
  * windowed aggregation (same columns, same results).
  */
class EventStreamsSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def ts(minute: Int): java.sql.Timestamp =
    java.sql.Timestamp.valueOf(f"2026-01-01 10:$minute%02d:00")

  private def sampleEvents: Seq[EventStreams.Event] = Seq(
    EventStreams.Event(1, ts(0), 100, "click", 1.0),
    EventStreams.Event(2, ts(1), 100, "click", 2.0),
    EventStreams.Event(3, ts(2), 200, "view", 3.0),
    EventStreams.Event(4, ts(11), 100, "click", 4.0),
    EventStreams.Event(5, ts(12), 200, "view", 5.0))

  test("tumbling-window counts: stream result equals batch result") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[EventStreams.Event]
    input.addData(sampleEvents: _*)
    val streamDf = EventStreams.tumblingCounts(input.toDF(), "10 minutes", "1 minute")
    val q = streamDf.writeStream.format("memory").queryName("tumbling_out")
      .outputMode("complete").start()
    q.processAllAvailable()
    q.stop()
    val got = spark.table("tumbling_out")
      .select("w_start", "event_type", "n", "total")
      .orderBy("w_start", "event_type").collect().map(_.toSeq).toSeq
    val want = EventStreams.tumblingCounts(sampleEvents.toDF(), "10 minutes", "1 minute")
      .select("w_start", "event_type", "n", "total")
      .orderBy("w_start", "event_type").collect().map(_.toSeq).toSeq
    assert(got == want)
    assert(got.size == 4) // 2 windows x 2 types
  }

  test("streaming dedup drops repeated digests across batches") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, java.sql.Timestamp, String)]
    val docs = input.toDF().toDF("doc_id", "ts", "text")
    val out = EventStreams.dedupStream(docs, "ts", "text", "10 minutes")
    val q = out.writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").start()
    input.addData((1L, ts(0), "hello world"), (2L, ts(1), "HELLO world"),
      (3L, ts(2), "fresh text"))
    q.processAllAvailable()
    // second batch: one duplicate (within watermark), one new
    input.addData((4L, ts(3), "hello WORLD"), (5L, ts(4), "brand new"))
    q.processAllAvailable()
    q.stop()
    val kept = spark.table("dedup_out").select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 3L, 5L))
  }

  test("session windows close after the gap") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[EventStreams.Event]
    input.addData(sampleEvents: _*)
    val q = EventStreams.sessionWindows(input.toDF(), "5 minutes", "1 minute")
      .writeStream.format("memory").queryName("session_out")
      .outputMode("complete").start()
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("session_out")
      .orderBy("user_id", "s_start").collect()
    // user 100: events at 0,1 then 11 -> two sessions; user 200: 2 and 12
    assert(rows.length == 4)
    assert(rows.map(_.getAs[Long]("n_events")).toSeq == Seq(2L, 1L, 1L, 1L))
  }

  test("stream-static enrichment joins dimension rows per micro-batch") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val dim = Seq((100L, "gold"), (200L, "silver")).toDF("uid", "tier")
    val input = MemoryStream[EventStreams.Event]
    val q = EventStreams.enrich(input.toDF(), dim, "user_id", "uid")
      .select("event_id", "tier")
      .writeStream.format("memory").queryName("enrich_out")
      .outputMode("append").start()
    input.addData(
      EventStreams.Event(1, ts(0), 100, "click", 1.0),
      EventStreams.Event(2, ts(1), 300, "click", 1.0)) // no dim row
    q.processAllAvailable()
    q.stop()
    val got = spark.table("enrich_out")
      .collect().map(r => (r.getLong(0), Option(r.getString(1)))).toSet
    assert(got == Set((1L, Some("gold")), (2L, None)))
  }

  test("event-time timeout emits session summaries once the watermark passes") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[EventStreams.Event]
    val q = EventStreams.sessionCloseSummaries(input.toDS(),
      gapMs = 5 * 60 * 1000, watermark = "0 seconds")
      .writeStream.format("memory").queryName("close_out")
      .outputMode("append").start()
    // user 100 active at minutes 0-2
    input.addData(
      EventStreams.Event(1, ts(0), 100, "click", 1.0),
      EventStreams.Event(2, ts(2), 100, "click", 2.0))
    q.processAllAvailable()
    assert(spark.table("close_out").count() == 0) // nothing closed yet
    // a much later event advances the watermark past 100's gap
    input.addData(EventStreams.Event(3, ts(30), 200, "view", 9.0))
    q.processAllAvailable()
    // one more batch so the timeout fires against the advanced watermark
    input.addData(EventStreams.Event(4, ts(31), 200, "view", 1.0))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("close_out")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(rows.contains((100L, 2L, 3.0)), rows)
  }

  test("stream-stream interval join attributes clicks within the window") {
    implicit val sqlCtx = spark.sqlContext
    val imps = MemoryStream[EventStreams.Event]
    val clks = MemoryStream[EventStreams.Event]
    val out = EventStreams.intervalJoin(imps.toDF(), clks.toDF(),
      watermark = "1 minute", within = "10 minutes")
    val q = out.writeStream.format("memory").queryName("attr_out")
      .outputMode("append").start()
    imps.addData(
      EventStreams.Event(1, ts(0), 100, "view", 0),
      EventStreams.Event(2, ts(0), 200, "view", 0))
    clks.addData(
      EventStreams.Event(10, ts(2), 100, "click", 0), // within 10 min
      EventStreams.Event(11, ts(40), 100, "click", 0), // too late
      EventStreams.Event(12, ts(5), 300, "click", 0)) // no impression
    q.processAllAvailable()
    q.stop()
    val got = spark.table("attr_out").select("imp_id", "click_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 10L)))
  }

  test("text curation expressions run unchanged under streaming (batch parity)") {
    implicit val sqlCtx = spark.sqlContext
    import graft.pipeline.TextOps
    val docs = Seq(
      (1L, "the quick brown fox and the lazy dog of the north is here"),
      (2L, "der hund und die katze das ist gut und schon"),
      (3L, "x")).toDF("doc_id", "text")
    def curate(df: org.apache.spark.sql.DataFrame) =
      df.select(col("doc_id"),
        TextOps.qualityScore(col("text")).as("q"),
        TextOps.langId(col("text")).as("lang"),
        TextOps.tokenCount(col("text")).as("toks"))
    val input = MemoryStream[(Long, String)]
    input.addData(1L -> docs.collect()(0).getString(1),
      2L -> docs.collect()(1).getString(1), 3L -> "x")
    val q = curate(input.toDF().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("curate_out")
      .outputMode("append").start()
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("curate_out").orderBy("doc_id")
      .collect().map(_.toSeq).toSeq
    val batch = curate(docs).orderBy("doc_id").collect().map(_.toSeq).toSeq
    assert(streamed == batch)
    assert(batch.map(_(2)) == Seq("en", "de", "en")) // langid sanity
  }

  test("mapGroupsWithState keeps running totals across batches") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[EventStreams.Event]
    val q = EventStreams.runningUserTotals(input.toDS())
      .writeStream.format("memory").queryName("running_out")
      .outputMode("update").start()
    input.addData(sampleEvents.take(3): _*)
    q.processAllAvailable()
    input.addData(sampleEvents.drop(3): _*)
    q.processAllAvailable()
    q.stop()
    val last = spark.table("running_out")
      .groupBy("user_id").agg(max("n_events").as("n"), max("total").as("t"))
      .orderBy("user_id").collect()
    assert(last.map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq ==
      Seq((100L, 3L, 7.0), (200L, 2L, 8.0)))
  }
}
