package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming operators over the events table shape
  * (event_id, ts, user_id, event_type, value, props).
  *
  * The reference has no streaming subsystem (SURVEY §2.10) — this is
  * additive scope designed Spark-first: the same column expressions
  * used in the batch queries run under `readStream`, watermarks bound
  * state, and custom per-key state uses mapGroupsWithState (the
  * engine-managed distributed state store — scales with executors).
  */
object EventStreams {

  /** Tumbling-window counts/sums per event type with a watermark —
    * the streaming twin of q27_time_bucket.
    */
  def tumblingCounts(events: DataFrame, windowLen: String,
      watermark: String): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(28,4)")).as("total"))
      .select(col("window.start").as("w_start"), col("window.end").as("w_end"),
        col("event_type"), col("n"), col("total"))

  /** Chained time-window aggregations (two stateful operators in one
    * append-mode query — Spark 3.4+): inner windows aggregate raw
    * events, then re-aggregate into coarser outer windows keyed by
    * `window_time` of the inner window (its end − 1µs, the event-time
    * column a window aggregate emits). The cascade is the rollup shape
    * long-horizon dashboards need without replaying raw events — the
    * outer state sees one row per (inner window, type), not one per
    * event. Inner windows emit once the watermark passes their end;
    * outer windows emit once it passes THEIR end, which is always
    * later, so the chain needs no extra delay.
    */
  def chainedWindowAgg(events: DataFrame, inner: String, outer: String,
      watermark: String): DataFrame = {
    val fine = events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), inner), col("event_type"))
      .agg(count(lit(1)).as("n"))
    fine
      .groupBy(window(window_time(col("window")), outer), col("event_type"))
      .agg(sum("n").as("n_events"), max("n").as("max_inner"),
        count(lit(1)).as("n_inner"))
      .select(col("window.start").as("w_start"), col("event_type"),
        col("n_events"), col("max_inner"), col("n_inner"))
  }

  /** Sliding-window per-user activity. */
  def slidingUserActivity(events: DataFrame, windowLen: String,
      slide: String, watermark: String): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen, slide), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("window.start").as("w_start"), col("user_id"), col("n_events"))

  /** Session windows (gap-based) per user. */
  def sessionWindows(events: DataFrame, gap: String, watermark: String): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(28,4)")).as("session_value"))
      .select(col("session_window.start").as("s_start"),
        col("session_window.end").as("s_end"), col("user_id"),
        col("n_events"), col("session_value"))

  /** Streaming exact dedup on a content digest, bounded by the
    * watermark (dropDuplicatesWithinWatermark: state for a digest is
    * reclaimed once the watermark passes it — the streaming twin of
    * `Dedup.exact`, with bounded state instead of an ever-growing set).
    */
  def dedupStream(docs: DataFrame, tsCol: String, textCol: String,
      watermark: String): DataFrame =
    docs
      .withColumn("__digest", md5(lower(col(textCol))))
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark("__digest")
      .drop("__digest")

  /** Stream-static enrichment: join a stream against a (broadcastable)
    * dimension table — the dimension re-resolves per micro-batch, so
    * slowly-changing dims pick up updates without restarting the query.
    */
  def enrich(events: DataFrame, dim: DataFrame, eventKey: String,
      dimKey: String): DataFrame =
    events.join(org.apache.spark.sql.functions.broadcast(dim),
      col(eventKey) === col(dimKey), "left")

  /** Watermarked stream-stream interval join (click attribution shape):
    * each right-side event matches left-side events of the same user
    * within `within` after the left event. Both sides' state is
    * watermark-bounded — the time bound in the join condition is what
    * lets the engine evict old rows, so it scales to unbounded streams.
    */
  def intervalJoin(impressions: DataFrame, clicks: DataFrame,
      watermark: String, within: String): DataFrame = {
    val imp = impressions
      .select(col("event_id").as("imp_id"), col("user_id"),
        col("ts").as("imp_ts"))
      .withWatermark("imp_ts", watermark)
    val clk = clicks
      .select(col("event_id").as("click_id"), col("user_id").as("__cu"),
        col("ts").as("click_ts"))
      .withWatermark("click_ts", watermark)
    imp.join(clk,
      col("user_id") === col("__cu") &&
        col("click_ts") >= col("imp_ts") &&
        col("click_ts") <= col("imp_ts") + expr(s"INTERVAL $within"))
      .select(col("imp_id"), col("click_id"), col("user_id"),
        col("imp_ts"), col("click_ts"))
  }

  /** Left-outer variant of [[intervalJoin]]: impressions with no click
    * in their window emit ONCE with null click columns — but only
    * after the watermark passes the window end (before that a future
    * match can't be ruled out), so the final `watermark + within` of
    * the stream stays withheld in state. Still append-only and
    * watermark-bounded — the attribution shape where NON-converting
    * impressions are the signal.
    */
  def intervalJoinOuter(impressions: DataFrame, clicks: DataFrame,
      watermark: String, within: String): DataFrame = {
    val imp = impressions
      .select(col("event_id").as("imp_id"), col("user_id"),
        col("ts").as("imp_ts"))
      .withWatermark("imp_ts", watermark)
    val clk = clicks
      .select(col("event_id").as("click_id"), col("user_id").as("__cu"),
        col("ts").as("click_ts"))
      .withWatermark("click_ts", watermark)
    imp.join(clk,
      col("user_id") === col("__cu") &&
        col("click_ts") >= col("imp_ts") &&
        col("click_ts") <= col("imp_ts") + expr(s"INTERVAL $within"),
      "left_outer")
      .select(col("imp_id"), col("click_id"), col("user_id"),
        col("imp_ts"), col("click_ts"))
  }

  // ---- custom keyed state (mapGroupsWithState) ----------------------

  final case class Event(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
      event_type: String, value: Double)
  final case class UserRunning(user_id: Long, n_events: Long, total: Double)

  final case class SessionAgg(n_events: Long, total: Double, last_ts: Long)
  final case class SessionSummary(user_id: Long, n_events: Long, total: Double)

  /** Session-close alerts via flatMapGroupsWithState + EVENT-TIME
    * timeout: a user's summary is emitted only when the watermark
    * passes their last event + gap (the state store expires the key —
    * bounded state, emission driven by data time, not wall clock).
    */
  def sessionCloseSummaries(events: Dataset[Event], gapMs: Long,
      watermark: String): Dataset[SessionSummary] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionAgg, SessionSummary](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (uid: Long, rows: Iterator[Event], state: GroupState[SessionAgg]) =>
          if (state.hasTimedOut) {
            val agg = state.get
            state.remove()
            Iterator.single(SessionSummary(uid, agg.n_events, agg.total))
          } else {
            val batch = rows.toSeq
            val prev = state.getOption.getOrElse(SessionAgg(0L, 0.0, Long.MinValue))
            val lastTs = math.max(prev.last_ts, batch.map(_.ts.getTime).max)
            state.update(SessionAgg(prev.n_events + batch.size,
              prev.total + batch.map(_.value).sum, lastTs))
            state.setTimeoutTimestamp(lastTs + gapMs)
            Iterator.empty
          }
      }
  }

  /** Running per-user totals via explicit state — the
    * KeyValueGroupedDataset.mapGroupsWithState surface (SURVEY §2.10
    * North-star item); state lives in the engine's checkpointed store.
    */
  def runningUserTotals(events: Dataset[Event]): Dataset[UserRunning] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .mapGroupsWithState[UserRunning, UserRunning](
        GroupStateTimeout.NoTimeout) {
        (uid: Long, rows: Iterator[Event], state: GroupState[UserRunning]) =>
          val prev = state.getOption.getOrElse(UserRunning(uid, 0L, 0.0))
          val (n, tot) = rows.foldLeft((prev.n_events, prev.total)) {
            case ((cn, ct), e) => (cn + 1, ct + e.value)
          }
          val next = UserRunning(uid, n, tot)
          state.update(next)
          next
      }
  }
}
