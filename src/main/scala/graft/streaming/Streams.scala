package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming surface of the engine. The reference is strictly
  * batch (SURVEY §2.10) — these are the engine-inherited streaming
  * operators, shaped to mirror the batch event queries (q20/q21) so
  * stream/batch parity is testable: the same transformation applied via
  * `readStream` must agree with the batch result once all data is
  * processed.
  */
object Streams {

  final case class Event(event_id: Long, ts: java.sql.Timestamp,
      user_id: Long, event_type: String, value: Double)

  final case class UserTotal(user_id: Long, n_events: Long, total_value: Double)

  /** Tumbling event-time window with watermarked late-data handling
    * (streaming analog of q21_events_hourly).
    */
  def tumblingCounts(events: DataFrame, windowLen: String = "1 hour",
      watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen), col("event_type"))
      .agg(count(lit(1)).as("n"), sum("value").as("total_value"))
      .select(date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("window_start"),
        col("event_type"), col("n"), col("total_value"))

  /** Sliding (overlapping) event-time window with watermarked late-data
    * handling — each event lands in `windowLen / slide` windows (SURVEY
    * §2.10's remaining inherited window shape next to tumbling/session).
    */
  def slidingCounts(events: DataFrame, windowLen: String = "10 minutes",
      slide: String = "5 minutes", watermark: String = "30 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen, slide), col("event_type"))
      .agg(count(lit(1)).as("n"), sum("value").as("total_value"))
      .select(date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("window_start"),
        col("event_type"), col("n"), col("total_value"))

  /** Stream-static enrichment: join each streaming event to a bounded
    * dimension table (`dim`, broadcast — it is static for the life of
    * the query, so Spark re-plans no state for it), then the usual
    * watermarked tumbling aggregation per dimension attribute. This is
    * the canonical streaming-ETL shape — events arrive keyless of
    * business context, the dimension supplies it — and it costs no
    * state store beyond the window aggregation's: a stream-STATIC join
    * is stateless, unlike the stream-stream interval join
    * ([[attributedPurchases]]).
    *
    * `joinCond` relates the stream's columns to `dim`'s;
    * `dimAttr` is the dimension column to aggregate by.
    */
  def enrichedCounts(events: DataFrame, dim: DataFrame,
      joinCond: org.apache.spark.sql.Column, dimAttr: String,
      windowLen: String = "1 hour",
      watermark: String = "30 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .join(broadcast(dim), joinCond)
      .groupBy(window(col("ts"), windowLen), col(dimAttr))
      .agg(count(lit(1)).as("n"), sum("value").as("total_value"))
      .select(date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss")
          .as("window_start"),
        col(dimAttr), col("n"), col("total_value"))

  /** Gap-based session aggregation via the built-in session window
    * (streaming analog of q20_events_sessionize).
    */
  def sessionAggs(events: DataFrame, gap: String = "30 minutes",
      watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(col("user_id"), session_window(col("ts"), gap))
      .agg(count(lit(1)).as("n_events"), sum("value").as("total_value"))
      .select(col("user_id"),
        date_format(col("session_window.start"), "yyyy-MM-dd HH:mm:ss").as("session_start"),
        col("n_events"), col("total_value"))

  /** Stream-stream interval join (the remaining §2.10 inherited join
    * surface next to windows/state/dedup): attribute each purchase to the
    * clicks by the same user within `horizon` before it. Both sides carry
    * a watermark and the join has an event-time range bound, which is
    * exactly what lets Spark evict join state: a click older than
    * (watermark - horizon) can never match a future purchase, so state
    * stays bounded however long the streams run. Inner join → append-mode
    * emission, and because neither side's rows are dropped by the
    * watermark when data arrives in order, the completed stream equals the
    * batch interval join (the parity StreamingSpec pins, and the q93
    * oracle replays).
    */
  def attributedPurchases(events: DataFrame, horizon: String = "30 minutes",
      watermark: String = "2 hours"): DataFrame = {
    val clicks = events.where(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id").as("click_user"),
        col("ts").as("click_ts"))
      .withWatermark("click_ts", watermark)
    val purchases = events.where(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"),
        col("ts").as("purchase_ts"), col("value"))
      .withWatermark("purchase_ts", watermark)
    purchases.join(clicks,
      col("user_id") === col("click_user") &&
        col("click_ts") <= col("purchase_ts") &&
        col("click_ts") >= col("purchase_ts") - expr(s"INTERVAL $horizon"))
      .select(col("purchase_id"), col("click_id"), col("user_id"),
        (unix_micros(col("purchase_ts")) - unix_micros(col("click_ts")))
          .as("lag_us"),
        col("value"),
        // event time rides along so stateful operators can CHAIN: a
        // windowed aggregation downstream of this join reuses the
        // propagated watermark (multiple stateful operators, one query)
        col("purchase_ts"))
  }

  /** Streaming deduplication by event id, with state bounded by the
    * watermark (the streaming form of exact dedup for at-least-once
    * sources — duplicates arriving within the watermark horizon are
    * dropped, state for expired ids is evicted).
    */
  def dedupedEvents(events: DataFrame, watermark: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("event_id")

  /** Custom keyed state: running per-user totals via mapGroupsWithState —
    * the engine's arbitrary-stateful-processing surface
    * (`KeyValueGroupedDataset.mapGroupsWithState`).
    */
  def runningUserTotals(events: Dataset[Event]): Dataset[UserTotal] = {
    val s2 = events.sparkSession; import s2.implicits._
    events
      .groupByKey(_.user_id)
      .mapGroupsWithState[UserTotal, UserTotal](GroupStateTimeout.NoTimeout) {
        (user, batch, state: GroupState[UserTotal]) =>
          val prev = state.getOption.getOrElse(UserTotal(user, 0L, 0.0))
          val (n, v) = batch.foldLeft((prev.n_events, prev.total_value)) {
            case ((cn, cv), e) => (cn + 1, cv + e.value)
          }
          val next = UserTotal(user, n, v)
          state.update(next)
          next
      }
  }
}
