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

  /** EXACT distinct users per tumbling window, streaming — TWO chained
    * stateful aggregations in one query (Spark's multiple-stateful-
    * operator support): the inner agg deduplicates to the
    * (window, user) grain and emits each pair once when the watermark
    * closes its window; the outer agg counts those pairs per window.
    * This is the shape `approx_count_distinct` can't replace when the
    * answer must be exact, and a single agg can't express at all in
    * append mode (COUNT(DISTINCT) is unsupported in streaming).
    *
    * State cost: the inner store holds one entry per LIVE
    * (window, user) — bounded by the watermark horizon × active users,
    * the same bound windowed dedup pays — and the outer holds one
    * counter per live window. Emission cutoff is q65's: a window
    * reports iff the final watermark passed its end; the pair rows the
    * inner agg emits carry the window itself as event time, so the
    * outer agg closes the same windows in the following micro-batch.
    */
  def windowedDistinctUsers(events: DataFrame,
      windowLen: String = "1 hour",
      watermark: String = "30 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .groupBy(col("window"))
      .agg(count(lit(1)).as("distinct_users"),
        sum("n_events").as("n_events"))
      .select(date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss")
          .as("window_start"),
        col("distinct_users"), col("n_events"))

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
      watermark: String = "2 hours", joinType: String = "inner"): DataFrame = {
    require(Set("inner", "left_outer", "full_outer")(joinType),
      s"joinType=$joinType must be inner, left_outer or full_outer")
    val clicks = events.where(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id").as("click_user"),
        col("ts").as("click_ts"))
      .withWatermark("click_ts", watermark)
    val purchases = events.where(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"),
        col("ts").as("purchase_ts"), col("value"))
      .withWatermark("purchase_ts", watermark)
    // LEFT OUTER: matches emit as they form (exactly the inner results);
    // a purchase that saw NO same-user click in its horizon emits ONCE
    // with NULL click columns after the global watermark passes its
    // purchase_ts — the condition bounds clicks at or BEFORE the
    // purchase, so once no click older than purchase_ts can arrive the
    // row is unmatchable, evicted, and emitted null-padded. (Two facts
    // a caller must know, both pinned by the q188 oracle: the global
    // watermark is the MIN over the two branch watermarks, each
    // computed from its own FILTERED event subset; and the outer delay
    // would additionally include the condition's time range on a join
    // shape that waits for LATER events, which this one does not.)
    // This is the
    // attribution shape real pipelines need ("purchases with no
    // preceding click") and it costs NOTHING over the inner join: same
    // state stores, same eviction bound — the unmatched rows were being
    // tracked (and dropped) anyway.
    // FULL OUTER additionally emits each unmatched CLICK once,
    // null-padded on the purchase side — both abandonment directions in
    // ONE query, still the same state stores. The click side is the
    // shape that waits for LATER events (a purchase up to `horizon`
    // after the click could still match), so its null rows pay the
    // condition's time range on top of the watermark delay: a click
    // emits null-padded only once the global watermark passes
    // (click_ts + horizon), exactly [[clickOutcomes]]'s left-outer
    // cutoff. The purchase side keeps q188's cheaper cutoff
    // (watermark past purchase_ts itself). The q218 oracle pins both
    // cutoffs in one result; user_id coalesces across sides so the
    // unmatched-click rows still carry their user.
    purchases.join(clicks,
      col("user_id") === col("click_user") &&
        col("click_ts") <= col("purchase_ts") &&
        col("click_ts") >= col("purchase_ts") - expr(s"INTERVAL $horizon"),
      joinType)
      .select(col("purchase_id"), col("click_id"),
        coalesce(col("user_id"), col("click_user")).as("user_id"),
        (unix_micros(col("purchase_ts")) - unix_micros(col("click_ts")))
          .as("lag_us"),
        col("value"),
        // event time rides along so stateful operators can CHAIN: a
        // windowed aggregation downstream of this join reuses the
        // propagated watermark (multiple stateful operators, one query)
        col("purchase_ts"))
  }

  /** REVERSE attribution: each click joined to the same-user purchases
    * within `horizon` AFTER it — with `joinType = "left_outer"`, the
    * abandonment/churn query every attribution pipeline runs next to
    * [[attributedPurchases]]: "clicks with NO subsequent purchase"
    * emit once, null-padded, when they become unmatchable.
    *
    * This is the join shape whose outer side waits for LATER events,
    * and it exercises the watermark rule [[attributedPurchases]] only
    * documents: a click is unmatchable only once the global watermark
    * passes `click_ts + horizon` (a purchase up to `horizon` later
    * could still match), so the null-row emission delay is the
    * watermark delay PLUS the condition's time range. Consequently the
    * trailing `horizon` of clicks before the final watermark emits
    * nothing outer-side even when unmatched — the StreamingSpec
    * withholding fixture and the q214 oracle both pin that cutoff
    * (`click_ts + horizon < watermark`, at Spark's millisecond
    * watermark grain). Matches themselves emit as they form, exactly
    * the inner results, and the state-store bound is the same as the
    * forward join's: each side keeps only rows a future partner could
    * still reach.
    */
  def clickOutcomes(events: DataFrame, horizon: String = "30 minutes",
      watermark: String = "2 hours", joinType: String = "inner"): DataFrame = {
    require(Set("inner", "left_outer")(joinType),
      s"joinType=$joinType must be inner or left_outer")
    val clicks = events.where(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id"),
        col("ts").as("click_ts"))
      .withWatermark("click_ts", watermark)
    val purchases = events.where(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"),
        col("user_id").as("purchase_user"), col("ts").as("purchase_ts"),
        col("value"))
      .withWatermark("purchase_ts", watermark)
    clicks.join(purchases,
      col("user_id") === col("purchase_user") &&
        col("purchase_ts") >= col("click_ts") &&
        col("purchase_ts") <= col("click_ts") + expr(s"INTERVAL $horizon"),
      joinType)
      .select(col("click_id"), col("purchase_id"), col("user_id"),
        (unix_micros(col("purchase_ts")) - unix_micros(col("click_ts")))
          .as("lead_us"),
        col("value"),
        col("click_ts"))
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

  final case class SessionOut(user_id: Long, start_us: Long,
      n_events: Long, total_value: Double)

  /** One open-or-matured session in [[SessionState]]: event-time bounds
    * in exact microseconds plus the running aggregates.
    */
  final case class Sess(start_us: Long, last_us: Long, n: Long, total: Double)

  final case class SessionState(sessions: List[Sess])

  /** Gap-based sessionization via `flatMapGroupsWithState` with
    * `GroupStateTimeout.EventTimeTimeout` — the arbitrary-stateful
    * analog of [[sessionAggs]], and the state-BOUNDEDNESS shape
    * [[runningUserTotals]] does not exercise: a key that goes idle is
    * EVICTED (its final sessions emitted, its state removed) once the
    * watermark passes its last session's end, so state never grows with
    * the number of keys ever seen — only with the keys active inside
    * the watermark horizon. That is the standard production contract
    * for abandoned-key cleanup (cart abandonment, device churn).
    *
    * Semantics match the built-in session window exactly on every
    * stream with no SUB-WATERMARK arrivals (the q143 oracle replays
    * both, and a StreamingSpec ScalaCheck property fuzzes the
    * equivalence over random streams and chunk boundaries): events
    * within `gapUs` (inclusive — islands split only on
    * strictly-greater-than-gap silences) merge; a session emits once
    * the watermark passes its end (`last_us + gapUs`). The one
    * divergence zone — found by that fuzz — is Spark's own
    * operator-level inconsistency, not this implementation's: for an
    * event arriving with `ts < watermark`, `flatMapGroupsWithState`
    * drops the input row outright (its late-row predicate is on EVENT
    * time), while the built-in session window filters on the tentative
    * window END (`ts + gap`) and therefore still admits arrivals in
    * `(wm − gap, wm)`. Streams whose arrivals never trail the
    * watermark — every in-order source, and any source within its
    * declared lateness budget — see identical output from both.
    * Emission is decided against `GroupState.getCurrentWatermarkMs`
    * (Spark's watermark is millisecond-grain), so the timeout is set to
    * `(end_us - 1) / 1000`, which fires exactly when
    * `end_us <= watermarkMs * 1000` first holds.
    *
    * Shape at 100 TB: one shuffle on the key; state per key is the open
    * session list (matured sessions leave state the batch the watermark
    * passes them), and idle keys are torn down by the timeout — bounded
    * state, however long the stream runs.
    */
  def sessionsWithTimeout(events: Dataset[Event],
      gapUs: Long = 30L * 60 * 1000000,
      watermark: String = "30 minutes"): Dataset[SessionOut] = {
    val s2 = events.sparkSession; import s2.implicits._
    def micros(ts: java.sql.Timestamp): Long =
      Math.floorDiv(ts.getTime, 1000L) * 1000000L + ts.getNanos / 1000
    events
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user, batch, state: GroupState[SessionState]) =>
          val prev = state.getOption.map(_.sessions).getOrElse(Nil)
          // merge the batch into the session list by interval coalescing:
          // each event is a unit session; the union sweeps in start order
          // and fuses neighbors within the gap (aggregates are additive,
          // so fusing two multi-event sessions is exact). This handles
          // late-but-within-watermark events landing BETWEEN or BEFORE
          // open sessions — including one event bridging two previously
          // separate sessions — exactly like the built-in session window.
          // unit sessions sorted by (ts, event_id) so equal-timestamp
          // events fold in a deterministic order (stable sort keeps it
          // through the sweep — float sums must not depend on iterator
          // order)
          val units = batch.toSeq.sortBy(e => (micros(e.ts), e.event_id))
            .map(e => Sess(micros(e.ts), micros(e.ts), 1L, e.value))
          val merged = (prev ++ units).sortBy(s => (s.start_us, s.last_us))
            .foldLeft(List.empty[Sess]) { (acc, sess) =>
              acc match {
                case h :: t if sess.start_us - h.last_us <= gapUs =>
                  Sess(h.start_us, Math.max(h.last_us, sess.last_us),
                    h.n + sess.n, h.total + sess.total) :: t
                case _ => sess :: acc
              }
            }.reverse
          val wmUs = state.getCurrentWatermarkMs() * 1000L
          // a session is FINAL once the watermark passes its end: no
          // event can extend it (extension requires ts <= end, and the
          // watermark guarantees ts > wm >= end for all future events)
          val (matured, open) =
            merged.partition(sess => sess.last_us + gapUs <= wmUs)
          if (open.isEmpty) state.remove()
          else {
            state.update(SessionState(open))
            val earliestEndUs = open.map(_.last_us + gapUs).min
            state.setTimeoutTimestamp(Math.max((earliestEndUs - 1) / 1000,
              state.getCurrentWatermarkMs() + 1))
          }
          matured.iterator
            .map(sess => SessionOut(user, sess.start_us, sess.n, sess.total))
      }
  }

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

  final case class FunnelState(t1: Long, pend: List[(Int, Long)])
  final case class FunnelOut(user_id: Long, t1_us: Long, n_stages: Int,
      t_last_us: Long)

  /** Streaming WINDOWED funnel: for each user, the earliest stage-1
    * event opens a `horizonUs` window, and each later stage completes
    * at its earliest event with `t_{i-1} <= ts <= t1 + horizon` — the
    * q180 windowed-funnel semantics maintained incrementally over an
    * unbounded stream. Emits ONE append-mode row per user with a
    * stage-1 event, exactly when the watermark passes `t1 + horizon`:
    * at that point no admissible event can still arrive (anything new
    * has `ts > wm >= t1 + horizon`, outside the window, and `> t1`, so
    * it cannot reopen an earlier window) — the emission is final by
    * the watermark contract, never revised.
    *
    * Out-of-order correctness: later-stage events that arrive BEFORE
    * their stage-1 opener are retained, but only while they could
    * still matter — a pending (stage, ts) survives iff `ts >= t1c`
    * (admissible under the current opener) OR `ts > wm` (admissible
    * under a yet-unseen earlier opener, which must carry `ts > wm`).
    * Everything else prunes, so state per key is the single opener
    * timestamp plus the pending events inside the watermark horizon —
    * bounded, however long the stream runs. Users who never produce a
    * stage-1 event drain to empty state and evict via the event-time
    * timeout.
    *
    * One funnel per user, matching the batch oracle's global-MIN
    * opener: after a user's row emits, an O(1) tombstone survives in
    * state so a LATER view cannot open a second funnel and emit a
    * second (oracle-divergent) row — the [[runningUserTotals]]
    * per-key-forever state class, 16 bytes per converted user.
    */
  def funnelWithin(events: Dataset[Event], stages: Seq[String],
      horizonUs: Long = 30L * 60 * 1000000,
      watermark: String = "30 minutes"): Dataset[FunnelOut] = {
    require(stages.size >= 2 && stages.distinct == stages,
      s"stages must be >= 2 distinct names: $stages")
    require(horizonUs > 0, s"horizonUs=$horizonUs must be positive")
    val s2 = events.sparkSession; import s2.implicits._
    val idx = stages.zipWithIndex.toMap
    def micros(ts: java.sql.Timestamp): Long =
      Math.floorDiv(ts.getTime, 1000L) * 1000000L + ts.getNanos / 1000
    events
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[FunnelState, FunnelOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user, batch, state: GroupState[FunnelState]) =>
          val prev = state.getOption.getOrElse(FunnelState(-1L, Nil))
          if (prev.t1 == -2L) {
            // tombstone: this user's funnel already emitted
            Iterator.empty
          } else {
            var t1 = prev.t1
            var pend = prev.pend
            batch.foreach { e =>
              idx.get(e.event_type).foreach { i =>
                val us = micros(e.ts)
                if (i == 0) { if (t1 < 0 || us < t1) t1 = us }
                else pend = (i, us) :: pend
              }
            }
            val wmUs = state.getCurrentWatermarkMs() * 1000L
            pend = pend.filter { case (_, us) =>
              (t1 >= 0 && us >= t1) || us > wmUs
            }
            if (t1 >= 0 && wmUs >= t1 + horizonUs) {
              // window closed: chain the earliest admissible stage
              // times, then tombstone (NOT remove - a later opener
              // must not start a second, oracle-divergent funnel)
              state.update(FunnelState(-2L, Nil))
              var bound = t1
              var last = t1
              var n = 1
              var i = 1
              var go = true
              while (go && i < stages.size) {
                val cand = pend.collect {
                  case (s, us) if s == i && us >= bound &&
                    us <= t1 + horizonUs => us
                }
                if (cand.isEmpty) go = false
                else { bound = cand.min; last = bound; n += 1; i += 1 }
              }
              Iterator.single(FunnelOut(user, t1, n, last))
            } else if (t1 < 0 && pend.isEmpty) {
              state.remove()
              Iterator.empty
            } else {
              state.update(FunnelState(t1, pend))
              // wake a hair BEFORE the close (timeouts fire on wm
              // STRICTLY past the stamp): each firing either emits or
              // re-arms at wm+1, so the first watermark at or past
              // t1 + horizon is never missed even on an exact-boundary
              // final watermark
              val wakeMs =
                if (t1 >= 0) (t1 + horizonUs) / 1000 - 1
                else pend.map(_._2).max / 1000
              state.setTimeoutTimestamp(Math.max(wakeMs,
                state.getCurrentWatermarkMs() + 1))
              Iterator.empty
            }
          }
      }
  }

  final case class WorCand(key: Long, id: Long)
  final case class WorState(n_seen: Long, top: List[WorCand])
  final case class WorSample(event_type: String, n_seen: Long,
      ids: Seq[Long], keys: Seq[Long])

  /** Streaming twin of [[graft.ops.Sampling.weightedSampleWOR]]: an
    * exact-size weighted sample WITHOUT replacement per key, maintained
    * over an unbounded stream — "always hold the 10k most
    * representative events per type, long-value events favored",
    * without re-reading history. Efraimidis–Spirakis keys make this
    * possible: each event's `round(ln(u)/w·1e12)` key is a pure
    * function of the event itself, and keeping the k best keys is an
    * associative, commutative fold — so the state after ANY prefix of
    * the stream, under ANY micro-batching, equals the batch
    * `weightedSampleWOR` selection over the same events (stream/batch
    * equivalence by construction, pinned in StreamingSpec).
    *
    * State per key: the k (key, id) pairs + one counter — O(k),
    * independent of stream length; no watermark needed (the sample is
    * over ALL history by definition). Emits the current selection
    * each batch (update mode); the latest emission per key (largest
    * `n_seen` — monotone) is the answer.
    */
  def weightedSampleTopK(events: DataFrame, k: Int): Dataset[WorSample] = {
    require(k > 0, s"k=$k must be positive")
    val s2 = events.sparkSession; import s2.implicits._
    val scored = events
      .where(col("value") > 0)
      .withColumn("u", graft.ops.Sampling.hashUnit(
        col("event_id").cast("string"), "wor:") + lit(0.5 / 65536))
      .select(col("event_type"),
        // same explicit −4.6e18 clamp as the batch twin: tiny weights
        // collapse to one bottom tie bucket instead of overflowing the
        // long cast differently per engine
        round(greatest(log(col("u")) / col("value") * 1e12,
          lit(-4.6e18)), 0).cast("long").as("key"),
        col("event_id").as("id"))
      .as[(String, Long, Long)]
    scored.groupByKey(_._1)
      .mapGroupsWithState[WorState, WorSample](GroupStateTimeout.NoTimeout) {
        (grp, batch, state: GroupState[WorState]) =>
          def better(a: WorCand, b: WorCand): Boolean =
            a.key > b.key || (a.key == b.key && a.id < b.id)
          var st = state.getOption.getOrElse(WorState(0L, Nil))
          batch.foreach { case (_, key, id) =>
            val c = WorCand(key, id)
            val buf = st.top
            val nb =
              if (buf.size >= k && !better(c, buf.last)) buf
              else {
                val (pre, post) = buf.span(better(_, c))
                ((pre :+ c) ++ post.take(k - pre.size - 1)).toList
              }
            st = WorState(st.n_seen + 1, nb)
          }
          state.update(st)
          WorSample(grp, st.n_seen, st.top.map(_.id), st.top.map(_.key))
      }
  }
}
