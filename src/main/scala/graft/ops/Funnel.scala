package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequential (first-touch) funnel analysis: for an ordered list of
  * stages, each key's stage-k completion time is the FIRST event of that
  * stage at or after the key's stage-(k-1) completion — the standard
  * conversion-funnel semantics (signup → click → purchase).
  *
  * Shape at 100 TB: every stage is a `min(when(...))` window over the SAME
  * key partitioning, so Catalyst plans ONE shuffle and stacks the window
  * operators on it (spec-pinned); the final per-key collapse reuses that
  * partitioning too. No joins, no self-reads of the event log.
  */
object Funnel {

  /** Per-key first-completion times: one row per key, one
    * `t_<stage>` column per stage (null = the key never completed the
    * stage in order). `tsCol` must be a totally-ordered numeric/timestamp
    * column; ties at the same instant count as in-order (>=).
    */
  def stageTimes(events: DataFrame, keyCol: String, typeCol: String,
      tsCol: String, stages: Seq[String]): DataFrame = {
    require(stages.nonEmpty && stages.distinct == stages,
      s"stages must be non-empty and distinct: $stages")
    val w = Window.partitionBy(keyCol)
    val staged = stages.zipWithIndex.foldLeft(events) {
      case (df, (stage, i)) =>
        val inOrder = if (i == 0) lit(true)
          else col(s"__s${i - 1}").isNotNull &&
            col(tsCol) >= col(s"__s${i - 1}")
        df.withColumn(s"__s$i",
          min(when(col(typeCol) === stage && inOrder, col(tsCol))).over(w))
    }
    val aggs = stages.zipWithIndex.map { case (stage, i) =>
      min(s"__s$i").as(s"t_$stage")
    }
    staged.groupBy(keyCol).agg(aggs.head, aggs.tail: _*)
  }

  /** Cohort retention: keys are cohorted by the period of their FIRST
    * event (`floor(first_ts / periodUs)` — weeks for `periodUs` =
    * 604800000000), and each (cohort, period-offset) cell counts the
    * distinct keys active that many periods later. Pure integer FLOOR
    * division (`DIV` truncates toward zero, so negative timestamps get
    * the explicit correction), so any engine — Spark's `DIV`, DuckDB's
    * `//` — replays the cell boundaries exactly, pre-1970 events
    * included. Shape: one key-window shuffle (min stacks on the
    * partitioning) + one cell aggregation; `maxPeriods` bounds the
    * output, not the scan.
    */
  def cohortRetention(events: DataFrame, keyCol: String, tsCol: String,
      periodUs: Long, maxPeriods: Int): DataFrame = {
    require(periodUs > 0 && maxPeriods > 0,
      s"periodUs=$periodUs and maxPeriods=$maxPeriods must be positive")
    val w = Window.partitionBy(keyCol)
    events
      // floor division: truncate-toward-zero DIV, minus 1 when a negative
      // dividend leaves a remainder
      .withColumn("__p", expr(
        s"$tsCol DIV ${periodUs}L - " +
          s"(CASE WHEN $tsCol % ${periodUs}L < 0 THEN 1 ELSE 0 END)"))
      // floor is monotonic: min of period indexes == index of min ts
      .withColumn("__cohort", min(col("__p")).over(w))
      .withColumn("__off", (col("__p") - col("__cohort")).cast("int"))
      .where(col("__off") < maxPeriods)
      .groupBy(col("__cohort").as("cohort"), col("__off").as("period"))
      .agg(count_distinct(col(keyCol)).as("n_active"))
  }

  /** Funnel counts: one row per stage with the number of keys that
    * completed it in order, plus the conversion share relative to the
    * first stage (keys entering the funnel).
    */
  def counts(events: DataFrame, keyCol: String, typeCol: String,
      tsCol: String, stages: Seq[String]): DataFrame = {
    val times = stageTimes(events, keyCol, typeCol, tsCol, stages)
    val perStage = stages.zipWithIndex.map { case (stage, i) =>
      count(col(s"t_$stage")).as(s"n_$i")
    }
    val totals = times.agg(perStage.head, perStage.tail: _*)
    val rows = stages.zipWithIndex.map { case (stage, i) =>
      totals.select(lit(i).as("stage_idx"), lit(stage).as("stage"),
        col(s"n_$i").as("n_keys"),
        round(col(s"n_$i").cast("double") /
          greatest(col("n_0"), lit(1L)), 6).as("conversion"))
    }
    rows.reduce(_.unionByName(_))
  }

  /** Per-key ordered event sequences, capped at the FIRST `maxLen`
    * events: the assembly pass that turns a raw event log into
    * behavioral-sequence training examples (next-event prediction,
    * session modeling). Returns (key, seq: array of `valueCol`,
    * n_events = the key's TOTAL event count — so downstream can tell a
    * naturally-short sequence from a truncated one).
    *
    * `orderCols` must totally order events within a key (pass a
    * tie-breaking id after the timestamp); the cap is applied by a
    * per-key `row_number` window BEFORE collection, so per-key state in
    * the aggregation is bounded by `maxLen` — a hot key with 10^9 events
    * costs its window scan, never an unbounded in-memory list. The final
    * groupBy reuses the window's key partitioning: ONE shuffle total.
    */
  def eventSequences(events: DataFrame, keyCol: String,
      orderCols: Seq[String], valueCol: String, maxLen: Int): DataFrame = {
    require(maxLen >= 1, s"maxLen=$maxLen must be >= 1")
    val w = Window.partitionBy(keyCol)
      .orderBy(orderCols.map(col(_).asc): _*)
    events
      .withColumn("__rn", row_number().over(w))
      .withColumn("__n", count(lit(1)).over(Window.partitionBy(keyCol)))
      .where(col("__rn") <= maxLen)
      .groupBy(keyCol)
      .agg(expr(s"transform(array_sort(collect_list(struct(__rn, " +
        s"$valueCol AS v))), s -> s.v)").as("seq"),
        max("__n").as("n_events"))
  }

  /** First-order Markov transition statistics over per-key event streams:
    * for each ordered adjacent pair within a key, count (from_event,
    * to_event) and the conditional probability `p = n / Σ n(from_event)`
    * — the behavioral-model substrate (next-event prediction priors,
    * anomalous-flow detection, journey visualization).
    *
    * Shape at 100 TB: `lead` is ONE key-partitioned window shuffle over
    * the event log; the pair count is one aggregation whose cardinality is
    * |event types|² (tiny), so the normalizing window runs on an
    * already-collapsed relation. No joins, no self-reads.
    *
    * `orderCols` must totally order events within a key (timestamp plus a
    * tie-breaking id), or `lead` is nondeterministic.
    */
  def transitionMatrix(events: DataFrame, keyCol: String,
      orderCols: Seq[String], valueCol: String): DataFrame = {
    require(orderCols.nonEmpty, "orderCols must be non-empty")
    val w = Window.partitionBy(keyCol)
      .orderBy(orderCols.map(col(_).asc): _*)
    events
      .withColumn("__next", lead(col(valueCol), 1).over(w))
      .where(col("__next").isNotNull)
      .groupBy(col(valueCol).as("from_event"), col("__next").as("to_event"))
      .agg(count(lit(1)).as("n"))
      .withColumn("p",
        col("n").cast("double") /
          sum("n").over(Window.partitionBy("from_event")))
  }

  /** Earliest-chain event-pattern matching — the batch analog of CEP /
    * SQL `MATCH_RECOGNIZE` with a skip-till-next-match
    * `S1 (ANY)* S2 (ANY)* … Sk` pattern: per key, find the FIRST
    * occurrence chain of `stages` in event order (each stage strictly
    * after the previous stage's match) and emit each matched stage's
    * 1-based position `p1..pk` (null from the first unmatched stage on)
    * plus `matched` (1/0) and the key's total event count. Earliest-chain
    * semantics make the answer unique, so it is deterministic and
    * SQL-replayable; they also never miss: if ANY chain exists, the
    * earliest one exists (greedy exchange argument).
    *
    * Differs from [[stageTimes]] in reporting sequence POSITIONS under a
    * caller-supplied total order (timestamp + tie-breaker) with strict
    * progression — the shape sequence-mining wants — rather than
    * first-completion timestamps with >= ties.
    *
    * Shape at 100 TB: `row_number` plus one `min(when(...))` window per
    * stage, ALL over the same key partitioning — Catalyst plans ONE
    * shuffle and stacks the windows on it, and the final per-key collapse
    * reuses that partitioning. Per-key state is one counter per stage
    * (never a collected sequence), so a hot key with 10^9 events costs
    * its window scans, not memory.
    */
  def matchPattern(events: DataFrame, keyCol: String,
      orderCols: Seq[String], typeCol: String,
      stages: Seq[String]): DataFrame = {
    require(stages.nonEmpty, "stages must be non-empty")
    require(orderCols.nonEmpty, "orderCols must be non-empty")
    val wOrd = Window.partitionBy(keyCol)
      .orderBy(orderCols.map(col(_).asc): _*)
    val wKey = Window.partitionBy(keyCol)
    val numbered = events.withColumn("__rn", row_number().over(wOrd))
    val staged = stages.zipWithIndex.foldLeft(numbered) {
      case (df, (stage, i)) =>
        val after = if (i == 0) lit(true)
                    else col("__rn") > col(s"p$i")
        df.withColumn(s"p${i + 1}",
          min(when(col(typeCol) === stage && after, col("__rn"))).over(wKey))
    }
    val aggs = count(lit(1)).as("n_events") +:
      stages.indices.map(i => max(s"p${i + 1}").as(s"p${i + 1}"))
    staged.groupBy(col(keyCol).as("key"))
      .agg(aggs.head, aggs.tail: _*)
      .withColumn("matched",
        col(s"p${stages.size}").isNotNull.cast("int"))
  }

  /** FIRST-TOUCH windowed funnel — [[matchPattern]] with a per-hop time
    * constraint: the chain anchors at the key's EARLIEST stage-1 event,
    * and each later stage takes its earliest event strictly after the
    * previous match and within `maxGapUs` of it ("view, then click
    * within 10 minutes, then purchase within 10 minutes of the click").
    * Emits each matched stage's event time `t1..tk` (null from the
    * first failed hop) plus `matched`.
    *
    * Semantics note (deliberate): a later funnel RE-ENTRY does not
    * restart the chain — with time windows, greedy-earliest is no
    * longer equivalent to "exists any chain" (a failed first entrance
    * can mask a later successful one), so this operator implements the
    * standard strict first-entrance conversion metric and says so,
    * rather than approximating exists-any. For unconstrained chains
    * [[matchPattern]]'s greedy IS exact; for re-entry semantics run
    * per-entrance (filter events at or after each anchor).
    *
    * Same shape as [[matchPattern]]: one `min(when)` window per stage
    * on ONE key partitioning, counter-sized state, no collected
    * sequences, no joins.
    */
  /** Session-level co-occurrence PMI between event types: sessionize
    * each key's stream by `gapUs`, collapse to distinct
    * (session, type) incidences, and score each type pair by pointwise
    * mutual information `ln(n_xy · S / (n_x · n_y))` over sessions —
    * which behaviors travel together within a visit (PMI > 0) and
    * which repel (PMI < 0). The engine's association-measure DNA
    * (SURVEY §2 A4 — the reference scores word pairs by exactly this
    * family) applied to behavioral streams. Returns
    * `(type_l, type_r, n_xy, pmi)` with `type_l < type_r`.
    *
    * Shape at 100 TB: one key-partitioned lag+cumsum window pair to
    * assign session ids (q143's island construction), one distinct to
    * the (session, type) grain, then the pair expansion self-joins ON
    * THE SESSION KEY — cost Σ_session (types/session)², bounded by the
    * distinct-type count per session (≤ the type vocabulary), never by
    * corpus size ([[graft.ops.Graph.coCitation]]'s contract). Counts
    * are exact integers; the single `ln` per pair replays bit-for-bit.
    */
  def sessionCooccurrence(events: DataFrame, keyCol: String,
      idCol: String, tsCol: String, typeCol: String,
      gapUs: Long): DataFrame = {
    require(gapUs > 0, s"gapUs=$gapUs must be > 0")
    val ts = col(tsCol).cast("long")
    val wOrd = Window.partitionBy(keyCol).orderBy(ts.asc, col(idCol).asc)
    val wCum = wOrd.rowsBetween(Window.unboundedPreceding,
      Window.currentRow)
    val st = events
      .withColumn("__new", when(
        ts - lag(ts, 1).over(wOrd) > gapUs, 1).otherwise(0))
      .withColumn("__sid", sum("__new").over(wCum))
      .select(col(keyCol).as("key"), col("__sid"),
        col(typeCol).as("t"))
      .distinct()
    val nSessions = st.select("key", "__sid").distinct()
      .agg(count(lit(1)).as("s"))
    val nX = st.groupBy("t").agg(count(lit(1)).as("n"))
    st.as("a").join(st.as("b"), Seq("key", "__sid"))
      .where(col("a.t") < col("b.t"))
      .groupBy(col("a.t").as("type_l"), col("b.t").as("type_r"))
      .agg(count(lit(1)).as("n_xy"))
      .join(broadcast(nX.select(col("t").as("type_l"),
        col("n").as("n_l"))), "type_l")
      .join(broadcast(nX.select(col("t").as("type_r"),
        col("n").as("n_r"))), "type_r")
      .crossJoin(broadcast(nSessions))
      .select(col("type_l"), col("type_r"), col("n_xy"),
        log((col("n_xy") * col("s")).cast("double") /
          (col("n_l") * col("n_r"))).as("pmi"))
  }

  /** Position-based (U-shaped) multi-touch attribution: each conversion
    * event (`convType`) distributes its value across the same-key touch
    * events (`touchType`) in the `horizonUs` window before it — the
    * standard upgrade from last-touch credit, and the event-log shape
    * of "which acquisition channels actually drive revenue". Credit
    * rule (the industry-standard U): one touch takes everything; two
    * touches split `firstW : lastW` normalized; three or more give the
    * first touch `firstW`, the last `lastW`, and the middle touches an
    * equal share of the remainder. Credits per conversion sum to 1
    * exactly (closed-form, no iterative normalization).
    *
    * Returns one row per (conversion, touch):
    * `(conv_id, touch_id, key, position, n_touches, credit,
    * attributed)`. Conversions with NO touch in the horizon are absent
    * — q188's left-outer stream shape is the streaming way to surface
    * them; in batch, anti-join against this result.
    *
    * Shape at 100 TB: ONE equi-join on the key with the time bound as
    * a join-level filter (never a theta-only join), then position
    * rank + touch count as two functions over ONE (conv)-partitioned
    * window — cost is the matched pair count, the output's own size.
    * Ties (same-microsecond touches) rank by touch id, so credits are
    * deterministic on any engine.
    */
  def multiTouchAttribution(events: DataFrame, keyCol: String,
      idCol: String, tsCol: String, typeCol: String, valueCol: String,
      convType: String, touchType: String, horizonUs: Long,
      firstW: Double = 0.4, lastW: Double = 0.4): DataFrame = {
    require(horizonUs > 0, s"horizonUs=$horizonUs must be > 0")
    require(firstW > 0 && lastW > 0 && firstW + lastW <= 1.0,
      s"weights firstW=$firstW lastW=$lastW must be positive and sum <= 1")
    val ts = col(tsCol).cast("long")
    val conv = events.where(col(typeCol) === convType)
      .select(col(idCol).as("conv_id"), col(keyCol).as("key"),
        ts.as("conv_ts"), col(valueCol).cast("double").as("conv_value"))
    val touch = events.where(col(typeCol) === touchType)
      .select(col(idCol).as("touch_id"), col(keyCol).as("key"),
        ts.as("touch_ts"))
    val joined = conv.join(touch, Seq("key"))
      .where(col("touch_ts") <= col("conv_ts") &&
        col("touch_ts") >= col("conv_ts") - horizonUs)
    val w = Window.partitionBy("conv_id")
    val wOrd = w.orderBy(col("touch_ts").asc, col("touch_id").asc)
    val ranked = joined
      .withColumn("position", row_number().over(wOrd))
      .withColumn("n_touches", count(lit(1)).over(w))
    val credit = when(col("n_touches") === 1, lit(1.0))
      .when(col("n_touches") === 2,
        when(col("position") === 1, lit(firstW / (firstW + lastW)))
          .otherwise(lit(lastW / (firstW + lastW))))
      .otherwise(
        when(col("position") === 1, lit(firstW))
          .when(col("position") === col("n_touches"), lit(lastW))
          .otherwise(lit(1.0 - firstW - lastW) /
            (col("n_touches") - 2)))
    ranked
      .withColumn("credit", credit)
      .select(col("conv_id"), col("touch_id"), col("key"),
        col("position"), col("n_touches"), col("credit"),
        (col("credit") * col("conv_value")).as("attributed"))
  }

  def matchPatternWithin(events: DataFrame, keyCol: String,
      tsCol: String, typeCol: String, stages: Seq[String],
      maxGapUs: Long): DataFrame = {
    require(stages.nonEmpty, "stages must be non-empty")
    require(maxGapUs > 0, s"maxGapUs=$maxGapUs must be > 0")
    val wKey = Window.partitionBy(keyCol)
    val ts = col(tsCol).cast("long")
    val staged = stages.zipWithIndex.foldLeft(events) {
      case (df, (stage, i)) =>
        val ok = if (i == 0) col(typeCol) === stage
                 else col(typeCol) === stage &&
                   ts > col(s"t$i") && ts <= col(s"t$i") + maxGapUs
        df.withColumn(s"t${i + 1}", min(when(ok, ts)).over(wKey))
    }
    val aggs = count(lit(1)).as("n_events") +:
      stages.indices.map(i => max(s"t${i + 1}").as(s"t${i + 1}"))
    staged.groupBy(col(keyCol).as("key"))
      .agg(aggs.head, aggs.tail: _*)
      .withColumn("matched",
        col(s"t${stages.size}").isNotNull.cast("int"))
  }
}
