package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (temporal) join: for each left row, the latest right row of the
  * same key whose timestamp is <= the left row's.
  *
  * Spark has no native ASOF JOIN; the naive encoding is a range theta-join
  * (`l.key = r.key AND r.ts <= l.ts` + a max-per-left dedup), which
  * explodes to |matches| intermediate rows. This operator instead UNIONs
  * the two sides and takes a running `last(right_payload, ignoreNulls)`
  * over one (key, ts)-sorted window — ONE shuffle on the key, output
  * exactly |left| rows, no quadratic intermediate. The window frame is
  * rows-between-unbounded-preceding-and-current with right rows sorted
  * BEFORE left rows at equal timestamps, which is exactly the `<=`
  * semantics of e.g. DuckDB's ASOF JOIN (the oracle replays it natively).
  */
object AsOf {

  /** `left` and `right` must share `keyCol` and `tsCol`; `right`'s
    * `valueCols` are appended to every left row as `<prefix><col>` (null
    * when no right row precedes). Right rows should be unique per
    * (key, ts) — with duplicates, the greatest value wins
    * deterministically.
    *
    * `forward = true` flips the direction: each left row matches the
    * EARLIEST right row with `r.ts >= l.ts` (the "next quote after the
    * trade" / "next event after the checkpoint" form — DuckDB's
    * `ASOF JOIN ... ON l.ts <= r.ts`). Same union+window plan, the
    * traversal just runs in descending time; ties still match and
    * duplicate right rows still resolve to the greatest value.
    */
  def asofJoin(left: DataFrame, right: DataFrame, keyCol: String,
      tsCol: String, valueCols: Seq[String],
      prefix: String = "asof_", forward: Boolean = false): DataFrame = {
    val leftCols = left.columns.toSeq
    val payloadType =
      right.select((tsCol +: valueCols).map(col): _*).schema
    val l = left
      .withColumn("__side", lit(1))
      .withColumn("__payload", lit(null).cast(payloadType))
    val r = right
      .select((keyCol +: tsCol +: valueCols).map(col): _*)
      .withColumn("__side", lit(0))
      .withColumn("__payload", struct((tsCol +: valueCols).map(col): _*))
      .select(col(keyCol), col(tsCol), col("__side"), col("__payload"))
    val lAligned = l.select(
      (Seq(col(keyCol), col(tsCol), col("__side"), col("__payload")) ++
        leftCols.filterNot(c => c == keyCol || c == tsCol)
          .map(c => col(c))): _*)
    val rAligned = leftCols.filterNot(c => c == keyCol || c == tsCol)
      .foldLeft(r)((df, c) => df.withColumn(c, lit(null).cast(
        left.schema(c).dataType)))
      .select(lAligned.columns.toIndexedSeq.map(col): _*)
    // right rows order before left at the same (key, ts): ties count as <=;
    // among duplicate right (key, ts) rows the struct max (greatest value)
    // wins deterministically
    val w = Window.partitionBy(keyCol)
      .orderBy(if (forward) col(tsCol).desc else col(tsCol).asc,
        col("__side").asc, col("__payload").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    lAligned.unionByName(rAligned)
      .withColumn("__match", last(col("__payload"), ignoreNulls = true).over(w))
      .where(col("__side") === 1)
      .select((leftCols.map(col) ++
        (tsCol +: valueCols).map(c =>
          col(s"__match.$c").as(s"$prefix$c"))): _*)
  }

  /** Nearest-neighbor as-of join: each left row matches the right row of
    * the same key with the SMALLEST absolute time distance — backward
    * and forward candidates compared, ties (equidistant neighbors)
    * resolved to the backward (at-or-before) match, the causal-leaning
    * convention. The sensor-alignment / "closest quote to the trade"
    * form that neither direction alone expresses. Appends
    * `<prefix><tsCol>` and `<prefix><valueCols>` (null only when the
    * key has no right rows at all).
    *
    * Shape at 100 TB: exactly two [[asofJoin]] passes (union + ONE
    * key-partitioned window each — the second pass reuses the same
    * key partitioning) and a narrow CASE projection; never a range
    * theta-join.
    */
  def asofJoinNearest(left: DataFrame, right: DataFrame, keyCol: String,
      tsCol: String, valueCols: Seq[String],
      prefix: String = "near_"): DataFrame = {
    val both = asofJoin(
      asofJoin(left, right, keyCol, tsCol, valueCols, "__b_"),
      right, keyCol, tsCol, valueCols, "__f_", forward = true)
    val bTs = col(s"__b_$tsCol"); val fTs = col(s"__f_$tsCol")
    val useB = fTs.isNull ||
      (bTs.isNotNull && (col(tsCol) - bTs) <= (fTs - col(tsCol)))
    val out = (tsCol +: valueCols).map(c =>
      when(useB, col(s"__b_$c")).otherwise(col(s"__f_$c"))
        .as(s"$prefix$c"))
    both.select(left.columns.map(col).toIndexedSeq ++ out: _*)
  }

  /** Interval-overlap join: every (left interval, right interval) pair
    * of the same key with `lStart <= rEnd AND rStart <= lEnd` — session
    * × incident, exposure × outage, the interval×interval companion to
    * the point-in-interval [[rangeJoin]].
    *
    * Same binning idea: both sides explode onto a fixed time grid and
    * equi-join on (key, bin), with the exact overlap predicate
    * re-checked inside bins. A pair sharing several bins would emit
    * duplicates; instead of a `distinct` shuffle, each pair is emitted
    * ONLY in its first shared bin (`bin = max(start bins)` — a narrow
    * filter), so the join output is exact with no dedup pass. Pick
    * `binWidth` near the typical interval span; fan-out stays O(1)
    * per interval and every shuffle is hash-partitioned.
    */
  def intervalOverlapJoin(left: DataFrame, right: DataFrame,
      keyCol: String, lStart: String, lEnd: String, rStart: String,
      rEnd: String, binWidth: Long): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive: $binWidth")
    val l = left.where(col(lStart) <= col(lEnd))
      .withColumn("__bin", explode(sequence(
        floor(col(lStart) / binWidth), floor(col(lEnd) / binWidth))))
    val r = right.where(col(rStart) <= col(rEnd))
      .withColumn("__bin", explode(sequence(
        floor(col(rStart) / binWidth), floor(col(rEnd) / binWidth))))
    l.join(r, Seq(keyCol, "__bin"))
      .where(col(lStart) <= col(rEnd) && col(rStart) <= col(lEnd) &&
        col("__bin") === greatest(floor(col(lStart) / binWidth),
          floor(col(rStart) / binWidth)))
      .drop("__bin")
  }

  /** Range (interval) join: each point row joins every interval row of
    * the same key with `start <= ts <= end`.
    *
    * Spark plans the naive `BETWEEN` predicate as a broadcast
    * nested-loop/cartesian theta-join — |points| × |intervals| work per
    * key. Binning the time axis turns it into an EQUI-join: intervals
    * explode into the bins they cover (≤ span/binWidth + 1 rows each),
    * points map to one bin, the join shuffles on (key, bin), and the
    * exact predicate re-filters inside bins. Pick `binWidth` near the
    * typical interval span: fan-out stays O(1) per interval and every
    * shuffle is hash-partitioned — the shape that survives 100 TB.
    */
  def rangeJoin(points: DataFrame, intervals: DataFrame, keyCol: String,
      tsCol: String, startCol: String, endCol: String,
      binWidth: Long): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive: $binWidth")
    val p = points.withColumn("__bin", floor(col(tsCol) / binWidth))
    val iv = intervals
      .where(col(startCol) <= col(endCol))
      .withColumn("__bin", explode(sequence(
        floor(col(startCol) / binWidth), floor(col(endCol) / binWidth))))
    p.join(iv, Seq(keyCol, "__bin"))
      .where(col(tsCol).between(col(startCol), col(endCol)))
      .drop("__bin")
  }

  /** Gap-filled last-observation-carried-forward series: regularize an
    * irregular per-key event stream onto a fixed `stepUs` grid from each
    * key's first to last observed bucket, carrying the latest observed
    * value across empty buckets — the standard densification before
    * windowed feature extraction / model training on sensor, price, or
    * metric streams. Returns `(key, bkt, filled, observed)`; `filled` is
    * non-null from each key's first bucket with a non-null observation
    * onward (each key's grid starts at an observed bucket, so when
    * `valueCol` is never null that is bucket one — but see the caveat
    * below: a key whose FIRST bucket's winning row carries a null value
    * yields null `filled` until its first non-null observation).
    *
    * Within a bucket the "last" observation is the max by `orderCols`
    * (pass timestamp + tie-breaker id), reduced by a lexicographic
    * struct-max — an ordinary partial-aggregating `max`, no collect.
    * A null `valueCol` on the winning row reads as unobserved for that
    * bucket (`observed = 0`, carry continues) — filter nulls upstream
    * if they should claim their bucket.
    *
    * Shape at 100 TB: one (key, bucket) aggregation; the spine is a
    * narrow per-key `sequence` explode (rows = key's lifetime/step, the
    * output's own size — no cross join against a global calendar); one
    * equi-join back on (key, bucket); and the carry-forward is a single
    * running `last(ignoreNulls)` window on the key partitioning the join
    * already established.
    */
  def gapFillLocf(events: DataFrame, keyCol: String,
      orderCols: Seq[String], tsCol: String, valueCol: String,
      stepUs: Long): DataFrame = {
    require(stepUs > 0, s"stepUs=$stepUs must be > 0")
    require(orderCols.nonEmpty, "orderCols must be non-empty")
    val b = events.select(col(keyCol).as("key"),
      expr(s"CAST($tsCol AS BIGINT) DIV $stepUs").as("bkt"),
      struct((orderCols.map(col) :+ col(valueCol)): _*).as("__s"))
    val perBucket = b.groupBy("key", "bkt")
      .agg(max("__s").getField(valueCol).as("obs"))
    val spine = perBucket.groupBy("key")
      .agg(min("bkt").as("b0"), max("bkt").as("b1"))
      .select(col("key"), explode(sequence(col("b0"), col("b1"))).as("bkt"))
    val w = Window.partitionBy("key").orderBy("bkt")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    spine.join(perBucket, Seq("key", "bkt"), "left")
      .select(col("key"), col("bkt"),
        last(col("obs"), ignoreNulls = true).over(w).as("filled"),
        col("obs").isNotNull.cast("int").as("observed"))
  }

  /** Time-weighted average of an irregular last-observation-carried-
    * forward series over the window `[startUs, endUs)` — the TWAP a
    * plain `avg` gets WRONG on irregular observations (a price that
    * sat at 10 for six hours then ticked 5 times at 100 in a minute
    * time-weights to ≈10, not ≈85). Each observation holds from its
    * timestamp until the next one (duplicate-timestamp ties are
    * zero-length except the last, ordered by value), clipped to the
    * window; the LAST observation BEFORE the window provides the
    * opening value, clipped to start — plain segment arithmetic, no
    * special case. Returns per key: `n_obs` (observations contributing
    * time), `covered_us` (end − max(start, first observation)), and
    * `twa = Σ v·dt / Σ dt`.
    *
    * `valueCol` is cast to LONG (quantize floats first); v·dt products
    * accumulate in decimal(38,0), so the weighted sum is EXACT at any
    * magnitude and the single final divide is the only float — the
    * oracle replays it bit-for-bit (its BIGINT sums are exact hugeint).
    *
    * Shape at 100 TB: one key-partitioned `lead` window over events
    * already filtered to `ts < end` (partition pruning takes that to
    * the scan), one partial-agg shuffle to the key grain. No spine
    * materialization, no per-bucket explosion — contrast
    * [[gapFillLocf]], which trades exactly that for a regular grid.
    */
  def timeWeightedAvg(events: DataFrame, keyCol: String, tsCol: String,
      valueCol: String, startUs: Long, endUs: Long): DataFrame = {
    require(endUs > startUs, s"window [$startUs, $endUs) is empty")
    val b = events.select(col(keyCol).as("key"),
        col(tsCol).cast("long").as("ts"),
        col(valueCol).cast("long").as("v"))
      .where(col("ts") < endUs)
    val w = Window.partitionBy("key").orderBy("ts", "v")
    val seg = b.withColumn("nxt", lead("ts", 1).over(w))
      .withColumn("dt", greatest(
        least(coalesce(col("nxt"), lit(endUs)), lit(endUs)) -
          greatest(col("ts"), lit(startUs)), lit(0L)))
    seg.groupBy("key").agg(
        sum(when(col("dt") > 0, 1L).otherwise(0L)).as("n_obs"),
        sum("dt").as("covered_us"),
        (sum(col("v").cast("decimal(38,0)") * col("dt")).cast("double") /
          sum("dt")).as("twa"))
      .where(col("covered_us") > 0)
  }

  /** Union-length of possibly-overlapping `[start, end)` intervals per
    * key — "how much wall-clock was this machine actually busy", "how
    * long was the user in ANY session": overlaps counted once, the
    * measure utilization/SLA math needs where a naive `sum(end−start)`
    * double-counts. Returns per key: interval count, merged
    * `covered` duration, the overall `span` (max end − min start), and
    * `utilization = covered / span`. Zero/negative-length intervals
    * contribute nothing. All integer arithmetic except the one
    * utilization divide.
    *
    * The classic sweep, relationally: each interval becomes a `+1`
    * point at start and `−1` at end; within a key, time between a
    * point and the next is covered iff the running active count is
    * positive. Ties process starts before ends (tag order), which
    * cannot change the total — a zero-length segment adds zero.
    *
    * Shape at 100 TB: ONE key-partitioned sort window over 2 points
    * per interval (running sum + lead ride the same sort), then a
    * key-grain agg on the window's own partitioning — one exchange
    * total, the [[timeWeightedAvg]] contract.
    */
  def intervalCoverage(df: DataFrame, keyCol: String,
      startCol: String, endCol: String): DataFrame = {
    val iv = df.select(col(keyCol).as("key"),
        col(startCol).cast("long").as("s"),
        col(endCol).cast("long").as("e"))
      .where(col("s") < col("e"))
    val pts = iv.select(col("key"), col("s").as("t"),
        lit(0).as("tag"), lit(1L).as("delta"))
      .unionAll(iv.select(col("key"), col("e").as("t"),
        lit(1).as("tag"), lit(-1L).as("delta")))
    val w = Window.partitionBy("key").orderBy(col("t"), col("tag"))
    pts
      .withColumn("active", sum("delta").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("nxt", lead("t", 1).over(w))
      .groupBy("key")
      .agg(
        (sum(when(col("delta") > 0, 1L).otherwise(0L))).as("n_intervals"),
        sum(when(col("active") > 0 && col("nxt").isNotNull,
          col("nxt") - col("t")).otherwise(0L)).as("covered"),
        (max("t") - min("t")).as("span"))
      .withColumn("utilization",
        col("covered").cast("double") / col("span"))
  }
}
