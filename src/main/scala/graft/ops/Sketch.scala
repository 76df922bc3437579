package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count-min sketch: sublinear frequency estimation for heavy-hitter
  * queries over unbounded key domains — the sketch is `depth × width`
  * cells regardless of corpus size, so at 100 TB it replaces a
  * full-domain groupBy (whose result may not fit anywhere) with ONE
  * shuffle of at most `depth × width` partial sums per partition.
  *
  * Estimates only ever OVERcount (collisions add, never subtract):
  * `est(k) = min over d of cell(d, h_d(k)) >= true(k)`, with the standard
  * (ε, δ) guarantees from width/depth. Hashes are md5-derived column
  * expressions — deterministic and replayable by the DuckDB oracle.
  */
object Sketch {

  /** Bucket of `c` in depth row `d`: the first 8 md5 hex digits of
    * "d:value" (32 bits) mod `width`.
    */
  def bucket(c: Column, d: Int, width: Int): Column =
    pmod(conv(substring(md5(concat(lit(s"$d:"), c)), 1, 8), 16, 10)
      .cast("long"), lit(width.toLong))

  private def cells(c: Column, depth: Int, width: Int): Column =
    explode(array((0 until depth).map(d =>
      struct(lit(d).as("depth"), bucket(c, d, width).as("bucket"))): _*))

  /** Build the sketch table (depth, bucket, cnt) in ONE pass: each row
    * contributes `depth` cell increments, map-side combined to at most
    * depth × width partial sums per task before the (tiny) shuffle.
    */
  def countMin(df: DataFrame, keyCol: String,
      depth: Int, width: Int): DataFrame =
    df.select(cells(col(keyCol), depth, width).as("c"))
      .groupBy(col("c.depth").as("depth"), col("c.bucket").as("bucket"))
      .agg(count(lit(1)).as("cnt"))

  /** Point estimates for every row of `keys`: min over the key's `depth`
    * cells. The sketch is broadcast (it is depth × width rows by
    * construction), so estimation is shuffle-free on the keys side.
    */
  def estimate(sketch: DataFrame, keys: DataFrame, keyCol: String,
      depth: Int, width: Int): DataFrame =
    keys.select(col(keyCol), cells(col(keyCol), depth, width).as("c"))
      .select(col(keyCol), col("c.depth").as("depth"),
        col("c.bucket").as("bucket"))
      .join(broadcast(sketch), Seq("depth", "bucket"), "left")
      .groupBy(keyCol)
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est"))

  /** Rolling distinct keys over trailing `windowLen` periods via
    * MERGEABLE DataSketches HLL: one sketch per period (ONE corpus-grain
    * aggregation — after it, raw keys never move again), then every
    * trailing window is a union of `windowLen` fixed-size sketches. This
    * is the 100 TB pattern for "rolling 7-day distinct users": the naive
    * form re-scans and re-shuffles every key for every window, while
    * sketch rollup pays period-grain × windowLen for ANY window length —
    * which is also why `approx_count_distinct` (HLL++ but finalized at
    * aggregation time) cannot express it.
    *
    * HLL register updates are max-operations, so the estimate is
    * deterministic for a given key SET regardless of order/partitioning.
    * Returns (period, approx) — validate against an exact count on a
    * bounded slice, as q142 does (the q63 self-validation discipline).
    */
  def rollingDistinct(df: DataFrame, periodCol: String, keyCol: String,
      windowLen: Int): DataFrame = {
    require(windowLen >= 1, s"windowLen=$windowLen must be >= 1")
    val perPeriod = df.groupBy(col(periodCol).as("period"))
      .agg(hll_sketch_agg(col(keyCol)).as("sk"))
    val anchors = perPeriod.select(col("period").as("_anchor"))
    perPeriod
      .join(anchors, col("period").between(
        col("_anchor") - (windowLen - 1), col("_anchor")))
      .groupBy(col("_anchor").as("period"))
      .agg(hll_sketch_estimate(hll_union_agg(col("sk")))
        .cast("long").as("approx"))
  }
}
