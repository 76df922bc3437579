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

  /** One Misra–Gries counter. */
  final case class MgEntry(v: String, n: Long)

  /** Mergeable Misra–Gries summary with `capacity` counters: classic
    * decrement-on-overflow per element; merges sum counters and, when
    * over capacity, subtract the (capacity+1)-th largest count from
    * every counter and drop non-positives (the Agarwal et al.
    * "Mergeable Summaries" reduction, which preserves the undercount
    * bound `true − kept ≤ n/(capacity+1)` under ARBITRARY merge trees).
    * So any value with true frequency > n/(capacity+1) is guaranteed to
    * survive — the superset property [[heavyHitters]] builds on.
    */
  private final class MisraGriesAgg(capacity: Int)
      extends org.apache.spark.sql.expressions.Aggregator[
        String, Map[String, Long], Seq[MgEntry]] {
    override def zero: Map[String, Long] = Map.empty
    override def reduce(b: Map[String, Long], v: String): Map[String, Long] =
      b.get(v) match {
        case Some(n) => b.updated(v, n + 1)
        case None if b.size < capacity => b.updated(v, 1L)
        case None => b.flatMap { case (k, n) =>
          if (n > 1) Some(k -> (n - 1)) else None }
      }
    override def merge(x: Map[String, Long],
        y: Map[String, Long]): Map[String, Long] = {
      val sum = y.foldLeft(x) { case (m, (k, n)) =>
        m.updated(k, m.getOrElse(k, 0L) + n) }
      if (sum.size <= capacity) sum
      else {
        val cut = sum.values.toIndexedSeq
          .sorted(Ordering[Long].reverse)(capacity)
        sum.flatMap { case (k, n) =>
          if (n > cut) Some(k -> (n - cut)) else None }
      }
    }
    override def finish(b: Map[String, Long]): Seq[MgEntry] =
      b.toSeq.map { case (k, n) => MgEntry(k, n) }
        .sortBy(e => (-e.n, e.v))
    override def bufferEncoder: org.apache.spark.sql.Encoder[Map[String, Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
    override def outputEncoder: org.apache.spark.sql.Encoder[Seq[MgEntry]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  }

  /** Exact φ-heavy hitters (values with frequency > φ·n) by
    * sketch-then-verify: a Misra–Gries pass with `⌈2/φ⌉` counters
    * produces a candidate set GUARANTEED to contain every true heavy
    * hitter (undercount ≤ n/(capacity+1) < φ·n), then an exact count of
    * only the candidates confirms and filters. Output is exact and
    * deterministic — (value, n) for every value with n > φ·total —
    * even though the sketch internals are merge-order-dependent.
    *
    * Why not one `groupBy(value).count()`: over an unbounded key domain
    * (URLs, user ids) at 100 TB that shuffles the ENTIRE key space to
    * find a handful of hot keys. Here the first pass moves only
    * capacity-bounded sketches (map-side combined like any partial agg),
    * and the second pass semi-joins against ≤ capacity broadcast
    * candidates BEFORE its aggregation — the shuffle carries candidate
    * keys only. The trailing threshold compares against a broadcast
    * 1-row total.
    */
  def heavyHitters(df: DataFrame, valueCol: String,
      phi: Double): DataFrame = {
    require(phi > 0 && phi < 1, s"phi=$phi must be in (0, 1)")
    val capacity = math.ceil(2.0 / phi).toInt
    val agg = org.apache.spark.sql.functions.udaf(
      new MisraGriesAgg(capacity),
      org.apache.spark.sql.Encoders.STRING)
    val vals = df.select(col(valueCol).cast("string").as("v"))
    val cand = vals.agg(agg(col("v")).as("cand"))
      .select(explode(col("cand")).as("e"))
      .select(col("e.v").as("v"))
    val total = vals.agg(count(lit(1)).as("total"))
    vals.join(broadcast(cand), Seq("v"), "left_semi")
      .groupBy("v").agg(count(lit(1)).as("n"))
      .crossJoin(broadcast(total))
      .where(col("n") > col("total") * phi)
      .select(col("v").as(valueCol), col("n"))
  }
}
