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

  /** Deterministic HyperLogLog registers (Flajolet et al. 2007) from
    * md5 — unlike [[rollingDistinct]]'s DataSketches HLL (opaque
    * internals, validated against exact counts in a tolerance band),
    * every bit here is plan arithmetic a SQL engine replays, so the
    * ESTIMATE ITSELF hash-verifies. `logBuckets` must be a multiple of
    * 4 (nibble-aligned bucket split; m = 2^logBuckets buckets): the
    * bucket is the hash's first `logBuckets` bits, the rank is the
    * 1-based position of the first 1-bit in the NEXT 64 bits (65 if
    * all zero), computed by stripping leading '0' hex chars — no float,
    * no UDF. Registers are `max(rank)` per (group, bucket): idempotent
    * under duplicates (no pre-distinct needed) and mergeable by `max`.
    *
    * Shape at 100 TB: ONE partial-agg shuffle to the (group, bucket)
    * grain — max combines map-side, so at most |groups|·m rows move.
    */
  def hllRegisters(df: DataFrame, groupCol: String, keyCol: String,
      logBuckets: Int): DataFrame = {
    require(logBuckets >= 4 && logBuckets <= 16 && logBuckets % 4 == 0,
      s"logBuckets=$logBuckets must be one of 4, 8, 12, 16")
    val h = md5(concat(lit("hll:"), col(keyCol).cast("string")))
    val rest = substring(h, logBuckets / 4 + 1, 16)
    val stripped = regexp_replace(rest, "^0+", "")
    val firstNib = substring(stripped, 1, 1)
    val bits = when(firstNib === "1", 3)
      .when(firstNib.isin("2", "3"), 2)
      .when(firstNib.isin("4", "5", "6", "7"), 1).otherwise(0)
    val rank = when(length(stripped) === 0, lit(65)).otherwise(
      (lit(16) - length(stripped)) * 4 + bits + 1)
    df.select(col(groupCol).as("group"),
        conv(substring(h, 1, logBuckets / 4), 16, 10).cast("long")
          .as("bucket"),
        rank.as("rank"))
      .groupBy("group", "bucket").agg(max("rank").as("reg"))
  }

  /** HLL estimate from a [[hllRegisters]] relation (any (group, bucket,
    * reg) rows — including ones merged across periods by `max`). The
    * harmonic denominator is EXACT: Σ 2^(65−reg) accumulates as
    * decimal(38,0) integers (empty buckets contribute 2^65), so
    * summation order cannot move a bit; the only floats are the final
    * fixed-shape expression and the small-range linear-counting branch
    * (`m·ln(m/V)` when `E ≤ 2.5m` and empty buckets exist — standard
    * HLL, NOT HLL++ bias tables, which is why this coexists with
    * `approx_count_distinct` rather than replacing it).
    */
  def hllEstimate(registers: DataFrame, logBuckets: Int): DataFrame = {
    val m = 1L << logBuckets
    val alpha = 0.7213 / (1.0 + 1.079 / m)
    val two65 = new java.math.BigDecimal(
      java.math.BigInteger.ONE.shiftLeft(65))
    registers.groupBy("group")
      .agg(count(lit(1)).as("present"),
        sum(pow(lit(2.0), lit(65) - col("reg")).cast("decimal(38,0)"))
          .as("s"))
      .withColumn("denom", col("s").cast("double") +
        (lit(m) - col("present")).cast("double") * lit(two65.doubleValue))
      .withColumn("e_raw",
        lit(alpha * m * m) * lit(two65.doubleValue) / col("denom"))
      .withColumn("v_empty", lit(m) - col("present"))
      .select(col("group"), col("present"),
        when(col("e_raw") <= lit(2.5 * m) && col("v_empty") > 0,
          lit(m.toDouble) * log(lit(m.toDouble) / col("v_empty")))
          .otherwise(col("e_raw")).as("estimate"))
  }

  /** Group-wise approximate distinct with an exactly-replayable answer:
    * [[hllRegisters]] + [[hllEstimate]] in one call.
    */
  def hllDistinct(df: DataFrame, groupCol: String, keyCol: String,
      logBuckets: Int = 8): DataFrame =
    hllEstimate(hllRegisters(df, groupCol, keyCol, logBuckets),
      logBuckets)

  /** Rolling trailing-window distinct from deterministic HLL: one
    * register relation at the (period, bucket) grain, then every
    * trailing window is a `max`-merge of `windowLen` periods'
    * registers — [[rollingDistinct]]'s 100 TB pattern (raw keys shuffle
    * ONCE, windows reuse fixed-size sketches) with a hash-verifiable
    * estimate instead of a banded one.
    */
  def hllRolling(df: DataFrame, periodCol: String, keyCol: String,
      windowLen: Int, logBuckets: Int = 8): DataFrame = {
    require(windowLen >= 1, s"windowLen=$windowLen must be >= 1")
    val regs = hllRegisters(df, periodCol, keyCol, logBuckets)
    val anchors = regs.select(col("group").as("_anchor")).distinct()
    val merged = regs
      .join(anchors, col("group").between(
        col("_anchor") - (windowLen - 1), col("_anchor")))
      .groupBy(col("_anchor"), col("bucket"))
      .agg(max("reg").as("reg"))
      .select(col("_anchor").as("group"), col("bucket"), col("reg"))
    hllEstimate(merged, logBuckets)
      .select(col("group").as("period"), col("present"), col("estimate"))
  }

  /** Pairwise set-overlap estimates between ALL groups from ONE
    * register relation — the "which sources share users/documents"
    * triage a mixing pipeline runs before paying for exact overlap
    * (q136's n-gram tier): `|A∪B|` is a register max-merge (HLL unions
    * are lossless), `|A∩B|` follows by inclusion–exclusion (clamped at
    * 0 — small sketches can go negative), and `jaccard_est =
    * |A∩B|/|A∪B|`. Identical groups estimate jaccard EXACTLY 1
    * (`a + a − a` is exact in IEEE).
    *
    * Shape at 100 TB: the corpus shuffles ONCE into (group, bucket)
    * registers; everything pairwise runs on |G|²·m sketch rows with
    * the tiny pair list broadcast — the corpus is never re-read,
    * never self-joined.
    */
  def hllOverlap(df: DataFrame, groupCol: String, keyCol: String,
      logBuckets: Int = 8): DataFrame = {
    val regs = hllRegisters(df, groupCol, keyCol, logBuckets)
    val singles = hllEstimate(regs, logBuckets)
      .select(col("group"), col("estimate"))
    val pairIds = singles.select(col("group").as("ga"))
      .crossJoin(broadcast(singles.select(col("group").as("gb"))))
      .where(col("ga") < col("gb"))
    val uregs = regs
      .join(broadcast(pairIds),
        col("group") === col("ga") || col("group") === col("gb"))
      .groupBy("ga", "gb", "bucket").agg(max("reg").as("reg"))
    val uest = hllEstimate(
        uregs.select(struct(col("ga"), col("gb")).as("group"),
          col("bucket"), col("reg")), logBuckets)
      .select(col("group.ga").as("ga"), col("group.gb").as("gb"),
        col("estimate").as("est_union"))
    uest
      .join(broadcast(singles.select(col("group").as("ga"),
        col("estimate").as("est_a"))), "ga")
      .join(broadcast(singles.select(col("group").as("gb"),
        col("estimate").as("est_b"))), "gb")
      .withColumn("est_intersect",
        greatest(lit(0.0), col("est_a") + col("est_b") - col("est_union")))
      .withColumn("jaccard_est",
        col("est_intersect") / col("est_union"))
      .select("ga", "gb", "est_a", "est_b", "est_union",
        "est_intersect", "jaccard_est")
  }
}
