package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-dimensional data layout: Z-order (Morton) clustering, the
  * write-time optimization that makes file-level min/max statistics
  * selective on SEVERAL columns at once. A 100 TB table range-partitioned
  * and sorted by one key prunes scans on that key only; sorted by the
  * interleaved Z-value, every clustered column's values are confined to
  * narrow ranges per file, so predicates on ANY of them skip most files.
  *
  * All arithmetic is integer (range-normalize by integer multiply/divide,
  * interleave by shift/mask/sum), so the Z-values — and therefore the
  * layout — are bit-identical on any engine, and the oracle replays them.
  */
object Layout {

  /** Normalize `c` (integer-valued, bounds inclusive) to [0, 2^bits):
    * floor((c - min) * 2^bits / (max - min + 1)). Spark's `/` on longs is
    * double division, so exactness needs (range * 2^bits) < 2^53 — then
    * the product is an exact double and a correctly-rounded quotient can
    * only miss an integer boundary if the true value is within one ulp of
    * it, impossible with 1/range > ulp(2^bits). The DuckDB oracle replays
    * this with TRUE integer division (`//`), so any drift would fail the
    * hash gate rather than pass silently.
    */
  private def normalize(c: Column, minC: Column, maxC: Column,
      bits: Int): Column =
    floor((c.cast("long") - minC).cast("double") * (1L << bits) /
      (maxC - minC + 1L).cast("double")).cast("long")

  /** Interleave the low `bits` of each already-normalized column:
    * bit i of column c lands at position i * numCols + c.
    */
  private def interleave(cols: Seq[Column], bits: Int): Column =
    (for {
      i <- 0 until bits
      (c, ci) <- cols.zipWithIndex
    } yield shiftleft(shiftright(c, i).bitwiseAND(1L), i * cols.size + ci))
      .reduce(_ + _)

  /** Append `zvalue`: the Morton interleave of `cols` (integer-typed),
    * each min/max-normalized to `bits` bits. The bounds come from one tiny
    * aggregate broadcast back over the data — one extra scan of the
    * clustered columns only (at write time, where this belongs, that scan
    * is column-pruned and cheap relative to the shuffle that follows).
    * `bits * cols.size` must stay < 63 (the value is a long).
    */
  def zValue(df: DataFrame, cols: Seq[String], bits: Int): DataFrame = {
    require(cols.nonEmpty && bits > 0 && bits * cols.size < 63,
      s"need 0 < bits*${cols.size} < 63, got bits=$bits")
    val aggs = cols.flatMap(c =>
      Seq(min(col(c)).as(s"__min_$c"), max(col(c)).as(s"__max_$c")))
    val bounds = df.agg(aggs.head, aggs.tail: _*)
    val normalized = cols.map(c => normalize(col(c),
      col(s"__min_$c"), col(s"__max_$c"), bits))
    // [[normalize]]'s exactness precondition, ENFORCED at runtime: each
    // column's range must satisfy (range * 2^bits) <= 2^53, or the double
    // division silently diverges from the pinned integer-division
    // semantics (e.g. epoch-microsecond timestamps at bits=16). Fail loud
    // instead — the fix is fewer bits or a pre-bucketed column.
    val rangeCap = if (bits > 53) 0L else 1L << (53 - bits)
    // a true range >= 2^63 (min near Long.MinValue, max positive)
    // overflows the long subtraction — under ANSI that's an opaque
    // ARITHMETIC_OVERFLOW mid-guard, under legacy mode a silent NEGATIVE
    // wrap that would satisfy <= rangeCap. try_-arithmetic turns overflow
    // into NULL and the >= 1 side rejects both NULL and wrapped values,
    // so every mode reaches the guard's own actionable raise_error
    val rangesExact = cols.map { c =>
      val range = try_add(try_subtract(
        col(s"__max_$c").cast("long"), col(s"__min_$c").cast("long")), lit(1L))
      range.isNotNull && range >= 1L && range <= rangeCap
    }.reduce(_ && _)
    val zv = when(rangesExact, interleave(normalized, bits))
      .otherwise(raise_error(lit(
        s"zValue: a clustered column's range exceeds 2^${53 - bits} — " +
          s"(range << $bits) no longer fits double-exact arithmetic; " +
          "reduce bits or pre-bucket the column")))
    df.crossJoin(broadcast(bounds))
      .withColumn("zvalue", zv)
      .drop(cols.flatMap(c => Seq(s"__min_$c", s"__max_$c")): _*)
  }

  /** Cluster the table for writing: range-partition on the Z-value and
    * sort within partitions — each output file then covers a small
    * hyper-rectangle of the clustered columns, which is what makes
    * min/max skipping effective on all of them. This is the ONE shuffle a
    * layout rewrite costs; `df.write.parquet` after it preserves order.
    */
  def clusterByZ(df: DataFrame, cols: Seq[String], bits: Int,
      numPartitions: Int): DataFrame =
    zValue(df, cols, bits)
      .repartitionByRange(numPartitions, col("zvalue"))
      .sortWithinPartitions("zvalue")

  /** Dense 1-based GLOBAL rank over `(keyCol, idCol)` — exactly SQL's
    * `ROW_NUMBER() OVER (ORDER BY key, id)` — WITHOUT the
    * single-partition window that makes the naive spelling a driver-
    * sized bottleneck (Spark executes an unpartitioned window on ONE
    * task; at 100 TB that task never finishes). The classic two-pass
    * distributed ranking instead:
    *
    *  1. order-preserving bucketing: `bucket = ⌊(key − min) · B /
    *     span⌋` (clamped to B−1) over one min/max aggregate. The
    *     boundaries need not be EXACT — any monotone bucket function
    *     yields exact ranks because the offsets come from the actual
    *     counts — they only need to be deterministic, which closed
    *     arithmetic over the two aggregate scalars is (no sampled
    *     range partitioner, whose cuts are run-dependent);
    *  2. per-bucket counts (ONE partial-agg shuffle) → cumulative
    *     offsets, collected as ≤ `numBuckets` rows (a documented
    *     B-bounded collect) and rebroadcast as a plan-literal array;
    *  3. `rank = offset(bucket) + row_number` within the bucket — the
    *     window is PARTITIONED by bucket, so the sort parallelizes B
    *     ways and no task ever sees more than one bucket.
    *
    * `keyCol` must be integral (cast to long); `(key, id)` must be
    * unique or ranks are nondeterministic among ties. Key-value skew
    * concentrates in one bucket (a constant column degenerates to one
    * sort task) — raise `numBuckets` or pre-spread the key. Appends
    * `rankCol`.
    */
  def globalRank(df: DataFrame, keyCol: String, idCol: String,
      rankCol: String = "rk", numBuckets: Int = 1024): DataFrame = {
    require(numBuckets >= 1, s"numBuckets=$numBuckets must be >= 1")
    val k = col(keyCol).cast("long")
    val bounds = df.agg(min(k).as("__mn"), max(k).as("__mx"))
      .first()
    if (bounds.isNullAt(0)) return df.withColumn(rankCol, lit(null))
    val mn = bounds.getLong(0)
    val mx = bounds.getLong(1)
    // span as double: monotone (double conversion preserves long order)
    // is all the bucket function needs; the clamp covers the rounding
    // at the top edge of astronomically wide spans
    val span = mx.toDouble - mn.toDouble + 1.0
    // subtract in DOUBLE (a long k − mn could overflow for a span
    // crossing the full long range; double stays monotone)
    val bucket = least(
      floor((k.cast("double") - mn.toDouble) * numBuckets / span),
      lit((numBuckets - 1).toDouble)).cast("int")
    val withB = df.withColumn("__grk_b", bucket)
    val counts = withB.groupBy("__grk_b").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val offsets = new Array[Long](numBuckets)
    var acc = 0L
    for (b <- 0 until numBuckets) {
      offsets(b) = acc
      acc += counts.getOrElse(b, 0L)
    }
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("__grk_b").orderBy(k.asc, col(idCol).asc)
    withB
      .withColumn(rankCol,
        element_at(typedLit(offsets.toSeq), col("__grk_b") + 1) +
          row_number().over(w))
      .drop("__grk_b")
  }
}
