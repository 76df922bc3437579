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

  /** File-skipping effectiveness AUDIT: for each probe range, how many
    * of `numFiles` range-partitioned files a min/max-statistics reader
    * must scan under (a) the Z-order layout and (b) a plain sort by
    * each single clustered column — the measured form of the claim
    * [[zValue]]'s scaladoc makes. Files are modeled as equal-VALUE-
    * RANGE cuts of the layout key (range partitioning by value; closed
    * integer arithmetic both engines replay — an equal-row-count model
    * would need the rank machinery for no audit benefit), and a file
    * is scanned iff its [min, max] of the probed column intersects the
    * probe range — exactly the parquet row-group pruning rule.
    *
    * Returns one row per (layout, probe):
    * `(layout, probe_col, lo, hi, files_nonempty, files_scanned,
    * rows_scanned)` — a Z-layout should scan FEW files for probes on
    * EVERY clustered column, where sort-by-c prunes only its own
    * column. One narrow layouts×rows explode, one (layout, file)-grain
    * agg, one broadcast probe join.
    */
  def zSkippingProfile(df: DataFrame, cols: Seq[String], bits: Int,
      numFiles: Int, probes: Seq[(String, Long, Long)]): DataFrame = {
    require(numFiles >= 1, s"numFiles=$numFiles must be >= 1")
    require(probes.nonEmpty && probes.forall(p => cols.contains(p._1)),
      s"every probe column must be clustered: $probes vs $cols")
    val zv = zValue(df, cols, bits)
    val boundAggs = Seq(min("zvalue").as("zmn"), max("zvalue").as("zmx")) ++
      cols.flatMap(c => Seq(min(col(c)).cast("long").as(s"mn_$c"),
        max(col(c)).cast("long").as(s"mx_$c")))
    val bounds = zv.agg(boundAggs.head, boundAggs.tail: _*).first()
    if (bounds.isNullAt(0))
      return df.sparkSession.emptyDataFrame
    def fileOf(c: Column, mn: Long, mx: Long): Column =
      least(floor((c.cast("double") - mn.toDouble) * numFiles /
          (mx.toDouble - mn.toDouble + 1.0)),
        lit((numFiles - 1).toDouble)).cast("int")
    def b(n: String): Long = bounds.getLong(bounds.fieldIndex(n))
    val layouts: Seq[(String, Column)] =
      ("zorder", fileOf(col("zvalue"), b("zmn"), b("zmx"))) +:
        cols.map(c => (s"sort_$c",
          fileOf(col(c).cast("long"), b(s"mn_$c"), b(s"mx_$c"))))
    val explodedCols = explode(array(layouts.map { case (name, f) =>
      struct(lit(name).as("layout"), f.as("file"))
    }: _*)).as("lf") +: cols.map(col)
    val exploded = zv.select(explodedCols: _*)
    val stats = exploded.groupBy(col("lf.layout").as("layout"),
        col("lf.file").as("file"))
      .agg(count(lit(1)).as("n_rows"),
        cols.flatMap(c => Seq(min(col(c)).cast("long").as(s"mn_$c"),
          max(col(c)).cast("long").as(s"mx_$c"))): _*)
    val probeDf = {
      val s2 = df.sparkSession
      import s2.implicits._
      probes.toDF("probe_col", "lo", "hi")
    }
    // the probed column's file min/max, resolved by probe_col
    val mnP = cols.tail.foldLeft(col(s"mn_${cols.head}")) { (acc, c) =>
      when(col("probe_col") === c, col(s"mn_$c")).otherwise(acc)
    }
    val mxP = cols.tail.foldLeft(col(s"mx_${cols.head}")) { (acc, c) =>
      when(col("probe_col") === c, col(s"mx_$c")).otherwise(acc)
    }
    val scanned = !(mxP < col("lo") || mnP > col("hi"))
    stats.crossJoin(broadcast(probeDf))
      .groupBy("layout", "probe_col", "lo", "hi")
      .agg(count(lit(1)).as("files_nonempty"),
        sum(when(scanned, 1L).otherwise(0L)).as("files_scanned"),
        sum(when(scanned, col("n_rows")).otherwise(0L))
          .as("rows_scanned"))
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
    * distributed ranking, plus automatic skew refinement:
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
    *     B-bounded collect) and rebroadcast as a plan-literal map;
    *  3. `rank = offset(bucket) + row_number` within the bucket — the
    *     window is PARTITIONED by bucket, so the sort parallelizes B
    *     ways and no task ever sees more than one bucket.
    *
    * SKEW GUARD: a bucket holding more than `maxBucketRows` rows (a
    * constant or low-cardinality key concentrates everything in one
    * bucket, degenerating step 3 to one sort task) is REFINED before
    * ranking: a multi-key bucket re-buckets by key range within its
    * own [min, max]; a single-key bucket (pure ties) sub-buckets by
    * ID range — monotone in `id`, and ranks among equal keys are
    * id-ordered, so the refinement is exact, not approximate. Up to
    * three refinement rounds (each costs one more partial-agg counts
    * pass at the refined group grain); residual pathology past that
    * — or a tie group whose ids don't cast to long, which id-range
    * refinement needs — FAILS LOUDLY rather than silently producing
    * a task that never finishes. Every refinement is a deterministic
    * function of collected aggregates, so reruns bucket identically;
    * output ranks are IDENTICAL with or without refinement (the
    * grouping only changes the plan, never the ROW_NUMBER semantics).
    *
    * Requirements (violations fail loudly, never corrupt ranks):
    *  - `keyCol` must be integral (cast to long) and NON-NULL — a SQL
    *    window would sort nulls first; this operator refuses them;
    *  - `(key, id)` must be unique or ranks are nondeterministic
    *    among ties;
    *  - `df` must be DETERMINISTIC under re-evaluation: the plan
    *    executes once per pass (bounds, counts, final rank), and a
    *    source whose rows change between actions desynchronizes the
    *    collected offsets from the final pass (gaps/duplicate ranks).
    *    Non-deterministic upstream (sampling, `rand`, a mutating
    *    table) must be checkpointed/cached by the caller first.
    *
    * Appends `rankCol`; `rankCol` and the internal `__grk_g` must not
    * collide with existing columns.
    */
  def globalRank(df: DataFrame, keyCol: String, idCol: String,
      rankCol: String = "rk", numBuckets: Int = 1024,
      maxBucketRows: Long = 1L << 23): DataFrame = {
    require(numBuckets >= 1, s"numBuckets=$numBuckets must be >= 1")
    require(maxBucketRows >= 1, s"maxBucketRows=$maxBucketRows must be >= 1")
    for (c <- Seq(rankCol, "__grk_g"))
      require(!df.columns.contains(c),
        s"globalRank: input already has a column named '$c' — rename it " +
          "(the operator appends rankCol and uses __grk_g internally)")
    val k = col(keyCol).cast("long")
    val idL = col(idCol).cast("long")
    val bounds = df.agg(min(k).as("__mn"), max(k).as("__mx"),
      sum(when(col(keyCol).isNull, 1L).otherwise(0L)).as("__nulls"))
      .first()
    if (!bounds.isNullAt(2) && bounds.getLong(2) > 0L)
      throw new IllegalArgumentException(
        s"globalRank: keyCol '$keyCol' has ${bounds.getLong(2)} null " +
          "values — rank order over nulls is undefined here; filter them " +
          "or coalesce to a sentinel first")
    if (bounds.isNullAt(0)) return df.withColumn(rankCol, lit(null))
    val (groupExpr, groups) = rankGroups(df, keyCol, idCol,
      numBuckets, maxBucketRows, bounds.getLong(0), bounds.getLong(1))
    // offsets in GLOBAL rank order = lexicographic refinement-path order
    var acc = 0L
    val offsets = groups.map { g =>
      val o = g.gid -> acc
      acc += g.rows
      o
    }.toMap
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("__grk_g").orderBy(k.asc, col(idCol).asc)
    df.withColumn("__grk_g", groupExpr)
      .withColumn(rankCol,
        element_at(typedLit(offsets), col("__grk_g")) +
          row_number().over(w))
      .drop("__grk_g")
  }

  /** Exact EXCLUSIVE prefix sum of `valCol` over the global
    * `(keyCol, idCol)` order — `cumCol` = the sum of every EARLIER
    * row's value (0 for the first row), exactly SQL's
    * `SUM(val) OVER (ORDER BY key, id ROWS UNBOUNDED PRECEDING) − val`
    * — without the single-partition window, via [[globalRank]]'s
    * bucket-offset machinery (same two collected passes, same skew
    * refinement, same loud-failure contract; see [[globalRank]] for
    * the determinism/non-null-key requirements): per-group SUMS
    * replace per-group counts, offsets accumulate with
    * `Math.addExact` so a 100 TB token total overflows loudly, and the
    * per-group window computes the local running sum in parallel.
    *
    * The prefix sum is THE primitive corpus assembly needs: token-
    * budget cuts ("the first N tokens in curriculum order"), GPT-style
    * concat-and-chunk context packing
    * ([[graft.ops.Curation.contextWindows]]), deterministic byte
    * offsets for manifest/layout planning. Null values count as 0;
    * `valCol` must cast to long.
    */
  def globalCumsum(df: DataFrame, keyCol: String, idCol: String,
      valCol: String, cumCol: String = "cumsum", numBuckets: Int = 1024,
      maxBucketRows: Long = 1L << 23): DataFrame = {
    require(numBuckets >= 1, s"numBuckets=$numBuckets must be >= 1")
    require(maxBucketRows >= 1, s"maxBucketRows=$maxBucketRows must be >= 1")
    for (c <- Seq(cumCol, "__grk_g"))
      require(!df.columns.contains(c),
        s"globalCumsum: input already has a column named '$c' — rename " +
          "it (the operator appends cumCol and uses __grk_g internally)")
    val k = col(keyCol).cast("long")
    val v = coalesce(col(valCol).cast("long"), lit(0L))
    val bounds = df.agg(min(k).as("__mn"), max(k).as("__mx"),
      sum(when(col(keyCol).isNull, 1L).otherwise(0L)).as("__nulls"))
      .first()
    if (!bounds.isNullAt(2) && bounds.getLong(2) > 0L)
      throw new IllegalArgumentException(
        s"globalCumsum: keyCol '$keyCol' has ${bounds.getLong(2)} null " +
          "values — prefix order over nulls is undefined here; filter " +
          "them or coalesce to a sentinel first")
    if (bounds.isNullAt(0)) return df.withColumn(cumCol, lit(null))
    val (groupExpr, groups) = rankGroups(df, keyCol, idCol,
      numBuckets, maxBucketRows, bounds.getLong(0), bounds.getLong(1))
    // ONE more partial-agg pass at the (converged) group grain: each
    // group's value total, collected as ≤ |groups| longs
    val sums = df.groupBy(groupExpr.as("__grk_g"))
      .agg(sum(v).as("s")).collect()
      .map(r => r.getInt(0) -> (if (r.isNullAt(1)) 0L else r.getLong(1)))
      .toMap
    var acc = 0L
    val offsets = groups.map { g =>
      val o = g.gid -> acc
      acc = Math.addExact(acc, sums.getOrElse(g.gid, 0L))
      o
    }.toMap
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("__grk_g").orderBy(k.asc, col(idCol).asc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    df.withColumn("__grk_g", groupExpr)
      .withColumn(cumCol,
        element_at(typedLit(offsets), col("__grk_g")) +
          sum(v).over(w) - v)
      .drop("__grk_g")
  }

  /** One final rank group = one contiguous slab of the global
    * (key, id) order: either a key range, or (for a refined tie
    * group) a single key restricted to an id range. `path` is the
    * refinement trail; `rows` the group's exact row count. Exposed
    * private[graft] so specs can assert the skew guard's bound.
    */
  private[graft] final case class RankGroup(gid: Int, path: Vector[Int],
      rows: Long)

  /** [[globalRank]]'s group assignment: the (group-id expression,
    * final groups in global rank order) pair, with every group's row
    * count ≤ `maxBucketRows` (the skew refinement loop's exit
    * condition) or a loud failure.
    */
  private[graft] def rankGroups(df: DataFrame, keyCol: String,
      idCol: String, numBuckets: Int, maxBucketRows: Long,
      mn: Long, mx: Long): (Column, Seq[RankGroup]) = {
    val k = col(keyCol).cast("long")
    // try_cast, not cast: under ANSI a non-integral id must surface as
    // the driver's actionable "cannot range-refine this tie group"
    // error (and only when refinement actually needs ids), never as a
    // task-level CAST_INVALID_INPUT from the stats pass
    val idL = expr(s"try_cast(`$idCol` as bigint)")

    // Range-normalized sub-bucket of `c` within [lo, hi] to `parts`
    // cells: subtract in DOUBLE (a long c − lo could overflow for a
    // span crossing the full long range; double stays monotone — and
    // monotone + clamped is all a bucket function needs, because the
    // offsets come from actual counts, not from the boundaries).
    def rangeBucket(c: Column, lo: Long, hi: Long, parts: Int): Column =
      least(floor((c.cast("double") - lo.toDouble) * parts /
          (hi.toDouble - lo.toDouble + 1.0)),
        lit((parts - 1).toDouble)).cast("int")

    // lexicographic path order IS global rank order, because every
    // split is monotone in the (key, id) order within its parent
    var groups: Seq[RankGroup] = (0 until numBuckets).map(b =>
      RankGroup(b, Vector(b), 0L))
    var nextGid = numBuckets
    var groupExpr: Column = rangeBucket(k, mn, mx, numBuckets)
    var round = 0
    var done = false
    while (!done) {
      // per-group stats in ONE partial-agg shuffle: row count plus the
      // key/id bounds a refinement of this group would need
      val stats = df.groupBy(groupExpr.as("__grk_g"))
        .agg(count(lit(1)).as("n"), min(k).as("kmn"), max(k).as("kmx"),
          min(idL).as("imn"), max(idL).as("imx"),
          sum(when(idL.isNull, 1L).otherwise(0L)).as("inull"))
        .collect()
        .map(r => r.getInt(0) -> r).toMap
      groups = groups.map(g => g.copy(rows =
        stats.get(g.gid).map(_.getLong(1)).getOrElse(0L)))
      val oversized = groups.filter(_.rows > maxBucketRows)
      if (oversized.isEmpty) done = true
      else {
        if (round >= 3) throw new IllegalStateException(
          s"globalRank: ${oversized.size} bucket(s) still exceed " +
            s"maxBucketRows=$maxBucketRows after $round refinement " +
            s"rounds (worst: ${oversized.map(_.rows).max} rows) " +
            "— raise maxBucketRows or pre-aggregate the key")
        round += 1
        val refined = oversized.flatMap { g =>
          val r = stats(g.gid)
          val (kmn, kmx) = (r.getLong(2), r.getLong(3))
          val parts = math.min(4096L, math.max(2L,
            2L * ((g.rows + maxBucketRows - 1) / maxBucketRows))).toInt
          val sub: Column =
            if (kmn < kmx) rangeBucket(k, kmn, kmx, parts) // split keys
            else { // pure tie group: split the ids (monotone in id)
              if (r.getLong(6) > 0L || r.isNullAt(4))
                throw new IllegalStateException(
                  s"globalRank: key=$kmn is a tie group of ${g.rows} " +
                    s"rows (> maxBucketRows=$maxBucketRows) and idCol " +
                    s"'$idCol' does not cast to long, so the tie group " +
                    "cannot be range-refined — use an integral id or " +
                    "raise maxBucketRows")
              rangeBucket(idL, r.getLong(4), r.getLong(5), parts)
            }
          val children = (0 until parts).map { i =>
            val child = RankGroup(nextGid, g.path :+ i, 0L)
            nextGid += 1
            child
          }
          // rewrite the group expr: rows of g land in g's children
          val childGid = children.foldLeft(lit(children.head.gid)) {
            (acc, c) => when(sub === (c.path.last), lit(c.gid)).otherwise(acc)
          }
          groupExpr = when(groupExpr === g.gid, childGid).otherwise(groupExpr)
          children
        }
        val dead = oversized.map(_.gid).toSet
        groups = groups.filterNot(g => dead(g.gid)) ++ refined
      }
    }
    val ordered = groups.sortWith((a, b) => {
      val cmp = a.path.zip(b.path).find { case (x, y) => x != y }
      cmp.map { case (x, y) => x < y }
        .getOrElse(a.path.length < b.path.length)
    })
    (groupExpr, ordered)
  }
}
