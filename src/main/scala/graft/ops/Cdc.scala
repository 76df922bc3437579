package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Change-data-capture compaction: turn an append-only changelog of
  * upserts/deletes into the table it describes — the MERGE INTO / upsert
  * surface of a lakehouse pipeline (refreshing a curated corpus from a
  * crawl feed, applying takedown deletions, folding relabels) expressed as
  * plain declarative Spark.
  *
  * Contract: the changelog carries a key column, one or more NON-NULL
  * sequence columns whose lexicographic order gives the per-key change
  * order (event-time microseconds + a unique id tiebreak, a log offset,
  * …), an op column with `"D"` for deletes (anything else is an upsert —
  * inserts and updates are the same op under last-writer-wins), and
  * payload columns. Sequence columns must be non-null by contract: Spark's
  * `desc` deterministically sorts nulls LAST (a null sequence never wins a
  * key — spec-pinned), but engines like DuckDB default nulls first on
  * DESC, so null sequences would make an oracle replay engine-dependent.
  *
  * Shape at 100 TB: ONE shuffle each (the per-key window / the union's
  * window). Key cardinality is table-scale, so groups are small; a skewed
  * hot key is one partition's sort (AQE skew handling applies). No
  * driver-side state, no collect.
  */
object Cdc {

  private def requireCols(df: DataFrame, cols: Seq[String]): Unit = {
    val missing = cols.filterNot(df.columns.contains)
    require(missing.isEmpty, s"changelog is missing columns: $missing")
  }

  /** Compact a changelog to its latest snapshot: per key keep the row with
    * the highest sequence, then drop keys whose final change is a delete.
    * The op and rank bookkeeping columns are dropped — the result has the
    * changelog's key + sequence + payload schema.
    */
  def latestSnapshot(changes: DataFrame, keyCol: String,
      seqCols: Seq[String], opCol: String = "op"): DataFrame = {
    requireCols(changes, keyCol +: opCol +: seqCols)
    val w = Window.partitionBy(keyCol)
      .orderBy(seqCols.map(col(_).desc): _*)
    changes.withColumn("__rk", row_number().over(w))
      .where(col("__rk") === 1 && col(opCol) =!= "D")
      .drop("__rk", opCol)
  }

  /** MERGE INTO: apply a changelog to a base table. Base rows are treated
    * as upserts from before every change (sequence −1, cast to each
    * sequence column's type — changelog sequences must be non-negative),
    * so a matched key takes the change's latest payload, an unmatched key
    * keeps its base row, a key whose last change is a delete disappears,
    * and a key only in the changelog is inserted. `base` must carry the
    * key and payload columns (no op/sequence).
    */
  def mergeInto(base: DataFrame, changes: DataFrame, keyCol: String,
      seqCols: Seq[String], opCol: String = "op"): DataFrame = {
    requireCols(changes, keyCol +: opCol +: seqCols)
    requireCols(base, changes.columns.filterNot((opCol +: seqCols).contains))
    val changeTypes = changes.schema.fields.map(f => f.name -> f.dataType).toMap
    // ENFORCE the non-negative-sequence contract the −1 sentinel depends
    // on, instead of trusting it: a changelog with legitimate negative
    // sequences (pre-1970 event times, signed offsets) would otherwise
    // silently let base rows beat real changes
    val guarded = seqCols.foldLeft(changes) { (df, c) =>
      df.withColumn(c,
        when(col(c) >= lit(0L).cast(changeTypes(c)), col(c))
          .otherwise(raise_error(concat(
            lit(s"mergeInto: sequence column '$c' must be non-negative, got "),
            coalesce(col(c).cast("string"), lit("null"))))))
    }
    val baseAsChanges = seqCols.foldLeft(base.withColumn(opCol, lit("U"))) {
      (df, c) => df.withColumn(c, lit(-1L).cast(changeTypes(c)))
    }.select(changes.columns.map(col): _*)
    latestSnapshot(baseAsChanges.unionByName(guarded), keyCol, seqCols, opCol)
  }

  /** SCD-type-2 history: every upsert becomes a version row valid from its
    * own sequence until the key's next change (`valid_to` null = current).
    * Deletes emit no version but still close the previous one — a key
    * whose history ends in a delete has no current row. `valid_from` /
    * `valid_to` take the FIRST sequence column's values; remaining
    * sequence columns stay as tiebreak payload.
    */
  def scd2(changes: DataFrame, keyCol: String, seqCols: Seq[String],
      opCol: String = "op"): DataFrame = {
    requireCols(changes, keyCol +: opCol +: seqCols)
    val w = Window.partitionBy(keyCol).orderBy(seqCols.map(col): _*)
    changes
      .withColumn("valid_to", lead(seqCols.head, 1).over(w))
      .where(col(opCol) =!= "D")
      .withColumnRenamed(seqCols.head, "valid_from")
      .withColumn("is_current", col("valid_to").isNull)
      .drop(opCol)
  }

  /** Snapshot diff: classify every key across two corpus versions as
    * `added` / `removed` / `changed` / `unchanged` by content hash — the
    * release-to-release audit (what did the new crawl/curation run
    * actually do?) that gates promoting a corpus version, and the input
    * to incremental downstream recomputation (only `added`+`changed`
    * keys need re-embedding/re-scoring).
    *
    * Content identity is md5 over the concatenated `valueCols` with a
    * unit separator (avoids `("ab","c")` colliding with `("a","bc")`)
    * and a NUL sentinel for NULLs — `concat_ws` silently skips NULL
    * operands, so without the sentinel `("x",NULL,"y")` vs
    * `("x","y",NULL)` (a value shifting across columns through NULL)
    * would hash identically and be misreported as `unchanged`.
    * The diff never shuffles the payloads themselves — each side
    * reduces to (key, 16-byte hash) before the ONE full-outer equi-join.
    * At 100 TB both sides arrive partitioned by key; the join is the
    * only exchange.
    */
  def snapshotDiff(before: DataFrame, after: DataFrame, keyCol: String,
      valueCols: Seq[String]): DataFrame = {
    require(valueCols.nonEmpty, "valueCols must be non-empty")
    requireCols(before, keyCol +: valueCols)
    requireCols(after, keyCol +: valueCols)
    def hashed(df: DataFrame, h: String) = df.select(col(keyCol),
      md5(concat_ws("\u001f", valueCols.map(c =>
        coalesce(col(c).cast("string"), lit("\u0000"))): _*)).as(h))
    hashed(before, "h_before")
      .join(hashed(after, "h_after"), Seq(keyCol), "full_outer")
      .select(col(keyCol),
        when(col("h_before").isNull, "added")
          .when(col("h_after").isNull, "removed")
          .when(col("h_before") === col("h_after"), "unchanged")
          .otherwise("changed").as("status"))
  }

  /** Point-in-time join of facts against an [[scd2]] history: each fact
    * `(key, ts)` row receives the dimension version whose validity
    * interval `[valid_from, valid_to)` contains `ts` — the feature-store
    * "time-travel correct" enrichment that keeps training features as
    * they WERE at label time (no leakage from later updates), and the
    * temporal companion to [[AsOf.asofJoin]]: as-of answers "latest at
    * or before", PIT additionally respects deletions — a fact falling in
    * a gap (the key was deleted, then re-created later) gets NULLs, not
    * the stale pre-deletion version.
    *
    * `versionCols` must order same-instant versions (the [[scd2]]
    * sequence tiebreak, e.g. the change id): the candidate is the
    * LATEST-started version at-or-before `ts` (ties resolved by
    * `versionCols`), whose interval is then checked against `valid_to`.
    * Under SCD2's lead-based construction intervals partition the key's
    * timeline, so this candidate is the only one that could contain `ts`
    * — the validity check only voids deletion gaps.
    *
    * Shape at 100 TB: exactly [[AsOf.asofJoin]]'s union + ONE
    * key-partitioned window — never the naive `BETWEEN` theta-join that
    * Spark plans as a per-key nested loop. The gap check is a narrow
    * projection on the join output.
    */
  def pointInTimeJoin(facts: DataFrame, history: DataFrame,
      keyCol: String, tsCol: String, versionCols: Seq[String],
      valueCols: Seq[String], prefix: String = "pit_"): DataFrame = {
    require(versionCols.nonEmpty, "versionCols must be non-empty")
    requireCols(history,
      Seq(keyCol, "valid_from", "valid_to") ++ versionCols ++ valueCols)
    requireCols(facts, Seq(keyCol, tsCol))
    val payload = versionCols ++ Seq("valid_to") ++ valueCols
    val dim = history.select((Seq(col(keyCol),
      col("valid_from").as(tsCol), col("valid_to")) ++
      (versionCols ++ valueCols).map(col)): _*)
    val joined = AsOf.asofJoin(facts, dim, keyCol, tsCol, payload, prefix)
      .withColumnRenamed(s"$prefix$tsCol", s"${prefix}valid_from")
      .withColumn("__inwin", col(s"${prefix}valid_to").isNull ||
        col(tsCol) < col(s"${prefix}valid_to"))
    (s"${prefix}valid_from" +: payload.map(prefix + _))
      .foldLeft(joined)((df, c) =>
        df.withColumn(c, when(col("__inwin"), col(c))))
      .drop("__inwin")
  }

  /** Build the mergeable aggregate state for incremental view
    * maintenance: per key, `cnt` plus `sum_/min_/max_<col>` for each
    * value column — the decomposable aggregates whose states combine
    * associatively, so a materialized rollup can absorb a delta batch
    * WITHOUT re-reading history (averages derive as sum/cnt;
    * non-decomposable aggregates like exact distinct need their own
    * structure, e.g. [[Sketch.rollingDistinct]]'s HLL). Keep value
    * columns integral/fixed-point (cents, micros): integer sum states
    * merge bit-exactly, where float sums would drift by merge order.
    */
  def aggState(df: DataFrame, keyCols: Seq[String],
      valueCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty && valueCols.nonEmpty,
      "keyCols and valueCols must be non-empty")
    val aggs = count(lit(1)).as("cnt") +: valueCols.flatMap(c => Seq(
      sum(col(c)).as(s"sum_$c"), min(col(c)).as(s"min_$c"),
      max(col(c)).as(s"max_$c")))
    df.groupBy(keyCols.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** Merge two [[aggState]] relations (base rollup + delta batch) into
    * the state the FULL recompute would produce: counts and sums add,
    * mins/maxes combine — one union + one aggregation over state rows,
    * never a re-scan of the data behind `base`. This is the maintenance
    * step of an incremental pipeline: at 100 TB the delta is hours of
    * data, the base is the corpus, and only the delta is ever read.
    */
  def mergeAggStates(base: DataFrame, delta: DataFrame,
      keyCols: Seq[String], valueCols: Seq[String]): DataFrame = {
    val need = keyCols ++ Seq("cnt") ++ valueCols.flatMap(c =>
      Seq(s"sum_$c", s"min_$c", s"max_$c"))
    requireCols(base, need); requireCols(delta, need)
    val aggs = sum(col("cnt")).as("cnt") +: valueCols.flatMap(c => Seq(
      sum(col(s"sum_$c")).as(s"sum_$c"),
      min(col(s"min_$c")).as(s"min_$c"),
      max(col(s"max_$c")).as(s"max_$c")))
    base.unionByName(delta)
      .groupBy(keyCols.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }
}
