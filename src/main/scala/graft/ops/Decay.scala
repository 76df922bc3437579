package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Time-decayed aggregation: exponentially-weighted per-key scores over
  * an event log (`weight = 2^(-age/halfLife)`), the standard recency
  * signal behind trending detection, freshness-weighted source quality,
  * and user-activity features. The anchor "now" is the log's max
  * timestamp, so the result is a pure function of the input (reruns and
  * the SQL oracle agree bit-for-bit; callers wanting wall-clock decay
  * pass their own anchor).
  */
object Decay {

  /** Per-key exponentially-decayed sum of `valueCol`:
    * `score(key) = Σ_events value · 2^(−(now − ts)/halfLifeUs)` with
    * `now = max(ts)` over the whole log (or `anchorUs` if given).
    * Returns `(key, decayed, n_events)`.
    *
    * Determinism: floating sums fold in a fixed two-level order — events
    * fold inside their `bucketUs` time bucket ordered by `orderCols`,
    * then bucket subtotals fold in bucket order. Both levels are plain
    * aggregations on the SAME key-prefixed grouping (the (key, bucket)
    * agg pre-partitions the key agg), so the result is
    * partition-invariant and a SQL engine replays it exactly.
    *
    * Shape at 100 TB: decay weights are narrow per-row arithmetic against
    * a broadcast 1-row anchor; the (key, bucket) aggregation bounds
    * per-group collected state by the bucket's event count (pick
    * `bucketUs` ≪ hot-key lifetime — a day of a hot key's events, not its
    * history), and the outer fold sees one row per (key, bucket). Two
    * aggs, one broadcast, no window, no self-join.
    */
  def decayedSum(events: DataFrame, keyCol: String, orderCols: Seq[String],
      tsCol: String, valueCol: String, halfLifeUs: Long,
      bucketUs: Long, anchorUs: Option[Long] = None): DataFrame = {
    require(halfLifeUs > 0, s"halfLifeUs=$halfLifeUs must be > 0")
    require(bucketUs > 0, s"bucketUs=$bucketUs must be > 0")
    require(orderCols.nonEmpty, "orderCols must be non-empty")
    val now = anchorUs match {
      case Some(a) => events.sparkSession.range(1)
        .select(lit(a).cast("long").as("__now"))
      case None => events.agg(max(col(tsCol)).cast("long").as("__now"))
    }
    val weighted = events.crossJoin(broadcast(now))
      .select(col(keyCol).as("key"),
        expr(s"CAST($tsCol AS BIGINT) DIV $bucketUs").as("__bkt"),
        struct(orderCols.map(col): _*).as("__o"),
        (col(valueCol) * pow(lit(0.5),
          (col("__now") - col(tsCol).cast("long")).cast("double")
            / halfLifeUs.toDouble)).as("__w"))
    val perBucket = weighted.groupBy("key", "__bkt")
      .agg(expr("aggregate(array_sort(collect_list(struct(__o, __w))), " +
          "cast(0.0 as double), (a, x) -> a + x.__w)").as("__s"),
        count(lit(1)).as("__n"))
    perBucket.groupBy("key")
      .agg(expr("aggregate(array_sort(collect_list(struct(__bkt, __s))), " +
          "cast(0.0 as double), (a, x) -> a + x.__s)").as("decayed"),
        sum("__n").as("n_events"))
  }
}
