package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities for Zipfian key distributions (SURVEY §7.4:
  * lexeme/feature frequencies are Zipfian at the 100 TB target).
  *
  * First line of defense is AQE's skew-join splitting (enabled in every
  * graft session); [[saltedJoin]] is the explicit fallback for the cases
  * AQE cannot split — e.g. a single hot key whose *build side* must be
  * replicated, or sort-merge joins feeding stateful downstream operators.
  */
object Skew {

  /** Equi-join `big ⋈ small` on `key`, with the big side salted into
    * `salt` sub-keys and the small side replicated `salt` times, so one hot
    * key spreads over `salt` tasks. Result set is identical to the plain
    * join; only the shuffle routing changes. The salt assignment uses
    * `rand()` — non-deterministic routing, deterministic results.
    */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
      salt: Int): DataFrame = {
    require(salt >= 1, s"salt must be >= 1, got $salt")
    val bigS = big.withColumn("_salt", (rand() * salt).cast("int"))
    val smallS = small.withColumn("_salt",
      explode(expr(s"sequence(0, ${salt - 1})")))
    bigS.join(smallS, Seq(key, "_salt")).drop("_salt")
  }

  /** Bloom-pruned equi-join `big ⋈ small`: semantically IDENTICAL to
    * the plain inner join (the exact join still runs — Bloom false
    * positives are eliminated there; false negatives are impossible by
    * construction, the filter tests the same md5 positions the build
    * set inserted), but the big side is first cut by a NARROW
    * plan-literal Bloom probe, so what reaches the join's exchange is
    * only the rows that might match. The selective-join shuffle
    * reducer: when the small side matches 1% of a 100 TB fact table,
    * the shuffle shrinks ~100× for the cost of `numHashes` md5 probes
    * per row at the scan — where Spark's own runtime row-group filter
    * can't help because the selectivity lives INSIDE row groups.
    *
    * The filter is a fixed `numBits/8`-byte `typedLit` (the
    * [[Curation.decontaminateBloom]] payload discipline): no broadcast
    * table, no second job over the big side.
    */
  def bloomPrunedJoin(big: DataFrame, small: DataFrame, bigKey: String,
      smallKey: String, numBits: Int = 1 << 21,
      numHashes: Int = 3): DataFrame = {
    require(numBits % 32 == 0 && numBits > 0,
      s"numBits=$numBits must be a positive multiple of 32")
    // collision-safe internals: fail fast rather than shadow a caller
    // column of the same name
    Seq("__graft_bloom", "__graft_ps").foreach { c =>
      require(!big.columns.contains(c) && !small.columns.contains(c),
        s"bloomPrunedJoin reserves internal column name $c")
    }
    val bloomArr = Curation.bloomFilterOf(
        small.select(col(smallKey).cast("string").as("v")).distinct(),
        "v", numBits, numHashes)
      .first().getSeq[Long](0).toArray
    val member = expr("forall(__graft_ps, p -> (shiftright(" +
      "element_at(__graft_bloom, CAST(p div 32 AS INT) + 1), " +
      "CAST(p % 32 AS INT)) & 1) = 1)")
    val pruned = big
      .withColumn("__graft_bloom", typedLit(bloomArr.toSeq))
      .withColumn("__graft_ps", array((0 until numHashes).map(h =>
        Curation.bloomPos(col(bigKey).cast("string"), h, numBits)): _*))
      .where(member)
      .drop("__graft_bloom", "__graft_ps")
    // alias both plans so bigKey == smallKey (the common equi-join
    // spelling) resolves instead of dying ambiguous at analysis
    pruned.as("__graft_big").join(small.as("__graft_small"),
      col(s"__graft_big.$bigKey") === col(s"__graft_small.$smallKey"))
  }
}
