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
}
