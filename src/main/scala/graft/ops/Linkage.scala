package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Probabilistic record linkage (Fellegi & Sunter 1969): score candidate
  * record pairs by summed log-likelihood-ratio field weights — the
  * standard entity-resolution ranker (same customer across two
  * registers, same supplier under two spellings) sitting between exact
  * join (too strict) and fuzzy join (no principled threshold).
  *
  * Everything is deterministic arithmetic over exact value-frequency
  * counts, so a SQL oracle replays scores bit-for-bit.
  */
object Linkage {

  /** Score blocked candidate pairs between `left` and `right`.
    *
    * For each comparison field f:
    *   - `u_f` (chance agreement among NON-matches) is estimated from
    *     the right register's NON-NULL value distribution:
    *     `u_f = Σ_v n_v² / N²` over values v ≠ NULL with N the non-null
    *     count — the probability two random records AGREE on the field.
    *     NULLs are excluded because pair scoring treats a NULL
    *     comparison as disagreement: counting the NULL mass as a
    *     "value" would credit u with chance agreement that can never be
    *     realized, deflating agreement weights on sparse fields. A
    *     field that is entirely NULL on the register gets u = NULL and
    *     contributes 0 (degenerate, below).
    *   - `m_f` (agreement among true matches) is the caller-supplied
    *     `mProb` (the standard simplification; EM refinement plugs into
    *     the same weights).
    *   - agreement on f contributes `log2(m/u_f)`, disagreement
    *     `log2((1−m)/(1−u_f))`. A degenerate field (u_f = 0 or 1, i.e.
    *     constant or vacuous on the register) carries no information
    *     and contributes 0 either way, never ±∞.
    *
    * `score = Σ_f w_f`; high scores are probable same-entity pairs.
    * NULL field values compare as disagreement (standard conservative
    * choice; pre-coalesce upstream to change it). Returns
    * `(id_l, id_r, n_agree, score)` for every blocked pair.
    *
    * Candidate pairs come from equality on `blockCols` — the blocking
    * key bounds the quadratic step exactly like
    * [[Dedup.fuzzyJoin]]'s length buckets: cost is Σ_block |L_b|·|R_b|,
    * never |L|·|R|. Pick blocks accordingly (a hot block is a hot
    * partition).
    *
    * Shape at 100 TB: one value-frequency aggregation per field over
    * the right register (each collapses to the field's value grain; the
    * per-field u's join in as ONE broadcast row), then one
    * hash-partitioned equi-join on the blocking key with the score as a
    * narrow projection — no window, no driver state.
    */
  def linkageScores(left: DataFrame, right: DataFrame,
      idL: String, idR: String, blockCols: Seq[String],
      fields: Seq[String], mProb: Double = 0.95): DataFrame = {
    require(blockCols.nonEmpty, "blockCols must be non-empty")
    require(fields.nonEmpty, "fields must be non-empty")
    require(mProb > 0 && mProb < 1, s"mProb=$mProb must be in (0, 1)")
    // one u estimate per field from the right register's exact NON-NULL
    // value counts: u = Σ n_v² / N² (computed as a double once, at the
    // end). NULL rows are excluded — scoring treats NULL comparisons as
    // disagreement, so they carry no realizable chance agreement.
    val uPerField = fields.map { f =>
      right.where(col(f).isNotNull)
        .groupBy(col(f)).agg(count(lit(1)).as("cnt"))
        .agg((sum(col("cnt") * col("cnt")).cast("double") /
          (sum("cnt") * sum("cnt"))).as(s"u_$f"))
    }.reduce(_.crossJoin(_))
    val l = left.select((col(idL).as("id_l") +: blockCols.map(col)) ++
      fields.map(f => col(f).as(s"l_$f")): _*)
    val r = right.select((col(idR).as("id_r") +: blockCols.map(col)) ++
      fields.map(f => col(f).as(s"r_$f")): _*)
    val ln2 = math.log(2.0)
    val agreeCols = fields.map(f => col(s"l_$f") === col(s"r_$f"))
    val weight = fields.zip(agreeCols).map { case (f, agree) =>
      val u = col(s"u_$f")
      val informative = u > 0.0 && u < 1.0
      when(informative && agree, (log(lit(mProb)) - log(u)) / ln2)
        .when(informative && !coalesce(agree, lit(false)),
          (log(lit(1.0 - mProb)) - log(lit(1.0) - u)) / ln2)
        .otherwise(lit(0.0))
    }.reduce(_ + _)
    val nAgree = agreeCols
      .map(a => when(coalesce(a, lit(false)), 1).otherwise(0))
      .reduce(_ + _)
    l.join(r, blockCols)
      .crossJoin(broadcast(uPerField))
      .select(col("id_l"), col("id_r"),
        nAgree.as("n_agree"), weight.as("score"))
  }
}
