package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Market-basket pair association mining — support / confidence / lift
  * over co-occurring items, the transactional sibling of the engine's
  * text association measures (SURVEY A4: the reference scores
  * (lexeme, feature) pairs by exactly this family of
  * joint-vs-marginal statistics).
  */
object Basket {

  /** Pairwise association rules over a transaction relation: every
    * unordered item pair co-occurring in at least `minCount`
    * transactions, with `support = n_xy / N`,
    * `lift = n_xy · N / (n_x · n_y)` (> 1 = the pair travels
    * together), and both directed confidences. Returns
    * `(item_l, item_r, n_xy, support, conf_lr, conf_rl, lift)` with
    * `item_l < item_r`.
    *
    * `minCount` is an integer threshold (not a fractional support) so
    * the gate is exact on any engine and scale.
    *
    * Shape at 100 TB: one (txn, item) dedup shuffle, then the pair
    * expansion self-joins ON THE TRANSACTION KEY — cost
    * Σ_txn (items/txn)², bounded by basket width, never by corpus size
    * or item popularity ([[Graph.coCitation]]'s contract) — one
    * (item, item) aggregation, and broadcast item marginals. Exact
    * integer counts; each metric is one divide.
    */
  def pairRules(transactions: DataFrame, txnCol: String, itemCol: String,
      minCount: Long = 2L): DataFrame = {
    require(minCount >= 1, s"minCount=$minCount must be >= 1")
    val ti = transactions
      .select(col(txnCol).as("txn"), col(itemCol).as("item"))
      .where(col("item").isNotNull)
      .distinct()
    val nTxn = ti.select("txn").distinct().agg(count(lit(1)).as("n"))
    val nItem = ti.groupBy("item").agg(count(lit(1)).as("n_i"))
    ti.as("a").join(ti.as("b"), Seq("txn"))
      .where(col("a.item") < col("b.item"))
      .groupBy(col("a.item").as("item_l"), col("b.item").as("item_r"))
      .agg(count(lit(1)).as("n_xy"))
      .where(col("n_xy") >= minCount)
      .join(broadcast(nItem.select(col("item").as("item_l"),
        col("n_i").as("n_l"))), "item_l")
      .join(broadcast(nItem.select(col("item").as("item_r"),
        col("n_i").as("n_r"))), "item_r")
      .crossJoin(broadcast(nTxn))
      .select(col("item_l"), col("item_r"), col("n_xy"),
        (col("n_xy").cast("double") / col("n")).as("support"),
        (col("n_xy").cast("double") / col("n_l")).as("conf_lr"),
        (col("n_xy").cast("double") / col("n_r")).as("conf_rl"),
        ((col("n_xy") * col("n")).cast("double") /
          (col("n_l") * col("n_r"))).as("lift"))
  }
}
