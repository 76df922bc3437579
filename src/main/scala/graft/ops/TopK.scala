package graft.ops

import org.apache.spark.sql.{DataFrame, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Partial top-k per key: the aggregation form of "best k rows per
  * group". The usual window form (`row_number` over a per-key sort)
  * shuffles EVERY row to its key's partition and sorts there — at 100 TB
  * the shuffle is the corpus. This typed `Aggregator` keeps at most `k`
  * (ord, id) pairs per group in each map task, so what reaches the
  * exchange is ≤ k rows per (key, partition): map-side combine for
  * top-k, the same discipline partial sums give `sum`.
  *
  * Ordering is (ord DESC, id ASC) — deterministic under ties by
  * construction, so results are engine-replayable (a SQL oracle's
  * ROW_NUMBER with the same ORDER BY produces the identical row set).
  * For ascending selections negate the order column.
  */
object TopK {

  /** One candidate: sort value + unique id (the tiebreak AND payload). */
  final case class Cand(ord: Long, id: Long)

  private final class TopKAgg(k: Int)
      extends Aggregator[Cand, Seq[Cand], Seq[Cand]] {
    private def lt(a: Cand, b: Cand): Boolean =
      a.ord > b.ord || (a.ord == b.ord && a.id < b.id)
    // buffers stay sorted best-first and never exceed k elements, so
    // reduce/merge are O(k) — the per-row cost is independent of group
    // size, which is the whole point
    private def insert(buf: Seq[Cand], c: Cand): Seq[Cand] = {
      if (buf.size >= k && !lt(c, buf.last)) buf
      else {
        val (pre, post) = buf.span(lt(_, c))
        (pre :+ c) ++ post.take(k - pre.size - 1)
      }
    }
    override def zero: Seq[Cand] = Vector.empty
    override def reduce(b: Seq[Cand], a: Cand): Seq[Cand] = insert(b, a)
    override def merge(x: Seq[Cand], y: Seq[Cand]): Seq[Cand] =
      y.foldLeft(x)(insert)
    override def finish(b: Seq[Cand]): Seq[Cand] = b
    override def bufferEncoder: Encoder[Seq[Cand]] =
      ExpressionEncoder[Seq[Cand]]()
    override def outputEncoder: Encoder[Seq[Cand]] =
      ExpressionEncoder[Seq[Cand]]()
  }

  /** Top `k` rows per `keyCol` by (`ordCol` DESC, `idCol` ASC), as
    * (key, ord, id, rk) with rk 1..k. `ordCol`/`idCol` must be integral
    * (cast upstream); `idCol` must uniquely key rows within a group or
    * ties are engine-dependent.
    */
  def perKey(df: DataFrame, keyCol: String, ordCol: String, idCol: String,
      k: Int): DataFrame = {
    require(k > 0, s"k=$k must be positive")
    val agg = udaf(new TopKAgg(k), Encoders.product[Cand])
    df.select(col(keyCol), col(ordCol).cast("long").as("_ord"),
        col(idCol).cast("long").as("_id"))
      .groupBy(keyCol)
      .agg(agg(col("_ord"), col("_id")).as("top"))
      .select(col(keyCol), posexplode(col("top")).as(Seq("i", "t")))
      .select(col(keyCol), col("t.ord").as(ordCol), col("t.id").as(idCol),
        (col("i") + 1).cast("int").as("rk"))
  }
}
