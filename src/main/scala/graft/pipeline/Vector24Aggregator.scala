package graft.pipeline

import org.apache.spark.sql.{DataFrame, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** The 24-dim similarity aggregation as ONE custom typed `Aggregator`
  * (SURVEY §7.3's optional alternative to the 40-expression wide
  * aggregation in [[PairVectors.vectors]]): a single 40-double buffer per
  * group instead of 40 separate aggregate expressions, which keeps the
  * aggregation plan narrow when expression-tree width matters.
  *
  * Semantics: corrected mode only — every accumulator is a sum, so
  * `merge` is element-wise addition and the aggregator is commutative
  * (the faithful JS-reset quirk is order-dependent and cannot be a
  * commutative merge; it stays with the expression form's window
  * implementation).
  */
/** One pivoted per-feature row: v1/v2 per measure (freq, prob, pmi,
  * ttest), as produced by the PairVectors pivot stage.
  */
final case class PerFeatureRow(
    freq_1: Double, freq_2: Double, prob_1: Double, prob_2: Double,
    pmi_1: Double, pmi_2: Double, ttest_1: Double, ttest_2: Double)

object Vector24Aggregator
    extends Aggregator[PerFeatureRow, Array[Double], Array[Double]] {

  // per measure: man, euc, dot, n1, n2, min, max, sum, js1, js2
  private final val W = 10

  override def zero: Array[Double] = new Array[Double](4 * W)

  override def reduce(b: Array[Double], a: PerFeatureRow): Array[Double] = {
    val vs = Array(a.freq_1, a.freq_2, a.prob_1, a.prob_2,
      a.pmi_1, a.pmi_2, a.ttest_1, a.ttest_2)
    var m = 0
    while (m < 4) {
      val v1 = vs(2 * m); val v2 = vs(2 * m + 1)
      val o = m * W
      b(o) += math.abs(v1 - v2)
      b(o + 1) += (v1 - v2) * (v1 - v2)
      b(o + 2) += v1 * v2
      b(o + 3) += v1 * v1
      b(o + 4) += v2 * v2
      b(o + 5) += math.min(v1, v2)
      b(o + 6) += math.max(v1, v2)
      b(o + 7) += v1 + v2
      val mean = (v1 + v2) / 2.0
      if (v1 > 0 && mean > 0) b(o + 8) += v1 * math.log(v1 / mean)
      if (v2 > 0 && mean > 0) b(o + 9) += v2 * math.log(v2 / mean)
      m += 1
    }
    b
  }

  override def merge(x: Array[Double], y: Array[Double]): Array[Double] = {
    var i = 0
    while (i < x.length) { x(i) += y(i); i += 1 }
    x
  }

  override def finish(b: Array[Double]): Array[Double] = {
    val out = new Array[Double](24)
    var m = 0
    while (m < 4) {
      val o = m * W
      out(m * 6) = if (b(o).isNaN) Double.PositiveInfinity else b(o)
      out(m * 6 + 1) =
        if (b(o + 1) < 0 || b(o + 1).isNaN) Double.PositiveInfinity
        else math.sqrt(b(o + 1))
      val cos = b(o + 2) / (math.sqrt(b(o + 3)) * math.sqrt(b(o + 4)))
      out(m * 6 + 2) = if (b(o + 3) <= 0 || b(o + 4) <= 0 || cos.isNaN) 0.0 else cos
      val jac = b(o + 5) / b(o + 6)
      out(m * 6 + 3) = if (b(o + 6) == 0 || jac.isNaN) 0.0 else jac
      val dice = 2 * b(o + 5) / b(o + 7)
      out(m * 6 + 4) = if (b(o + 7) == 0 || dice.isNaN) 0.0 else dice
      val js = b(o + 8) + b(o + 9)
      out(m * 6 + 5) = if (js.isNaN) Double.PositiveInfinity else js
      m += 1
    }
    out
  }

  override def bufferEncoder: Encoder[Array[Double]] =
    ExpressionEncoder[Array[Double]]()
  override def outputEncoder: Encoder[Array[Double]] =
    ExpressionEncoder[Array[Double]]()

  /** Drop-in alternative to the wide-agg stage: pivoted per-feature rows →
    * `w1, w2, related` + [[PairVectors.vectorColumns]] via this single
    * UDAF.
    */
  def aggregate(perFeature: DataFrame): DataFrame = {
    val agg = udaf(this, Encoders.product[PerFeatureRow])
    val named = PairVectors.vectorColumns.zipWithIndex.map { case (c, i) =>
      element_at(col("vec"), i + 1).as(c)
    }
    perFeature
      .groupBy("w1", "w2", "related")
      .agg(agg(col("freq_1"), col("freq_2"), col("prob_1"), col("prob_2"),
        col("pmi_1"), col("pmi_2"), col("ttest_1"), col("ttest_2")).as("vec"))
      .select(col("w1") +: col("w2") +: col("related") +: named: _*)
  }
}
