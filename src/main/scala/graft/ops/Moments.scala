package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Exact second-moment (Gram / covariance) profile of an embedding
  * column — the one-pass distributed half of PCA, ZCA whitening, or a
  * Mahalanobis outlier gate: compute `Σ x xᵀ` and `Σ x` over the corpus
  * here, eigendecompose the d×d result wherever you like (it's d² ≈ a
  * few KB — driver, notebook, anywhere).
  *
  * Determinism: each component is quantized ONCE on input —
  * `q = round(v · 1e6)` half-away-from-zero, the same rule as SQL
  * `ROUND` — and every downstream sum/product is exact 64-bit / decimal
  * integer arithmetic, so results are bit-identical on any engine and
  * replayable in a SQL oracle. The only approximation is the input
  * quantization (|error| ≤ 5e-7 per component). Overflow envelope: for
  * unit-scale components (|v| ≤ ~1) each pair sum |Σ qᵢqⱼ| ≤ n·1e12,
  * exact in a long up to n ≈ 9e6 and in the decimal(38,0) merge far
  * beyond any corpus; quantize coarser for larger `|v|`.
  */
object Moments {

  /** SQL ROUND semantics: half away from zero. */
  private def halfAway(x: Double): Long =
    (if (x >= 0) math.floor(x + 0.5) else math.ceil(x - 0.5)).toLong

  /** Flat exact-moment buffer: slots [0, d) hold `Σ qᵢ`, slots
    * [d, d + d(d+1)/2) the upper triangle `Σ qᵢqⱼ` (i ≤ j) in row-major
    * order. Each map task folds its rows into ONE buffer, so the
    * exchange carries `partitions` buffers of `d + d(d+1)/2` longs —
    * never `n·d²` exploded rows. This is [[graft.ops.TopK]]'s partial-
    * aggregation discipline applied to dense moments.
    */
  private final class GramAgg(d: Int)
      extends Aggregator[Seq[Float], Array[Long], Seq[Long]] {
    private val len = d + d * (d + 1) / 2
    override def zero: Array[Long] = new Array[Long](len)
    override def reduce(b: Array[Long], v: Seq[Float]): Array[Long] = {
      require(v.length == d, s"expected dim $d, got ${v.length}")
      val q = new Array[Long](d)
      var i = 0
      while (i < d) { q(i) = halfAway(v(i).toDouble * 1e6); i += 1 }
      var k = d
      i = 0
      while (i < d) {
        b(i) += q(i)
        var j = i
        while (j < d) { b(k) += q(i) * q(j); j += 1; k += 1 }
        i += 1
      }
      b
    }
    override def merge(x: Array[Long], y: Array[Long]): Array[Long] = {
      var i = 0
      while (i < len) { x(i) += y(i); i += 1 }
      x
    }
    override def finish(b: Array[Long]): Seq[Long] = b.toSeq
    override def bufferEncoder: org.apache.spark.sql.Encoder[Array[Long]] =
      ExpressionEncoder[Array[Long]]()
    override def outputEncoder: org.apache.spark.sql.Encoder[Seq[Long]] =
      ExpressionEncoder[Seq[Long]]()
  }

  /** The (i, j, n, s_i, s_j, s_ij, cov) relation for every 1-based pair
    * i ≤ j: exact integer sums of the 1e6-quantized components, plus
    * the POPULATION covariance
    * `cov = (n·s_ij − s_i·s_j) / (n² · 1e12)` of the ORIGINAL scale
    * (÷n², not n(n−1) — rescale for the unbiased estimator) —
    * the numerator exact in decimal(38,0), one double divide at the
    * end. `d` is the (fixed, caller-known) embedding dimension.
    *
    * Shape at 100 TB: ONE aggregation with map-side combine (see
    * [[GramAgg]]) to a single `d + d(d+1)/2`-long row, then a narrow
    * driver-free explode to the pair grain. No shuffle ever carries
    * more than `partitions` buffers.
    */
  def gramProfile(df: DataFrame, d: Int,
      vecCol: String = "embedding"): DataFrame = {
    require(d >= 1, s"d=$d must be >= 1")
    val nPairs = d * (d + 1) / 2
    // linear upper-triangle index k (0-based) -> 1-based (i, j)
    val iIdx = new Array[Int](nPairs)
    val jIdx = new Array[Int](nPairs)
    var k = 0
    for (i <- 1 to d; j <- i to d) { iIdx(k) = i; jIdx(k) = j; k += 1 }
    val agg = udaf(new GramAgg(d), ExpressionEncoder[Seq[Float]]())
    val dec = "decimal(38,0)"
    df.agg(count(lit(1)).as("n"), agg(col(vecCol)).as("s"))
      .select(col("n"), col("s"),
        posexplode(expr(s"slice(s, ${d + 1}, $nPairs)"))
          .as(Seq("k", "s_ij")))
      .select(
        element_at(typedLit(iIdx.toSeq), col("k") + 1).as("i"),
        element_at(typedLit(jIdx.toSeq), col("k") + 1).as("j"),
        col("n"),
        element_at(col("s"),
          element_at(typedLit(iIdx.toSeq), col("k") + 1)).as("s_i"),
        element_at(col("s"),
          element_at(typedLit(jIdx.toSeq), col("k") + 1)).as("s_j"),
        col("s_ij"))
      .withColumn("cov",
        (col("n").cast(dec) * col("s_ij").cast(dec)
          - col("s_i").cast(dec) * col("s_j").cast(dec)).cast("double")
          / (col("n").cast("double") * col("n").cast("double") * 1e12))
  }
}
