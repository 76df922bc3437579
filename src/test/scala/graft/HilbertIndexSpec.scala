package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{hilbert_index, registerAll, HilbertIndex}

/** The native Hilbert kernel: reference values, null/range behavior, SQL
  * registration, and the constant-folding pin every graft kernel carries
  * (foldable inputs must fold to a literal in the optimized plan).
  */
class HilbertIndexSpec extends AnyFunSuite with SparkTestBase {

  test("kernel matches the reference walk on the full 8x8 grid and " +
      "rejects out-of-range coordinates loudly") {
    // reference: the python-validated quadrant walk, restated here
    def ref(x0: Long, y0: Long, bits: Int): Long = {
      var (x, y, d) = (x0, y0, 0L)
      var s = (1L << bits) >> 1
      while (s > 0) {
        val (rx, ry) = (x / s, y / s)
        d += s * s * (if (rx == 0) ry else 3 - ry)
        val (xm, ym) = (x % s, y % s)
        if (ry == 0) {
          if (rx == 1) { x = s - 1 - ym; y = s - 1 - xm }
          else { x = ym; y = xm }
        } else { x = xm; y = ym }
        s >>= 1
      }
      d
    }
    for (x <- 0L until 8L; y <- 0L until 8L)
      assert(HilbertIndex.compute(x, y, 3) == ref(x, y, 3), s"($x,$y)")
    val e = intercept[IllegalArgumentException](
      HilbertIndex.compute(8L, 0L, 3))
    assert(e.getMessage.contains("outside"))
    intercept[IllegalArgumentException](HilbertIndex.compute(0L, -1L, 3))
  }

  test("column API: null propagates; SQL registration + constant " +
      "folding (a foldable call folds to a literal in the plan)") {
    val s2 = spark; import s2.implicits._
    val fx = Seq((Some(1L), Some(2L)), (None, Some(0L)), (Some(0L), None))
      .toDF("x", "y")
    val got = fx.select(hilbert_index(col("x"), col("y"), 3).as("h"))
      .collect().map(r => if (r.isNullAt(0)) None else Some(r.getLong(0)))
    assert(got(0).contains(HilbertIndex.compute(1L, 2L, 3)))
    assert(got(1).isEmpty && got(2).isEmpty)
    registerAll(spark)
    val viaSql = spark.sql(
      "SELECT hilbert_index(CAST(5 AS BIGINT), CAST(6 AS BIGINT), 3) h")
    assert(viaSql.head().getLong(0) == HilbertIndex.compute(5L, 6L, 3))
    val folded = viaSql.queryExecution.optimizedPlan.toString
    assert(!folded.contains("hilbert_index"),
      s"foldable call must constant-fold:\n$folded")
    // non-literal bits is refused at registration
    val err = intercept[Exception](spark.sql(
      "SELECT hilbert_index(CAST(1 AS BIGINT), CAST(1 AS BIGINT), " +
        "CAST(id AS INT)) FROM range(1)").collect())
    assert(err.getMessage.contains("bits"))
  }
}
