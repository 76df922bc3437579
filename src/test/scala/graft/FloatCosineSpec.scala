package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{float_cosine, float_dot}

/** The fused cosine must be BIT-identical to the composed
  * `float_dot(a,b) / (sqrt(float_dot(a,a)) * sqrt(float_dot(b,b)))` —
  * that identity is what allows [[graft.ops.Similarity.cosine]] to swap
  * in the single-pass expression without moving any oracle-checked
  * result.
  */
class FloatCosineSpec extends AnyFunSuite with SparkTestBase {

  private def composed = float_dot(col("a"), col("b")) /
    (sqrt(float_dot(col("a"), col("a"))) *
      sqrt(float_dot(col("b"), col("b"))))

  test("fused == composed, bit for bit, on seeded random vectors") {
    val s2 = spark; import s2.implicits._
    val rnd = new scala.util.Random(42)
    val rows = Seq.tabulate(500) { _ =>
      val d = 1 + rnd.nextInt(64)
      (Array.fill(d)((rnd.nextGaussian() * 3).toFloat),
        Array.fill(d)((rnd.nextGaussian() * 3).toFloat))
    }
    val got = rows.toDF("a", "b")
      .select(float_cosine(col("a"), col("b")).as("fused"),
        composed.as("comp"))
      .collect()
    got.foreach { r =>
      val (f, c) = (r.getDouble(0), r.getDouble(1))
      assert(java.lang.Double.doubleToRawLongBits(f) ==
        java.lang.Double.doubleToRawLongBits(c), s"$f vs $c")
    }
  }

  test("edge cases: length mismatch, zero vectors, interpreted path") {
    val s2 = spark; import s2.implicits._
    val rows = Seq(
      (Array(1f, 2f, 3f), Array(1f, 2f)),          // length mismatch
      (Array(2f), Array(3f))                       // trivial exact 1.0
    )
    val got = rows.toDF("a", "b")
      .select(float_cosine(col("a"), col("b")).as("fused"),
        composed.as("comp"))
      .collect()
    got.foreach { r =>
      val (f, c) = (r.getDouble(0), r.getDouble(1))
      assert(java.lang.Double.doubleToRawLongBits(f) ==
        java.lang.Double.doubleToRawLongBits(c), s"$f vs $c")
    }
    assert(got(1).getDouble(0) == 1.0)
    // zero-norm sides yield NULL (the composed form under ANSI throws,
    // and a NaN would outrank every real score)
    val zeros = Seq(
      (Array(0f, 0f), Array(1f, 1f)),
      (Array(0f), Array(0f))
    ).toDF("a", "b")
      .select(float_cosine(col("a"), col("b")).as("fused"))
      .collect()
    assert(zeros.forall(_.isNullAt(0)), zeros.mkString(","))
    // interpreted (non-codegen) path agrees too
    val e = graft.functions.FloatCosine(
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Array(1f, 2f), org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.FloatType)),
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Array(2f, 4f), org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.FloatType)))
    assert(math.abs(e.eval(null).asInstanceOf[Double] - 1.0) < 1e-15)
  }

  test("SQL registration: float_cosine callable from spark.sql") {
    graft.functions.registerAll(spark)
    val got = spark.sql(
      "SELECT float_cosine(array(cast(1 as float), cast(0 as float)), " +
        "array(cast(0 as float), cast(1 as float))) AS c")
      .collect().head.getDouble(0)
    assert(got == 0.0, got.toString)
  }
}
