package graft

import org.apache.spark.sql.functions.col
import org.apache.spark.unsafe.types.UTF8String

/** The native token-LCS expression: hand vectors, a naive-DP
  * cross-check on random token streams, interpreted/codegen parity,
  * SQL registration, and the loud cell cap.
  */
class TokenLcsSpec extends org.scalatest.funsuite.AnyFunSuite
    with SparkTestBase {

  private def u(s: String) = UTF8String.fromString(s)
  private def lcs(a: String, b: String): Int =
    graft.functions.TokenLcs.lcs(u(a), u(b))

  test("hand vectors: textbook ABCBDAB/BDCABA, identity, disjoint, " +
      "empty and blank sides, duplicate whitespace") {
    assert(lcs("a b c b d a b", "b d c a b a") == 4)
    assert(lcs("x y z", "x y z") == 3)
    assert(lcs("a b c", "d e f") == 0)
    assert(lcs("", "a b") == 0)
    assert(lcs("a b", "") == 0)
    // empty tokens from doubled spaces are dropped, not matched
    assert(lcs("a  b", "a b") == 2)
    // subsequence, not substring: gaps are free
    assert(lcs("the quick brown fox", "the fox") == 2)
  }

  test("equals a naive full-matrix DP on random token streams") {
    val rnd = new scala.util.Random(13)
    def naive(a: Array[String], b: Array[String]): Int = {
      val d = Array.ofDim[Int](a.length + 1, b.length + 1)
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) =
          if (a(i - 1) == b(j - 1)) d(i - 1)(j - 1) + 1
          else math.max(d(i - 1)(j), d(i)(j - 1))
      d(a.length)(b.length)
    }
    for (_ <- 1 to 300) {
      val a = Array.fill(rnd.nextInt(12))(s"t${rnd.nextInt(4)}")
      val b = Array.fill(rnd.nextInt(12))(s"t${rnd.nextInt(4)}")
      val got = lcs(a.mkString(" "), b.mkString(" "))
      val want = naive(a, b)
      assert(got == want, s"${a.toSeq} vs ${b.toSeq}: $got != $want")
      // LCS bounds and symmetry
      assert(got == lcs(b.mkString(" "), a.mkString(" ")))
      assert(got <= math.min(a.length, b.length))
    }
  }

  test("SQL registration and codegen path agree with the kernel; " +
      "nulls propagate") {
    val s2 = spark; import s2.implicits._
    graft.functions.registerAll(spark)
    assert(spark.sql("SELECT token_lcs('a b c b d a b', 'b d c a b a')")
      .head.getInt(0) == 4)
    val fx = Seq(("a b c", "a c"), (null, "a"), ("a", null))
      .toDF("x", "y")
    val got = fx.select(graft.functions.token_lcs(col("x"), col("y")))
      .collect()
    assert(got(0).getInt(0) == 2)
    assert(got(1).isNullAt(0) && got(2).isNullAt(0))
  }

  test("inputs past the DP cell cap fail loudly") {
    val long1 = Array.fill(3000)("w").mkString(" ")
    val e = intercept[IllegalArgumentException] {
      lcs(long1, long1)
    }
    assert(e.getMessage.contains("DP cap"))
  }
}
