package graft

import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.unsafe.types.UTF8String

/** The native clipped n-gram counter: hand vectors, a naive quadratic
  * cross-check on random token streams, interpreted/codegen + SQL
  * parity, and null/edge behavior.
  */
class TokenNgramClipSpec extends org.scalatest.funsuite.AnyFunSuite
    with SparkTestBase {

  private def u(s: String) = UTF8String.fromString(s)
  private def clip(c: String, r: String, n: Int): Long =
    graft.functions.TokenNgramClip.clip(u(c), u(r), n)

  test("hand vectors: clipping, duplicates, identity, disjoint, empty " +
      "and short sides, doubled whitespace") {
    // the classic clip case: 'the the the' vs a ref with two 'the'
    assert(clip("the the the the", "the cat on the mat", 1) == 2L)
    assert(clip("a b c", "a b c", 1) == 3L)
    assert(clip("a b c", "a b c", 2) == 2L)
    assert(clip("a b c", "a b c", 3) == 1L)
    assert(clip("a b c", "x y z", 1) == 0L)
    assert(clip("", "a b", 1) == 0L)
    assert(clip("a b", "", 1) == 0L)
    assert(clip("a", "a b", 2) == 0L) // cand shorter than n
    // doubled spaces drop empty tokens: 'a  b' bigram is (a b)
    assert(clip("a  b", "a b", 2) == 1L)
    // bigram overlap with repetition: cand (a b)(b a)(a b), ref has
    // two (a b) and one (b a) -> all three clip in
    assert(clip("a b a b", "a b a b", 2) == 3L)
    // but a ref with ONE (a b) clips the two candidate (a b)s to 1
    assert(clip("a b c a b", "a b x", 2) == 1L)
  }

  test("equals the naive quadratic Σ min(count_cand, count_ref) on " +
      "random token streams") {
    val rnd = new scala.util.Random(17)
    def naive(c: Array[String], r: Array[String], n: Int): Long = {
      def grams(t: Array[String]) =
        if (t.length < n) Seq.empty
        else (0 to t.length - n).map(i => t.slice(i, i + n).mkString(" "))
      val cg = grams(c)
      val rg = grams(r).groupBy(identity).view.mapValues(_.size)
      cg.groupBy(identity).map { case (g, occ) =>
        math.min(occ.size, rg.getOrElse(g, 0)).toLong
      }.sum
    }
    for (_ <- 1 to 300) {
      val vocab = Array("a", "b", "c", "d")
      def stream() = Array.fill(rnd.nextInt(30))(vocab(rnd.nextInt(4)))
      val (c, r) = (stream(), stream())
      for (n <- 1 to 4)
        assert(clip(c.mkString(" "), r.mkString(" "), n) == naive(c, r, n),
          s"n=$n c=${c.mkString(" ")} r=${r.mkString(" ")}")
    }
  }

  test("SQL registration and codegen path agree with the kernel; " +
      "nulls propagate; n < 1 fails loudly") {
    val s2 = spark; import s2.implicits._
    graft.functions.registerAll(spark)
    val fx = Seq(("a b a b", "a b a b"), ("x", "y")).toDF("c", "r")
    val viaCol = fx.select(
      graft.functions.token_ngram_clip(col("c"), col("r"), lit(2)))
      .collect().map(_.getLong(0)).toSeq
    assert(viaCol == Seq(3L, 0L))
    fx.createOrReplaceTempView("tncv")
    val viaSql = spark.sql(
      "SELECT token_ngram_clip(c, r, 2) FROM tncv")
      .collect().map(_.getLong(0)).toSeq
    assert(viaSql == viaCol)
    val withNull = Seq((Some("a b"), None: Option[String])).toDF("c", "r")
    assert(withNull.select(graft.functions.token_ngram_clip(
      col("c"), col("r"), lit(1))).collect().head.isNullAt(0))
    intercept[Exception](fx.select(graft.functions.token_ngram_clip(
      col("c"), col("r"), lit(0))).collect())
  }
}
