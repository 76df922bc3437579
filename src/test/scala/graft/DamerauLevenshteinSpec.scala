package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.damerau_levenshtein

/** [[graft.functions.DamerauLevenshtein]]: canonical vectors probed from
  * DuckDB's `damerau_levenshtein` (so the q257 oracle hash-compares),
  * the unrestricted-vs-OSA pin, byte-wise semantics on multi-byte
  * codepoints, codegen/interpreted parity, null propagation, the
  * triangle inequality (which OSA famously violates), and the SQL
  * registration path.
  */
class DamerauLevenshteinSpec extends AnyFunSuite with SparkTestBase {

  // (a, b, expected) — expected values are DuckDB probes
  private val vectors = Seq(
    ("ca", "abc", 2), // THE unrestricted pin: OSA would say 3
    ("abc", "ca", 2), // and its mirror
    ("ab", "ba", 1), // single adjacent transposition
    ("abcd", "acbd", 1), // interior transposition
    ("abcdef", "abcfad", 3),
    ("kitten", "sitting", 3), // plain Levenshtein agrees
    ("aab", "aba", 1),
    ("xaby", "xbay", 1),
    ("", "a", 1), // empty side -> |other|
    ("a", "", 1),
    ("", "", 0),
    ("same", "same", 0),
    // byte-wise: é is 2 UTF-8 bytes, a 3-byte CJK swap costs 6
    ("héllo", "hello", 2),
    ("日本語", "日語本", 6))

  test("canonical vectors match DuckDB; unrestricted variant pinned") {
    val s2 = spark; import s2.implicits._
    val got = vectors.map { case (a, b, _) => (a, b) }
      .toDF("a", "b")
      .select(col("a"), col("b"), damerau_levenshtein(col("a"), col("b")))
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getInt(2)).toMap
    for ((a, b, exp) <- vectors)
      assert(got((a, b)) == exp, s"($a, $b): got ${got((a, b))}, want $exp")
  }

  test("interpreted kernel equals codegen path; nulls propagate; SQL " +
      "registration works") {
    val s2 = spark; import s2.implicits._
    for ((a, b, exp) <- vectors)
      assert(graft.functions.DamerauLevenshtein.dist(
        org.apache.spark.unsafe.types.UTF8String.fromString(a),
        org.apache.spark.unsafe.types.UTF8String.fromString(b)) == exp,
        s"($a, $b)")
    val withNull = Seq(("x", Option("y")), ("x", None))
      .toDF("a", "b")
      .select(damerau_levenshtein(col("a"), col("b")).as("d")).collect()
    assert(!withNull(0).isNullAt(0) && withNull(1).isNullAt(0))
    graft.functions.registerAll(spark)
    assert(spark.sql("SELECT damerau_levenshtein('ca', 'abc') AS d")
      .head.getInt(0) == 2)
  }

  test("symmetry, triangle inequality, and bounds on random pairs") {
    val rnd = new scala.util.Random(42)
    def word(): String =
      (0 until rnd.nextInt(9)).map(_ => ('a' + rnd.nextInt(5)).toChar)
        .mkString
    def d(a: String, b: String): Int =
      graft.functions.DamerauLevenshtein.dist(
        org.apache.spark.unsafe.types.UTF8String.fromString(a),
        org.apache.spark.unsafe.types.UTF8String.fromString(b))
    for (_ <- 1 to 500) {
      val (a, b, c) = (word(), word(), word())
      val (ab, ba, ac, cb) = (d(a, b), d(b, a), d(a, c), d(c, b))
      assert(ab == ba, s"symmetry: $a $b")
      // full DL is a metric (OSA is not: OSA('ca','abc')=3 > 1+1)
      assert(ab <= ac + cb, s"triangle: $a $b via $c")
      assert(ab <= math.max(a.length, b.length))
      assert(ab >= math.abs(a.length - b.length))
      assert((ab == 0) == (a == b))
    }
  }

  test("inputs past the matrix cap fail loudly instead of allocating " +
      "a multi-GB matrix (document column by mistake)") {
    def u(s: String) =
      org.apache.spark.unsafe.types.UTF8String.fromString(s)
    val long1 = "a" * 3000
    val long2 = "b" * 3000
    val e = intercept[IllegalArgumentException] {
      graft.functions.DamerauLevenshtein.dist(u(long1), u(long2))
    }
    assert(e.getMessage.contains("matrix cap"))
    // just under the cap still computes (2046*2 cells per side)
    assert(graft.functions.DamerauLevenshtein.dist(
      u("a" * 2000), u("ab")) == 1999)
  }
}
