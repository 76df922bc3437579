package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.jaro_winkler

/** [[graft.functions.JaroWinkler]]: canonical comparator vectors (values
  * probed from DuckDB's jaro_winkler_similarity so the q242 oracle can
  * hash-compare), codegen/interpreted parity, null propagation, and the
  * SQL registration path.
  */
class JaroWinklerSpec extends AnyFunSuite with SparkTestBase {

  private val eps = 1e-12

  // (a, b, expected) — expected values are DuckDB probes
  private val vectors = Seq(
    ("MARTHA", "MARHTA", 0.9611111111111111), // classic transposition
    ("DIXON", "DICKSONX", 0.8133333333333332), // classic, boost applied
    ("JELLYFISH", "SMELLYFISH", 0.8962962962962964), // >0.7, no prefix
    ("CRATE", "TRACE", 0.7333333333333334), // >0.7, prefix 0
    ("TRATE", "TRACE", 0.9066666666666667), // prefix 3 boost
    ("aaa", "aaa aaa", 0.8666666666666668), // prefix cap interacts
    ("abcdexyzzz", "abcdeqqqqq", 0.6666666666666666), // <=0.7: NO boost
    ("abcdef", "abzzzz", 0.5555555555555555),
    ("abc", "abc", 1.0),
    ("a", "a", 1.0),
    ("a", "b", 0.0),
    ("", "a", 0.0),
    ("a", "", 0.0),
    ("", "", 0.0)) // DuckDB convention: empty side -> 0, even both

  test("canonical vectors match the DuckDB comparator bit-for-bit") {
    val s2 = spark; import s2.implicits._
    val got = vectors.map { case (a, b, _) => (a, b) }
      .toDF("a", "b")
      .select(col("a"), col("b"), jaro_winkler(col("a"), col("b")))
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    for ((a, b, exp) <- vectors)
      assert(math.abs(got((a, b)) - exp) < eps, s"($a, $b)")
  }

  test("interpreted eval equals codegen; nulls propagate; SQL " +
      "registration works") {
    val s2 = spark; import s2.implicits._
    // force the interpreted path through the kernel directly
    for ((a, b, exp) <- vectors)
      assert(math.abs(graft.functions.JaroWinkler.sim(
        org.apache.spark.unsafe.types.UTF8String.fromString(a),
        org.apache.spark.unsafe.types.UTF8String.fromString(b)) - exp)
        < eps, s"($a, $b)")
    val withNull = Seq(("x", Option("y")), ("x", None))
      .toDF("a", "b")
      .select(jaro_winkler(col("a"), col("b")).as("jw")).collect()
    assert(!withNull(0).isNullAt(0) && withNull(1).isNullAt(0))
    graft.functions.registerAll(spark)
    val viaSql = spark.sql(
      "SELECT jaro_winkler('MARTHA', 'MARHTA') AS jw").head.getDouble(0)
    assert(math.abs(viaSql - 0.9611111111111111) < eps)
  }

  test("symmetry on random-ish pairs") {
    val s2 = spark; import s2.implicits._
    val pairs = Seq(("kitten", "sitting"), ("flaw", "lawn"),
      ("graft", "craft"), ("spark", "sparse"), ("abcd", "dcba"))
    val df = pairs.toDF("a", "b")
      .select(jaro_winkler(col("a"), col("b")).as("ab"),
        jaro_winkler(col("b"), col("a")).as("ba"))
      .collect()
    df.foreach(r => assert(r.getDouble(0) == r.getDouble(1)))
  }
}
