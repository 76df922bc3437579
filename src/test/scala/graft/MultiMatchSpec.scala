package graft

import org.apache.spark.sql.functions.col
import org.apache.spark.unsafe.types.UTF8String

/** The native Aho–Corasick blocklist matcher: the classic he/she/his/
  * hers automaton, nesting/overlap vectors, a naive contains
  * cross-check on random strings, multi-byte UTF-8, null propagation,
  * and the Column path.
  */
class MultiMatchSpec extends org.scalatest.funsuite.AnyFunSuite
    with SparkTestBase {

  private def hits(text: String, pats: Seq[String]): Seq[Int] = {
    val e = graft.functions.MultiMatch(
      org.apache.spark.sql.catalyst.expressions.Literal(text), pats)
    e.matches(UTF8String.fromString(text)).toIntArray().toSeq
  }

  test("classic he/she/his/hers automaton and nested patterns") {
    val pats = Seq("he", "she", "his", "hers")
    assert(hits("ushers", pats) == Seq(0, 1, 3))
    assert(hits("his hers", pats) == Seq(0, 2, 3))
    assert(hits("xyz", pats) == Seq())
    // nesting: a pattern inside another reports both
    assert(hits("table part", Seq("table", "table part", "part"))
      == Seq(0, 1, 2))
    // overlap across positions
    assert(hits("abc", Seq("ab", "b", "bc")) == Seq(0, 1, 2))
    // duplicate patterns both report
    assert(hits("aa", Seq("a", "a")) == Seq(0, 1))
    // multi-byte UTF-8 phrases
    assert(hits("héllo wörld", Seq("éll", "wör", "xé")) == Seq(0, 1))
  }

  test("equals the naive per-pattern contains on random strings") {
    val rnd = new scala.util.Random(31)
    val alphabet = "abcd"
    def randStr(n: Int) =
      (1 to n).map(_ => alphabet(rnd.nextInt(4))).mkString
    for (_ <- 1 to 200) {
      val text = randStr(rnd.nextInt(60) + 1)
      val pats = (1 to rnd.nextInt(8) + 1)
        .map(_ => randStr(rnd.nextInt(4) + 1))
      val naive = pats.zipWithIndex
        .collect { case (p, i) if text.contains(p) => i }
      assert(hits(text, pats) == naive, s"text=$text pats=$pats")
    }
  }

  test("multi_replace: leftmost-longest non-overlapping redaction, " +
      "consumed overlaps, preexisting-token arithmetic") {
    def red(text: String, pats: Seq[String], tok: String = "<X>") =
      graft.functions.MultiReplace(
        org.apache.spark.sql.catalyst.expressions.Literal(text), pats, tok)
        .replaceAll(UTF8String.fromString(text)).toString
    // longest at the leftmost position wins
    assert(red("table part x", Seq("table", "table part"))
      == "<X> x")
    // a later-starting longer match loses to the leftmost one
    assert(red("ab bcd", Seq("ab", "b bcd")) == "<X> bcd")
    // matches inside a replaced span are consumed
    assert(red("abc", Seq("abc", "b")) == "<X>")
    // non-overlapping repeats all replace; scan resumes after match
    assert(red("aa aa aa", Seq("aa")) == "<X> <X> <X>")
    assert(red("aaa", Seq("aa")) == "<X>a")
    // untouched text returns as-is
    assert(red("clean text", Seq("zz")) == "clean text")
    // multi-byte patterns
    assert(red("héllo wörld", Seq("éllo"), "#") == "h# wörld")
    // count arithmetic survives preexisting tokens
    val s2 = spark; import s2.implicits._
    val fx = Seq((1L, "keep <X> and aa"), (2L, "aa aa"), (3L, "none"))
      .toDF("doc_id", "text")
    val got = graft.ops.Curation.redactBlocklist(fx, Seq("aa"), "<X>")
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2)))
      .toMap
    assert(got(1L) == (("keep <X> and <X>", 1L)))
    assert(got(2L) == (("<X> <X>", 2L)))
    assert(got(3L) == (("none", 0L)))
  }

  test("Column path through a real plan; null text propagates; empty " +
      "pattern lists rejected") {
    val s2 = spark; import s2.implicits._
    val fx = Seq((1L, Some("the fast table scan")), (2L, None))
      .toDF("id", "text")
    val got = fx.select(col("id"),
        graft.functions.multi_match(col("text"),
          Seq("fast table", "scan", "missing")).as("m"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) null else r.getSeq[Int](1))).toMap
    assert(got(1L) == Seq(0, 1) && got(2L) == null)
    intercept[IllegalArgumentException](
      graft.functions.MultiMatch(
        org.apache.spark.sql.catalyst.expressions.Literal("x"), Seq.empty))
    intercept[IllegalArgumentException](
      graft.functions.MultiMatch(
        org.apache.spark.sql.catalyst.expressions.Literal("x"), Seq("")))
  }
}
