package graft

import scala.io.Source
import org.scalatest.funsuite.AnyFunSuite
import graft.text.PorterStemmer

/** Golden-vector test: `porter_golden.tsv` holds word→stem pairs produced by
  * the reference implementation (`Stemmer.java:367-379`) over the full
  * gold-standard vocabulary (14,547 pairs' words) plus the reference demo
  * list (`Stemmer.java:444`) and parser stressors.
  */
class PorterStemmerSpec extends AnyFunSuite {

  test("matches reference stemmer on 5.7k golden vectors") {
    val src = Source.fromResource("graft/porter_golden.tsv")
    val rows = try src.getLines().toVector finally src.close()
    assert(rows.size > 5000)
    val bad = rows.flatMap { line =>
      val Array(w, expect) = line.split("\t", -1)
      val got = PorterStemmer.stem(w)
      if (got != expect) Some(s"$w: got=$got want=$expect") else None
    }
    assert(bad.isEmpty, s"${bad.size} mismatches, first 20:\n${bad.take(20).mkString("\n")}")
  }

  test("reference demo list (Stemmer.java:444)") {
    assert(PorterStemmer.stem("bounds") == "bound")
    assert(PorterStemmer.stem("abused") == "abus")
    assert(PorterStemmer.stem("test/") == "test/") // non-alphabetic passthrough
    assert(PorterStemmer.stem("testing") == "test")
    assert(PorterStemmer.stem("Worked") == "work") // lowercased first
  }

  test("short and degenerate inputs") {
    assert(PorterStemmer.stem("") == "")
    assert(PorterStemmer.stem("a") == "a")
    assert(PorterStemmer.stem("be") == "be")
    assert(PorterStemmer.stem("A1") == "a1")
  }
}
