package graft.text

/** The public Porter test vectors (word → stem, 5,751 pairs; the same
  * golden file PorterStemmerSpec pins the stemmer against), loaded from
  * the library classpath so BOTH the engine battery and its SQL oracle
  * can derive the one lookup table from the one artifact. Sorted by
  * word (unique — verified no duplicates) so the index assignment is a
  * total deterministic order; the oracle side receives (idx, word,
  * stem) as literal VALUES, so no engine ever re-derives the order.
  */
object PorterGolden {

  lazy val pairs: Vector[(String, String)] = {
    val in = getClass.getClassLoader
      .getResourceAsStream("graft/porter_golden.tsv")
    require(in != null, "graft/porter_golden.tsv missing from classpath")
    val src = scala.io.Source.fromInputStream(in, "UTF-8")
    try src.getLines().map { l =>
      val t = l.split("\t", 2)
      require(t.length == 2, s"malformed golden line: $l")
      (t(0), t(1))
    }.toVector.sortBy(_._1)
    finally src.close()
  }

  /** (idx, word, golden stem) VALUES rows for a SQL lookup CTE, quotes
    * escaped. */
  lazy val sqlValues: String =
    pairs.zipWithIndex.map { case ((w, s), i) =>
      s"($i, '${w.replace("'", "''")}', '${s.replace("'", "''")}')"
    }.mkString(", ")
}
