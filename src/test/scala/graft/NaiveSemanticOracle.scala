package graft

import graft.text.PorterStemmer.stem

/** Independent, naive in-memory re-derivation of the semantic-similarity
  * pipeline semantics (SURVEY.md §2 / FIXTURES.md §3), used as a
  * differential oracle for the distributed implementation. Deliberately
  * written with plain Scala collections and per-pair loops — it shares no
  * code or structure with `graft.pipeline`.
  */
object NaiveSemanticOracle {

  final case class Edge(lex: String, feat: String, cnt: Long)

  def edges(lines: Seq[String]): Seq[Edge] = lines.flatMap { line =>
    val f = line.split("\t") // Java semantics: trailing empties dropped
    if (f.length < 4) Nil
    else {
      val cnt = f(2).toLongOption
      if (cnt.isEmpty) Nil
      else {
        val toks = f(1).split(" ")
        toks.toSeq.flatMap { t =>
          val p = t.split("/")
          if (p.length != 4) Nil
          else {
            p(3).toIntOption match {
              case Some(h) if h >= 1 && h <= toks.length =>
                val lex = stem(toks(h - 1).split("/")(0))
                Seq(Edge(lex, stem(p(0)) + "-" + p(2), cnt.get))
              case _ => Nil
            }
          }
        }
      }
    }
  }

  /** (lexeme, feature) -> [freq, prob, pmi, ttest] */
  def assoc(lines: Seq[String]): Map[(String, String), Array[Double]] = {
    val es = edges(lines)
    val lfm = es.groupMapReduce(e => (e.lex, e.feat))(_.cnt)(_ + _)
    val lm = lfm.groupMapReduce(_._1._1)(_._2)(_ + _)
    val fm = lfm.groupMapReduce(_._1._2)(_._2)(_ + _)
    val bigL = es.map(_.cnt).sum.toDouble
    val bigF = bigL
    lfm.map { case ((x, y), c) =>
      val lf = c.toDouble
      val l = lm(x).toDouble
      val f = fm(y).toDouble
      (x, y) -> Array(
        lf,
        lf / l,
        (bigF * lf) / (l * f),
        ((lf / bigL) - ((l / bigL) * (f / bigF))) / math.sqrt((l / bigL) * (f / bigF)))
    }
  }

  def gold(lines: Seq[String]): Seq[(String, String, Boolean)] =
    lines.flatMap { ln =>
      val p = ln.split("\\s+")
      if (p.length != 3) None
      else Some((stem(p(0)), stem(p(1)), p(2).equalsIgnoreCase("true")))
    }

  /** (w1, w2, related) -> 24-dim vector in measure-major, metric-minor
    * order (manhattan, euclidean, cosine, jaccard, dice, js per measure).
    */
  def vectors(
      corpusLines: Seq[String],
      goldLines: Seq[String],
      faithful: Boolean): Map[(String, String, Boolean), Array[Double]] = {
    val a = assoc(corpusLines)
    val byLex: Map[String, Map[String, Array[Double]]] =
      a.groupBy(_._1._1).map { case (k, m) =>
        k -> m.map { case ((_, ft), v) => ft -> v }
      }
    gold(goldLines).distinct.flatMap { case (w1, w2, rel) =>
      val m1 = byLex.getOrElse(w1, Map.empty)
      val m2 = byLex.getOrElse(w2, Map.empty)
      val feats = (m1.keySet ++ m2.keySet).toSeq.sorted
      if (feats.isEmpty) None
      else {
        val man, euc, dot, n1, n2, mn, mx, sm, js1, js2 = new Array[Double](4)
        for (ft <- feats; i <- 0 until 4) {
          val v1 = m1.get(ft).map(_(i)).getOrElse(0.0)
          val v2 = m2.get(ft).map(_(i)).getOrElse(0.0)
          man(i) += math.abs(v1 - v2)
          euc(i) += (if (faithful) (v1 + v2) * (v1 + v2) else (v1 - v2) * (v1 - v2))
          dot(i) += v1 * v2
          n1(i) += v1 * v1
          n2(i) += v2 * v2
          mn(i) += math.min(v1, v2)
          mx(i) += math.max(v1, v2)
          sm(i) += v1 + v2
          val mean = (v1 + v2) / 2.0
          if (faithful && v1 == 0.0 && v2 == 0.0) {
            js1(i) = 0.0; js2(i) = 0.0
          } else {
            if (v1 > 0 && mean > 0) js1(i) += v1 * math.log(v1 / mean)
            if (v2 > 0 && mean > 0) js2(i) += v2 * math.log(v2 / mean)
          }
        }
        val out = new Array[Double](24)
        for (i <- 0 until 4) {
          out(i * 6 + 0) = if (man(i).isNaN) Double.PositiveInfinity else man(i)
          out(i * 6 + 1) =
            if (euc(i) < 0 || euc(i).isNaN) Double.PositiveInfinity else math.sqrt(euc(i))
          val cos = dot(i) / (math.sqrt(n1(i)) * math.sqrt(n2(i)))
          out(i * 6 + 2) = if (n1(i) <= 0 || n2(i) <= 0 || cos.isNaN) 0.0 else cos
          val jac = mn(i) / mx(i)
          out(i * 6 + 3) = if (mx(i) == 0 || jac.isNaN) 0.0 else jac
          val dice = 2 * mn(i) / sm(i)
          out(i * 6 + 4) = if (sm(i) == 0 || dice.isNaN) 0.0 else dice
          val js = js1(i) + js2(i)
          out(i * 6 + 5) = if (js.isNaN) Double.PositiveInfinity else js
        }
        Some((w1, w2, rel) -> out)
      }
    }.toMap
  }
}
