package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.text.PorterStemmer

/** Property-based checks (SURVEY §5.2): parser totality, aggregation
  * associativity, similarity identities — pure-Scala properties on the
  * oracle model (the distributed implementation is pinned to it by
  * PipelineSpec/ByteParitySpec, so properties proved here transfer).
  */
class PropertySpec extends AnyFunSuite {

  /** Run a ScalaCheck property under ScalaTest (the scalatestplus bridge
    * is not in the offline cache).
    */
  private def check(p: Prop): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(60), p)
    assert(res.passed, res.status.toString)
  }

  private def forAll[A](g: Gen[A])(f: A => Unit): Prop =
    Prop.forAll(g) { a => f(a); true }

  private def forAll[A, B](g1: Gen[A], g2: Gen[B])(f: (A, B) => Unit): Prop =
    Prop.forAll(g1, g2) { (a, b) => f(a, b); true }

  private val token: Gen[String] = for {
    w <- Gen.oneOf(Gen.alphaLowerStr.map(_.take(8)), Gen.const("run"),
      Gen.const("#"), Gen.const(""))
    pos <- Gen.oneOf("NN", "VB", "JJ", "#")
    dep <- Gen.oneOf("dobj", "nsubj", "dep", "prep")
    idx <- Gen.chooseNum(-2, 12)
  } yield s"$w/$pos/$dep/$idx"

  private val corpusLine: Gen[String] = for {
    head <- Gen.alphaLowerStr.map(w => if (w.isEmpty) "x" else w.take(6))
    toks <- Gen.listOfN(5, token)
    cnt <- Gen.chooseNum(-3L, 500L)
    junk <- Gen.oneOf("1999,1", "", "\t2000,2")
  } yield s"$head\t${toks.mkString(" ")}\t$cnt\t$junk"

  test("parser is total: never throws, every edge is well-formed") {
    check(forAll(Gen.listOf(Gen.oneOf(corpusLine, Gen.asciiPrintableStr))) { lines =>
      val edges = NaiveSemanticOracle.edges(lines)
      edges.foreach { e =>
        assert(e.cnt >= -3L)
        assert(e.feat.contains("-"))
      }
    })
  }

  test("count aggregation is partition-invariant (partial agg ≡ single agg)") {
    check(forAll(Gen.listOf(corpusLine), Gen.chooseNum(1, 7)) { (lines, nSplits) =>
      val whole = NaiveSemanticOracle.edges(lines)
        .groupMapReduce(e => (e.lex, e.feat))(_.cnt)(_ + _)
      // split edges arbitrarily, partially aggregate, then merge
      val parts = NaiveSemanticOracle.edges(lines).zipWithIndex
        .groupBy(_._2 % nSplits).values
        .map(_.map(_._1).groupMapReduce(e => (e.lex, e.feat))(_.cnt)(_ + _))
      val merged = parts.foldLeft(Map.empty[(String, String), Long]) {
        (acc, m) => m.foldLeft(acc) { case (a, (k, v)) =>
          a.updated(k, a.getOrElse(k, 0L) + v) }
      }
      assert(merged == whole)
    })
  }

  test("self-similarity identities: cosine=1, jaccard=1, dice=1, js=0, dist=0") {
    val posVec = Gen.nonEmptyListOf(Gen.chooseNum(1e-6, 1e6))
    check(forAll(posVec) { v =>
      val feats = v.indices.map(i => s"f$i")
      // corrected-mode accumulators over identical vectors
      var (man, dot, n1, n2, mn, mx, sm, js) = (0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0)
      feats.zip(v).foreach { case (_, x) =>
        man += math.abs(x - x); dot += x * x; n1 += x * x; n2 += x * x
        mn += math.min(x, x); mx += math.max(x, x); sm += 2 * x
        val mean = x
        js += x * math.log(x / mean) + x * math.log(x / mean)
      }
      assert(man == 0.0)
      assert(math.abs(dot / (math.sqrt(n1) * math.sqrt(n2)) - 1.0) < 1e-12)
      assert(math.abs(mn / mx - 1.0) < 1e-12)
      assert(math.abs(2 * mn / sm - 1.0) < 1e-12)
      assert(math.abs(js) < 1e-9)
    })
  }

  test("stemmer is idempotent-safe on its contract and never lengthens words") {
    check(forAll(Gen.alphaLowerStr.map(_.take(20))) { w =>
      val s = PorterStemmer.stem(w)
      assert(s.length <= math.max(w.length, 2))
      assert(s == s.toLowerCase)
      // non-alphabetic passthrough
      assert(PorterStemmer.stem(w + "9") == (w + "9"))
    })
  }

  test("chunk boundary arithmetic covers every token with exact overlaps") {
    // the integer formula TextAnalysis.chunk and its q101 oracle share:
    // nChunks = max(1, ceil((n - o) / stride)), chunk i = [i*stride,
    // min(i*stride + c, n)). Properties for ALL (n, c, o): never an empty
    // chunk, union covers [0, n) exactly, interior neighbors overlap by
    // exactly o, and the last chunk reaches n
    val gen = for {
      n <- Gen.chooseNum(1, 500)
      c <- Gen.chooseNum(1, 60)
      o <- Gen.chooseNum(0, 59).suchThat(_ < 60)
    } yield (n, c, math.min(o, c - 1))
    check(forAll(gen) { case (n, c, o) =>
      val stride = c - o
      val nChunks = math.max(1L, (n.toLong - o + stride - 1) / stride)
      val pieces = (0L until nChunks).map { i =>
        val s = i * stride
        (s, math.min(s + c, n.toLong))
      }
      pieces.foreach { case (s, e) => assert(e > s, s"empty chunk at $s") }
      assert(pieces.head._1 == 0 && pieces.last._2 == n)
      pieces.sliding(2).foreach {
        case Seq((_, e1), (s2, _)) =>
          assert(e1 - s2 >= o, s"gap: n=$n c=$c o=$o")
          // interior chunks are full-length, so the overlap is exactly o
          if (e1 - s2 != o) assert(e1 == n)
        case _ =>
      }
    })
  }

  test("weighted-sample predicate: monotone in weight, exact at the cap") {
    // u * cap < min(w, cap) * rate — the IEEE expression Sampling
    // .weightedSample and its oracle share. Monotonicity in w means a
    // heavier row is never dropped where a lighter one survives (same
    // draw); at w >= cap the inclusion probability is exactly `rate`.
    val gen = for {
      k <- Gen.chooseNum(0, 65535)
      w1 <- Gen.chooseNum(0L, 200L)
      w2 <- Gen.chooseNum(0L, 200L)
      rate <- Gen.oneOf(0.0, 0.1, 0.3, 0.5, 1.0)
    } yield (k / 65536.0, math.min(w1, w2), math.max(w1, w2), rate)
    val cap = 64.0
    def keep(u: Double, w: Long, rate: Double): Boolean =
      u * cap < math.min(w.toDouble, cap) * rate
    check(forAll(gen) { case (u, lo, hi, rate) =>
      if (keep(u, lo, rate)) assert(keep(u, hi, rate), "monotonicity")
      if (lo >= 64 && hi >= 64)
        assert(keep(u, lo, rate) == keep(u, hi, rate))
      // above the cap the test degenerates to u < rate exactly
      if (hi >= 64) assert(keep(u, hi, rate) == (u * cap < cap * rate))
      if (rate == 0.0) assert(!keep(u, hi, rate))
    })
  }

  test("NN resize invariants: dims formula, normalized histogram, " +
      "idempotence past the fit point") {
    import graft.ops.Multimodal
    val gen = for {
      w <- Gen.chooseNum(1, 40)
      h <- Gen.chooseNum(1, 40)
      maxSide <- Gen.chooseNum(1, 48)
      pix <- Gen.listOfN(w * h, Gen.chooseNum(0, 255))
    } yield (w, h, maxSide, pix.map(_.toByte).toArray)
    check(forAll(gen) { case (w, h, maxSide, gray) =>
      val png = Multimodal.encodeGrayAsRgbPng(gray, w, h)
      val out = Multimodal.resizeOne(png, maxSide).get
      val m = Multimodal.decodeImage(0L, out).get
      val mx = math.max(w, h)
      if (mx <= maxSide) {
        // fits already: byte-identical pass-through
        assert(out.sameElements(png))
        assert(m.width == w && m.height == h)
      } else {
        // the pinned integer dims formula, floor with a 1-pixel floor
        assert(m.width == math.max(1, w * maxSide / mx))
        assert(m.height == math.max(1, h * maxSide / mx))
        // resized output FITS, so resizing again is a no-op (idempotence)
        assert(Multimodal.resizeOne(out, maxSide).get.sameElements(out))
      }
      assert(math.abs(m.histogram.sum - 1.0) < 1e-9)
    })
  }

  test("token_ngram_clip kernel: symmetric (Σ min is), identity = own " +
      "gram count, bounded by both sides") {
    import org.apache.spark.unsafe.types.UTF8String.{fromString => u}
    val stream = Gen.chooseNum(0, 40).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf("a", "b", "c", "d")).map(_.mkString(" ")))
    check(forAll(stream, stream) { (c, r) =>
      for (n <- 1 to 3) {
        val cr = graft.functions.TokenNgramClip.clip(u(c), u(r), n)
        val rc = graft.functions.TokenNgramClip.clip(u(r), u(c), n)
        assert(cr == rc, s"symmetry n=$n '$c' '$r'")
        def g(s: String) =
          math.max(0, s.split(" ").count(_.nonEmpty) - n + 1)
        assert(cr <= math.min(g(c), g(r)))
        assert(graft.functions.TokenNgramClip.clip(u(c), u(c), n) == g(c))
      }
    })
  }

  test("BpeEncode kernel: the encoded symbols always reassemble the " +
      "word, for ANY merge table") {
    import org.apache.spark.unsafe.types.UTF8String.{fromString => u}
    val word = Gen.chooseNum(0, 16).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf("a", "b", "c")).map(_.mkString))
    val table = Gen.chooseNum(0, 8).flatMap(n => Gen.listOfN(n, for {
      a <- Gen.oneOf("a", "b", "c", "ab", "bc", "abc")
      b <- Gen.oneOf("a", "b", "c", "ab", "ca")
    } yield (a, b)))
    check(forAll(word, table) { (w, merges) =>
      if (merges.nonEmpty) {
        val enc = graft.functions.BpeEncode(
          org.apache.spark.sql.catalyst.expressions.Literal(w), merges)
        val syms = enc.encode(u(w)).toArray[AnyRef](
          org.apache.spark.sql.types.StringType).map(_.toString)
        assert(syms.mkString == w, s"'$w' via $merges -> ${syms.toSeq}")
        assert(syms.forall(_.nonEmpty))
      }
    })
  }

  test("MultiReplace kernel: with a token outside the pattern alphabet, " +
      "no pattern survives the redaction, and the pass is idempotent") {
    import org.apache.spark.unsafe.types.UTF8String.{fromString => u}
    val text = Gen.chooseNum(0, 50).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf('a', 'b', 'c')).map(_.mkString))
    val pats = Gen.chooseNum(1, 6).flatMap(n => Gen.listOfN(n,
      Gen.chooseNum(1, 3).flatMap(m =>
        Gen.listOfN(m, Gen.oneOf('a', 'b', 'c')).map(_.mkString))))
    check(forAll(text, pats) { (t, ps) =>
      val e = graft.functions.MultiReplace(
        org.apache.spark.sql.catalyst.expressions.Literal(t), ps, "§")
      val once = e.replaceAll(u(t)).toString
      assert(!ps.exists(once.contains), s"'$t' $ps -> '$once'")
      assert(e.replaceAll(u(once)).toString == once, "idempotent")
    })
  }

  test("gold parser keeps exactly 3-field lines, label case-insensitively") {
    check(forAll(Gen.listOf(Gen.oneOf(
      Gen.const("alpha beta True"), Gen.const("a  b FALSE"),
      Gen.const("too many fields here x"), Gen.const("short one"),
      Gen.asciiPrintableStr))) { lines =>
      val parsed = NaiveSemanticOracle.gold(lines)
      // exactly the 3-field-after-\s+-split lines survive — including the
      // reference quirk that a LEADING-whitespace line splits to
      // ["", w1, w2] and yields an empty first word (Step4.java:97-106)
      assert(parsed.size == lines.count(_.split("\\s+").length == 3))
      parsed.foreach { case (_, _, rel) => assert(rel == true || rel == false) }
    })
  }

  test("hilbert kernel properties: bijection + unit-step adjacency at " +
      "random bit widths; locality — an index range's bounding box " +
      "area never exceeds ~4x the range length") {
    check(forAll(Gen.chooseNum(1, 6)) { bits =>
      val n = 1 << bits
      val m = (for (x <- 0L until n; y <- 0L until n)
        yield graft.functions.HilbertIndex.compute(x, y, bits) -> (x, y))
        .toMap
      assert(m.keySet == (0L until n.toLong * n).toSet)
      for (d <- 0L until n.toLong * n - 1) {
        val (x1, y1) = m(d)
        val (x2, y2) = m(d + 1)
        assert(math.abs(x1 - x2) + math.abs(y1 - y2) == 1)
      }
    })
    // the locality bound that justifies Hilbert over Z for file cuts:
    // any contiguous index range of length L covers a bounding box of
    // area <= ~4L (the classic Hilbert locality constant); Z-order has
    // ranges whose box area is O(L^2) across quadrant seams
    val bits = 5
    val n = 1 << bits
    val m = (for (x <- 0L until n; y <- 0L until n)
      yield graft.functions.HilbertIndex.compute(x, y, bits) -> (x, y))
      .toMap
    check(forAll(Gen.chooseNum(0L, n.toLong * n - 64),
        Gen.chooseNum(4, 63)) { (start, len) =>
      val pts = (start until math.min(start + len, n.toLong * n)).map(m)
      val w = pts.map(_._1).max - pts.map(_._1).min + 1
      val h = pts.map(_._2).max - pts.map(_._2).min + 1
      assert(w * h <= 4L * pts.length + 8,
        s"range [$start, +${pts.length}) box ${w}x$h")
    })
  }

  test("OLS fit algebra: recovers an exact line, r2 = 1; permutation " +
      "of points cannot move the sums") {
    check(forAll(Gen.chooseNum(-50, 50), Gen.chooseNum(-20, 20),
      ) { (a, b) =>
      // y = a/10 x + b over x = 1..6: closed-form OLS must return the
      // exact coefficients (the zipfFit/heapsFit shared algebra, run on
      // the same power sums the engine aggregates)
      val xs = (1 to 6).map(_.toDouble)
      val ys = xs.map(x => a / 10.0 * x + b)
      val n = xs.length.toDouble
      val (sx, sy) = (xs.sum, ys.sum)
      val sxx = xs.map(x => x * x).sum
      val sxy = xs.zip(ys).map { case (x, y) => x * y }.sum
      val slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
      assert(math.abs(slope - a / 10.0) < 1e-9)
      assert(math.abs((sy - slope * sx) / n - b) < 1e-9)
    })
  }
}
