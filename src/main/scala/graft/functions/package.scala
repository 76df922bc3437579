package graft

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.graftshim.Bridge

/** Column-level entry points for graft's native expressions. */
package object functions {

  private[graft] def toColumn(e: Expression): Column = Bridge.column(e)
  private[graft] def toExpr(c: Column): Expression = Bridge.expression(c)

  /** Porter-stem a string column (lowercases; non-`[a-z]+` pass through). */
  def porter_stem(c: Column): Column = toColumn(PorterStem(toExpr(c)))

  /** Native codegen'd dot product of two `array<float>` columns. */
  def float_dot(a: Column, b: Column): Column =
    toColumn(FloatDot(toExpr(a), toExpr(b)))

  /** Unicode NFC canonical composition of a string column. */
  def nfc_normalize(c: Column): Column = toColumn(NfcNormalize(toExpr(c)))

  /** Fused cosine of two `array<float>` columns: one array pass for
    * dot + both norms; bit-identical to
    * `float_dot(a,b)/(sqrt(float_dot(a,a))*sqrt(float_dot(b,b)))`.
    */
  def float_cosine(a: Column, b: Column): Column =
    toColumn(FloatCosine(toExpr(a), toExpr(b)))

  /** Jaro-Winkler similarity of two string columns (RapidFuzz/DuckDB
    * semantics; see [[JaroWinkler]]).
    */
  def jaro_winkler(a: Column, b: Column): Column =
    toColumn(JaroWinkler(toExpr(a), toExpr(b)))

  /** Full (unrestricted) Damerau-Levenshtein distance of two string
    * columns (byte-wise DuckDB semantics; see [[DamerauLevenshtein]]).
    */
  def damerau_levenshtein(a: Column, b: Column): Column =
    toColumn(DamerauLevenshtein(toExpr(a), toExpr(b)))

  /** Longest common TOKEN subsequence length of two string columns
    * (whitespace tokens; the ROUGE-L core — see [[TokenLcs]]).
    */
  def token_lcs(a: Column, b: Column): Column =
    toColumn(TokenLcs(toExpr(a), toExpr(b)))

  /** Clipped n-gram match count Σ min(count_cand, count_ref) over
    * whitespace-token n-grams (the BLEU numerator — see
    * [[TokenNgramClip]]).
    */
  def token_ngram_clip(cand: Column, ref: Column, n: Column): Column =
    toColumn(TokenNgramClip(toExpr(cand), toExpr(ref), toExpr(n)))

  /** 2-D Hilbert curve index of two already-normalized long columns in
    * [0, 2^bits) (the locality-superior clustering key — see
    * [[HilbertIndex]]).
    */
  def hilbert_index(x: Column, y: Column, bits: Int): Column =
    toColumn(HilbertIndex(toExpr(x), toExpr(y), bits))

  /** Apply a trained BPE merge table to a word column (sequential
    * greedy passes in table order — see [[BpeEncode]]). The table is a
    * driver-side artifact, so this takes a Scala Seq, not a Column;
    * no SQL registration (SQL has no clean spelling for the bounded
    * tokenizer artifact — use the Column API).
    */
  def bpe_encode(word: Column, merges: Seq[(String, String)]): Column =
    toColumn(BpeEncode(toExpr(word), merges))

  /** Distinct 0-based indices of the blocklist `patterns` occurring as
    * substrings of the text column, via one Aho–Corasick pass (see
    * [[MultiMatch]]). The pattern list is a driver-side artifact, so
    * this takes a Scala Seq, not a Column; no SQL registration.
    */
  def multi_match(text: Column, patterns: Seq[String]): Column =
    toColumn(MultiMatch(toExpr(text), patterns))

  /** Replace every leftmost-longest non-overlapping blocklist
    * occurrence with `token` in one Aho–Corasick pass (see
    * [[MultiReplace]]).
    */
  def multi_replace(text: Column, patterns: Seq[String],
      token: String): Column =
    toColumn(MultiReplace(toExpr(text), patterns, token))

  /** Register graft SQL functions on a session (idempotent), enabling
    * `SELECT porter_stem(col)` in `spark.sql`.
    */
  def registerAll(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "porter_stem", exprs => buildPorterStem(exprs), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "float_dot", exprs => buildFloatDot(exprs), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "nfc_normalize", exprs => buildNfcNormalize(exprs), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "float_cosine", exprs => buildFloatCosine(exprs), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "jaro_winkler", exprs => buildJaroWinkler(exprs), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "damerau_levenshtein",
      exprs => buildDamerauLevenshtein(exprs), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "token_lcs", exprs => buildTokenLcs(exprs), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "token_ngram_clip", exprs => buildTokenNgramClip(exprs), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "hilbert_index", exprs => buildHilbertIndex(exprs), "scala_udf")
  }

  private[graft] def buildHilbertIndex(
      exprs: Seq[Expression]): HilbertIndex = {
    require(exprs.length == 3,
      s"hilbert_index requires exactly 3 arguments, got ${exprs.length}")
    val bits = exprs(2) match {
      case e if e.foldable &&
          e.dataType == org.apache.spark.sql.types.IntegerType =>
        e.eval().asInstanceOf[Int]
      case e => throw new IllegalArgumentException(
        s"hilbert_index: bits must be an int literal, got $e")
    }
    HilbertIndex(exprs(0), exprs(1), bits)
  }

  private[graft] def buildPorterStem(exprs: Seq[Expression]): PorterStem = {
    require(exprs.length == 1,
      s"porter_stem requires exactly 1 argument, got ${exprs.length}")
    PorterStem(exprs.head)
  }

  private[graft] def buildFloatDot(exprs: Seq[Expression]): FloatDot = {
    require(exprs.length == 2,
      s"float_dot requires exactly 2 arguments, got ${exprs.length}")
    FloatDot(exprs(0), exprs(1))
  }

  private[graft] def buildNfcNormalize(exprs: Seq[Expression]): NfcNormalize = {
    require(exprs.length == 1,
      s"nfc_normalize requires exactly 1 argument, got ${exprs.length}")
    NfcNormalize(exprs.head)
  }

  private[graft] def buildFloatCosine(exprs: Seq[Expression]): FloatCosine = {
    require(exprs.length == 2,
      s"float_cosine requires exactly 2 arguments, got ${exprs.length}")
    FloatCosine(exprs(0), exprs(1))
  }

  private[graft] def buildJaroWinkler(exprs: Seq[Expression]): JaroWinkler = {
    require(exprs.length == 2,
      s"jaro_winkler requires exactly 2 arguments, got ${exprs.length}")
    JaroWinkler(exprs(0), exprs(1))
  }

  private[graft] def buildDamerauLevenshtein(
      exprs: Seq[Expression]): DamerauLevenshtein = {
    require(exprs.length == 2,
      s"damerau_levenshtein requires exactly 2 arguments, got " +
        s"${exprs.length}")
    DamerauLevenshtein(exprs(0), exprs(1))
  }

  private[graft] def buildTokenLcs(exprs: Seq[Expression]): TokenLcs = {
    require(exprs.length == 2,
      s"token_lcs requires exactly 2 arguments, got ${exprs.length}")
    TokenLcs(exprs(0), exprs(1))
  }

  private[graft] def buildTokenNgramClip(
      exprs: Seq[Expression]): TokenNgramClip = {
    require(exprs.length == 3,
      s"token_ngram_clip requires exactly 3 arguments, got ${exprs.length}")
    TokenNgramClip(exprs(0), exprs(1), exprs(2))
  }
}
