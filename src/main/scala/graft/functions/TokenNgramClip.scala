package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.types.{DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** BLEU's clipped n-gram match count `Σ_g min(count_cand(g),
  * count_ref(g))` over whitespace-token n-grams of two string columns
  * (empty tokens dropped — the engine's tokenization convention),
  * computed in O(|cand| + |ref|) per row with one hash map of the
  * reference grams.
  *
  * This replaces the declarative spelling (`aggregate` over
  * `array_distinct` with two `filter` scans per distinct gram), which
  * is O(L²) with string-comparison constants — measured 55× slower on
  * the documents corpus once the bench stopped letting `count()` prune
  * it. Token/gram equality is exact UTF-8 byte equality of the
  * space-joined gram, identical to SQL `=` on `concat_ws(' ', slice)`,
  * so the DuckDB oracle replay is unchanged.
  *
  * The generated code calls the same static kernel `eval` uses: no UDF
  * serialization, inline null handling, stays inside whole-stage
  * codegen.
  */
case class TokenNgramClip(first: Expression, second: Expression,
    third: Expression) extends TernaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    if (first.dataType == StringType && second.dataType == StringType &&
      third.dataType == IntegerType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "token_ngram_clip requires (string, string, int) arguments, got " +
        s"(${first.dataType}, ${second.dataType}, ${third.dataType})")

  override def nullSafeEval(a: Any, b: Any, n: Any): Any =
    TokenNgramClip.clip(a.asInstanceOf[UTF8String],
      b.asInstanceOf[UTF8String], n.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b, n) =>
      s"graft.functions.TokenNgramClip.clip($a, $b, $n)")

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): TokenNgramClip =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object TokenNgramClip {

  private val Space = UTF8String.fromString(" ")

  private def tokens(s: UTF8String): Array[UTF8String] = {
    val parts = s.split(Space, -1)
    val out = new Array[UTF8String](parts.length)
    var n = 0
    var i = 0
    while (i < parts.length) {
      if (parts(i).numBytes() > 0) { out(n) = parts(i); n += 1 }
      i += 1
    }
    java.util.Arrays.copyOf(out, n)
  }

  /** The shared interpreted/codegen kernel: hash the reference grams,
    * consume them with the candidate grams. One space-joined UTF8String
    * per gram (byte equality ≡ SQL `=` on `concat_ws(' ', ...)`).
    */
  def clip(cand: UTF8String, ref: UTF8String, n: Int): Long = {
    if (n < 1) throw new IllegalArgumentException(
      s"token_ngram_clip: n=$n must be >= 1")
    val tc = tokens(cand)
    val tr = tokens(ref)
    if (tc.length < n || tr.length < n) return 0L
    def gram(ts: Array[UTF8String], i: Int): UTF8String =
      if (n == 1) ts(i)
      else {
        val parts = new Array[UTF8String](n)
        System.arraycopy(ts, i, parts, 0, n)
        UTF8String.concatWs(Space, parts: _*)
      }
    val refCounts = new java.util.HashMap[UTF8String, Int](
      math.max(8, (tr.length - n + 1) * 2))
    var i = 0
    while (i <= tr.length - n) {
      refCounts.merge(gram(tr, i), 1, (a, b) => a + b)
      i += 1
    }
    var count = 0L
    i = 0
    while (i <= tc.length - n) {
      val g = gram(tc, i)
      val c = refCounts.getOrDefault(g, 0)
      if (c > 0) { refCounts.put(g, c - 1); count += 1L }
      i += 1
    }
    count
  }
}
