package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Which of `patterns` occur as substrings of the input — the DISTINCT
  * 0-based pattern indices, ascending — via ONE Aho–Corasick automaton
  * pass, O(|text| + matches) regardless of how many patterns the
  * blocklist holds. The straightforward spelling (`contains(text, p1)
  * OR contains(text, p2) OR …`) rescans the text once per pattern:
  * at a 10k-phrase blocklist over 100 TB that is a 10,000× rescan this
  * expression removes. Matching is exact UTF-8 byte substring — for
  * well-formed UTF-8 that is identical to SQL `strpos(text, p) > 0`
  * (UTF-8 exact byte sequences cannot match across code-point
  * boundaries), so a DuckDB oracle replays it pattern for pattern.
  *
  * The pattern table is a constructor PARAMETER (a driver-side
  * blocklist artifact, like [[BpeEncode]]'s merge table): serialized
  * once with the expression; the automaton (goto/fail/output links
  * over bytes) builds lazily once per deserialized instance. The
  * generated code calls the instance kernel via a codegen reference —
  * no UDF serialization, stays inside whole-stage codegen.
  */
case class MultiMatch(child: Expression, patterns: Seq[String])
    extends UnaryExpression {

  require(patterns.nonEmpty && patterns.forall(_.nonEmpty),
    "multi_match requires a non-empty pattern list of non-empty patterns")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"multi_match requires a string argument, got ${child.dataType}")

  /** goto (per-node byte→node), fail links, and per-node matched
    * pattern ids — the classic Aho–Corasick construction over the
    * UTF-8 bytes, built once per instance.
    */
  @transient private lazy val automaton: MultiMatch.Automaton =
    MultiMatch.build(patterns)

  def matches(text: UTF8String): GenericArrayData = {
    val a = automaton
    val bytes = text.getBytes
    val hit = new Array[Boolean](patterns.length)
    var state = 0
    var i = 0
    while (i < bytes.length) {
      val b = bytes(i) & 0xFF
      while (state != 0 && a.goto(state)(b) == -1) state = a.fail(state)
      val nxt = a.goto(state)(b)
      if (nxt != -1) state = nxt
      // outs are pre-merged along fail links at build time, so one
      // lookup reports every pattern ending here — no per-byte chain walk
      val ids = a.outs(state)
      if (ids != null) {
        var j = 0
        while (j < ids.length) { hit(ids(j)) = true; j += 1 }
      }
      i += 1
    }
    var n = 0
    var k = 0
    while (k < hit.length) { if (hit(k)) n += 1; k += 1 }
    val res = new Array[Any](n)
    var p = 0
    k = 0
    while (k < hit.length) { if (hit(k)) { res(p) = k; p += 1 }; k += 1 }
    new GenericArrayData(res)
  }

  override def nullSafeEval(t: Any): Any =
    matches(t.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("multiMatch", this,
      classOf[MultiMatch].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.matches($c);")
  }

  override protected def withNewChildInternal(
      newChild: Expression): MultiMatch = copy(child = newChild)
}

/** Redact every blocklisted phrase: LEFTMOST-LONGEST non-overlapping
  * occurrences of any of `patterns` replaced by `token`, in one
  * Aho–Corasick pass plus a greedy sweep — the enforcement half of
  * [[MultiMatch]] (FlashText's semantics: at each leftmost matching
  * position take the longest match there, resume after it; matches
  * inside a replaced span are consumed with it). Scanning is exact
  * UTF-8 byte matching, identical to character matching for well-formed
  * UTF-8, and the greedy selection is a deterministic function of the
  * match set — a SQL oracle replays it with an iterated
  * find-min-position/max-length fold.
  */
case class MultiReplace(child: Expression, patterns: Seq[String],
    token: String) extends UnaryExpression {

  require(patterns.nonEmpty && patterns.forall(_.nonEmpty),
    "multi_replace requires a non-empty pattern list of non-empty patterns")

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"multi_replace requires a string argument, got ${child.dataType}")

  @transient private lazy val automaton: MultiMatch.Automaton =
    MultiMatch.build(patterns)

  @transient private lazy val patLens: Array[Int] =
    patterns.map(_.getBytes("UTF-8").length).toArray

  @transient private lazy val tokenBytes: Array[Byte] =
    token.getBytes("UTF-8")

  def replaceAll(text: UTF8String): UTF8String = {
    val a = automaton
    val bytes = text.getBytes
    // collect every occurrence as (start, len): AC reports pattern ids
    // at END positions; leftmost-longest needs them sorted by start
    val starts = new java.util.ArrayList[Int]()
    val lens = new java.util.ArrayList[Int]()
    var state = 0
    var i = 0
    while (i < bytes.length) {
      val b = bytes(i) & 0xFF
      while (state != 0 && a.goto(state)(b) == -1) state = a.fail(state)
      val nxt = a.goto(state)(b)
      if (nxt != -1) state = nxt
      val ids = a.outs(state)
      if (ids != null) {
        var j = 0
        while (j < ids.length) {
          val len = patLens(ids(j))
          starts.add(i - len + 1)
          lens.add(len)
          j += 1
        }
      }
      i += 1
    }
    if (starts.isEmpty) return text
    // greedy leftmost-longest sweep over (start asc, len desc)
    val n = starts.size
    val idx = (0 until n).toArray
    val sArr = new Array[Int](n)
    val lArr = new Array[Int](n)
    var k = 0
    while (k < n) { sArr(k) = starts.get(k); lArr(k) = lens.get(k); k += 1 }
    val order = idx.sortBy(x => (sArr(x), -lArr(x)))
    val out = new java.io.ByteArrayOutputStream(bytes.length)
    var cursor = 0
    var o = 0
    while (o < order.length) {
      val m = order(o)
      if (sArr(m) >= cursor) {
        out.write(bytes, cursor, sArr(m) - cursor)
        out.write(tokenBytes, 0, tokenBytes.length)
        cursor = sArr(m) + lArr(m)
      }
      o += 1
    }
    if (cursor < bytes.length) out.write(bytes, cursor, bytes.length - cursor)
    UTF8String.fromBytes(out.toByteArray)
  }

  override def nullSafeEval(t: Any): Any =
    replaceAll(t.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("multiReplace", this,
      classOf[MultiReplace].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.replaceAll($c);")
  }

  override protected def withNewChildInternal(
      newChild: Expression): MultiReplace = copy(child = newChild)
}

object MultiMatch {

  private[functions] final class Automaton(
      val goto: Array[Array[Int]],
      val fail: Array[Int],
      val outs: Array[Array[Int]])

  private[functions] def build(patterns: Seq[String]): Automaton = {
    val goto = scala.collection.mutable.ArrayBuffer(
      Array.fill(256)(-1))
    val outs = scala.collection.mutable.ArrayBuffer[Array[Int]](null)
    // trie
    for ((p, id) <- patterns.zipWithIndex) {
      val bs = p.getBytes("UTF-8")
      var s = 0
      for (b <- bs) {
        val c = b & 0xFF
        if (goto(s)(c) == -1) {
          goto += Array.fill(256)(-1)
          outs += null
          goto(s)(c) = goto.length - 1
        }
        s = goto(s)(c)
      }
      outs(s) = if (outs(s) == null) Array(id) else outs(s) :+ id
    }
    // BFS fail links
    val fail = new Array[Int](goto.length)
    val queue = scala.collection.mutable.Queue[Int]()
    for (c <- 0 until 256; s = goto(0)(c) if s != -1) {
      fail(s) = 0
      queue += s
    }
    while (queue.nonEmpty) {
      val r = queue.dequeue()
      for (c <- 0 until 256; s = goto(r)(c) if s != -1) {
        queue += s
        var f = fail(r)
        while (f != 0 && goto(f)(c) == -1) f = fail(f)
        fail(s) = if (goto(f)(c) != -1 && goto(f)(c) != s) goto(f)(c) else 0
        // merge the fail target's (already-final, BFS order) outputs in,
        // so matching needs one lookup per byte instead of a chain walk
        if (outs(fail(s)) != null)
          outs(s) =
            if (outs(s) == null) outs(fail(s))
            else outs(s) ++ outs(fail(s))
      }
    }
    new Automaton(goto.toArray, fail, outs.toArray)
  }
}
