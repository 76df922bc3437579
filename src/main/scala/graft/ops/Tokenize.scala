package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The engine's shared tokenizer column expression.
  *
  * Every text operator historically tokenized with `split(text, " ")` —
  * correct for space-separated scripts, but on CJK / Thai / Lao / Khmer /
  * Myanmar text (scripts written WITHOUT word spaces — a large slice of
  * any real web corpus) a whole line degrades to ONE token, which
  * silently breaks shingle dedup, decontamination, token budgets, and
  * quality statistics. [[ScriptAware]] is the fallback those operators
  * route through: every codepoint of a whitespace-free script becomes its
  * own token (the standard character-level fallback — what BERT-style
  * tokenizers do for CJK ideographs), while space-separated text keeps
  * word tokens. Mixed-script lines get the right treatment per character
  * run, with no per-document language routing step.
  *
  * Determinism contract: the boundary is a fixed CODEPOINT-RANGE class,
  * not `\p{script=...}` — script assignments move across Unicode
  * versions, so two engines on different ICU/JDK snapshots could
  * disagree; explicit ranges are eternal and the DuckDB oracle replays
  * them with the byte-identical RE2 class. Pure narrow column expression
  * (one regexp_replace + one split + one filter), codegen'd, no UDF;
  * free to evaluate at the scan at any corpus size.
  */
object Tokenize {

  /** How a text operator turns a line into tokens. */
  sealed trait Mode

  /** `split(text, " ")` — the engine's historical convention, byte-
    * compatible with every existing oracle (consecutive spaces yield
    * empty tokens, exactly as `split` does).
    */
  case object Whitespace extends Mode

  /** Whitespace tokens with every whitespace-free-script codepoint
    * isolated as its own token; empty tokens are dropped (a space run
    * yields nothing, unlike [[Whitespace]] — on single-spaced Latin
    * text the two modes agree exactly).
    */
  case object ScriptAware extends Mode

  /** Codepoints of scripts written without word spaces, as explicit
    * ranges (stable across Unicode versions and engines):
    * Han (URO + Extension A + compatibility + Extension B–F plane-2
    * block), Hiragana, Katakana (+ phonetic extensions), Thai, Lao,
    * Khmer, Myanmar. Hangul is deliberately absent — Korean uses
    * spaces. `\x{...}` spelling is valid in BOTH Java regex and RE2,
    * so the oracle-side class is character-for-character this string.
    */
  val NoSpaceScriptClass: String =
    "[\\x{3400}-\\x{4DBF}\\x{4E00}-\\x{9FFF}\\x{F900}-\\x{FAFF}" +
      "\\x{20000}-\\x{2FA1F}\\x{3040}-\\x{30FF}\\x{31F0}-\\x{31FF}" +
      "\\x{0E00}-\\x{0EFF}\\x{1780}-\\x{17FF}\\x{1000}-\\x{109F}]"

  /** Token array of `text` under `mode`. */
  def tokens(text: Column, mode: Mode): Column = mode match {
    case Whitespace => split(text, " ")
    case ScriptAware =>
      filter(
        split(regexp_replace(text, s"($NoSpaceScriptClass)", " $1 "), " "),
        t => length(t) > 0)
  }
}
