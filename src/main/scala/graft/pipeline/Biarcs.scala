package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.porter_stem

/** Google Syntactic N-grams "biarcs" corpus parsing: line-oriented text →
  * dependency edges, as pure column expressions (whole-stage codegen, no
  * UDFs, no shuffle).
  *
  * Line format (reference `Step1.java:19-20,30`; fixture
  * `/root/reference/small-sample.txt`):
  * {{{
  * head_word<TAB>syntactic_ngram<TAB>total_count<TAB>year,count...
  * }}}
  * where `syntactic_ngram` is space-separated tokens
  * `word/POS/dep_label/head_index` (1-based; 0 = root). The year histogram
  * tail is never read (reference reads only `fields[2]`, `Step1.java:36`).
  *
  * Divergences from the reference parser, both strictly-more-defensive
  * (the reference throws out of the whole task on a slashless token, and
  * its stem-in-place `String.replace` can corrupt POS/dep labels when the
  * surface form reappears in the token — `Step1.java:41-47`):
  *   - malformed tokens are dropped, never fatal;
  *   - tokens are rebuilt field-wise, so stems never leak into dep labels.
  */
object Biarcs {

  /** Raw corpus lines (a single `value: String` column) → edges
    * `(lexeme: String, feature: String, count: Long)`.
    *
    * One edge per non-root token with a valid in-range head pointer
    * (reference `Step1.java:49-71`): `lexeme` = stemmed head word,
    * `feature` = stemmed dependent word + "-" + dependency label.
    *
    * `faithful = true` reproduces the reference's stem-in-place quirk
    * byte-for-byte (`Step1.java:41-47`): each token is rewritten with
    * `String.replace(surfaceForm, stem)`, which substitutes EVERY
    * occurrence of the surface form anywhere in the token — when the
    * surface form reappears inside the POS tag or dependency label, the
    * label is corrupted exactly as the reference corrupts it (e.g.
    * `cats/NNS/catsup/1` → `cat/NNS/catup/1`, feature `cat-catup`). The
    * default field-wise rewrite never leaks stems into labels.
    */
  def edges(corpus: DataFrame, faithful: Boolean = false): DataFrame = {
    // Java's String.split drops trailing empty fields; Spark's keeps them.
    // Trimming trailing separators first reproduces the reference's arity
    // checks (and its head-pointer bounds) exactly.
    val base = corpus
      .select(split(regexp_replace(col("value"), "\t+$", ""), "\t").as("f"))
      .where(size(col("f")) >= 4)
      .select(
        split(regexp_replace(element_at(col("f"), 2), " +$", ""), " ").as("raw"),
        expr("try_cast(f[2] AS BIGINT)").as("count"))
      .where(col("count").isNotNull)
    if (faithful) {
      // Step1.java:41-47: rewrite FIRST (replace-all, quirk included), then
      // split the rewritten token; '/+$' trim mirrors Java split dropping
      // trailing empty fields at token level. No further stemming below —
      // the rewrite already stemmed (and possibly corrupted) the fields.
      val rewritten = transform(col("raw"), t => {
        val surface = substring_index(t, "/", 1)
        call_function("replace", t, surface, porter_stem(surface))
      })
      base.select(rewritten.as("tokens"), col("count"))
        .select(col("tokens"), col("count"), explode(col("tokens")).as("tok"))
        .select(col("tokens"), col("count"),
          split(regexp_replace(col("tok"), "/+$", ""), "/").as("p"))
        .where(size(col("p")) === 4)
        .withColumn("head", expr("try_cast(p[3] AS INT)"))
        .where(col("head").between(1, size(col("tokens"))))
        .select(
          element_at(split(element_at(col("tokens"), col("head")), "/"), 1)
            .as("lexeme"),
          concat(element_at(col("p"), 1), lit("-"), element_at(col("p"), 3))
            .as("feature"),
          col("count"))
    } else {
      base
        .select(col("raw").as("tokens"), col("count"),
          explode(col("raw")).as("tok"))
        .select(col("tokens"), col("count"), split(col("tok"), "/").as("p"))
        .where(size(col("p")) === 4)
        .withColumn("head", expr("try_cast(p[3] AS INT)"))
        .where(col("head").between(1, size(col("tokens"))))
        .select(
          porter_stem(element_at(split(element_at(col("tokens"), col("head")), "/"), 1))
            .as("lexeme"),
          concat(porter_stem(element_at(col("p"), 1)), lit("-"), element_at(col("p"), 3))
            .as("feature"),
          col("count"))
    }
  }

  /** Convenience text-source reader (reference S1/S2: `TextInputFormat`
    * over a directory / glob).
    */
  def readEdges(spark: SparkSession, path: String,
      faithful: Boolean = false): DataFrame =
    edges(spark.read.text(path), faithful)
}
