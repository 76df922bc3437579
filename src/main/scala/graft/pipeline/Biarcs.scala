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
    */
  def edges(corpus: DataFrame): DataFrame = {
    // Java's String.split drops trailing empty fields; Spark's keeps them.
    // Trimming trailing separators first reproduces the reference's arity
    // checks (and its head-pointer bounds) exactly.
    corpus
      .select(split(regexp_replace(col("value"), "\t+$", ""), "\t").as("f"))
      .where(size(col("f")) >= 4)
      .select(
        split(regexp_replace(element_at(col("f"), 2), " +$", ""), " ").as("tokens"),
        expr("try_cast(f[2] AS BIGINT)").as("count"))
      .where(col("count").isNotNull)
      .select(col("tokens"), col("count"), explode(col("tokens")).as("tok"))
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

  /** Convenience text-source reader (reference S1/S2: `TextInputFormat`
    * over a directory / glob).
    */
  def readEdges(spark: SparkSession, path: String): DataFrame =
    edges(spark.read.text(path))
}
