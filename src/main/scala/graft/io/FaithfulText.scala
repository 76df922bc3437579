package graft.io

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.pipeline.PairVectors

/** Byte-parity text renderings of the pipeline relations, for users who
  * need the reference's exact on-disk formats (FIXTURES.md §3). The
  * engine-native sink is parquet; these are opt-in views that render to a
  * single `value: String` column which `df.write.text(dir)` lays out like
  * the reference's `TextOutputFormat` part files.
  *
  * Double rendering uses `format_string("%s", x)` = `Double.toString`
  * semantics, matching the reference's `String.format("%s", double)` /
  * `Arrays.toString` (including the literal `Infinity`).
  */
object FaithfulText {

  private def d(c: Column): Column = format_string("%s", c)

  /** Step-2 output lines: two rows per pair, `<lexeme> <feature>\tlf=<c>
    * l=<cl>` and `<lexeme> <feature>\tlf=<c> f=<cf>` (`Step2.java:76-78`) —
    * the enriched-pairs relation the engine never materializes (it is the
    * intermediate shape of the 3-way join).
    */
  def enrichedPairLines(counts: graft.pipeline.CorpusCounts): DataFrame = {
    val key = concat_ws(" ", col("lexeme"), col("feature"))
    val lRows = counts.pairs.join(counts.lexemes, "lexeme")
      .select(concat_ws("\t", key,
        format_string("lf=%s l=%s", col("lf"), col("l"))).as("value"))
    val fRows = counts.pairs.join(counts.features, "feature")
      .select(concat_ws("\t", key,
        format_string("lf=%s f=%s", col("lf"), col("f"))).as("value"))
    lRows.unionByName(fRows)
  }

  /** Step-3 output lines: `<lexeme> <feature>\tassoc_freq=_ assoc_prob=_
    * assoc_PMI=_ assoc_t_test=_` (`Step3.java:96-98`).
    */
  def assocLines(assoc: DataFrame): DataFrame =
    assoc.select(concat_ws("\t",
      concat_ws(" ", col("lexeme"), col("feature")),
      format_string("assoc_freq=%s assoc_prob=%s assoc_PMI=%s assoc_t_test=%s",
        col("assoc_freq"), col("assoc_prob"), col("assoc_pmi"),
        col("assoc_ttest"))).as("value"))

  /** Step-4 output lines: `<w1> <w2> <True|False>\t[d0, d1, ..., d23]` —
    * Java `Arrays.toString` of the flattened matrix (`Step4.java:298-302`).
    */
  def vectorLines(vectors: DataFrame): DataFrame = {
    val arr = concat(lit("["),
      concat_ws(", ", PairVectors.vectorColumns.map(c => d(col(c))): _*),
      lit("]"))
    vectors.select(concat_ws("\t",
      concat_ws(" ", col("w1"), col("w2"),
        when(col("related"), "True").otherwise("False")),
      arr).as("value"))
  }
}
