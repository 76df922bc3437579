package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.pipeline.PairVectors

/** Readers for the reference's materialized vector formats — the missing
  * §3.3 rerun path (`WekaModel.java:59-123`, `Step5.java:97-123`): a user
  * holding the reference's Step-4 `part-r-*` text files, or the exported
  * ARFF, can re-run evaluation directly, no parquet conversion step.
  *
  * Both readers are pure column expressions (no UDFs) and mirror the
  * reference parser's behavior: key and values split exactly as
  * `processLine` does, `related` via case-insensitive `"true"`
  * (`Boolean.parseBoolean`), and malformed lines dropped — the reference
  * only logs them and carries on.
  */
object VectorSource {

  private val n = PairVectors.vectorColumns.size

  /** Step-4 text lines `w1 w2 True<TAB>[d0, d1, ..., d23]` → the standard
    * vectors relation `(w1, w2, related)` + [[PairVectors.vectorColumns]].
    * Exact inverse of [[FaithfulText.vectorLines]] (`Double.toString`
    * round-trips through `cast("double")` losslessly).
    */
  def vectorLines(lines: DataFrame): DataFrame = {
    val parsed = lines
      .select(split(col("value"), "\t", 2).as("parts"))
      .where(size(col("parts")) === 2)
      .select(
        split(trim(element_at(col("parts"), 1)), "\\s+").as("key"),
        split(regexp_replace(element_at(col("parts"), 2), "[\\[\\]\\s]+", ""),
          ",").as("vals"))
      .where(size(col("key")) === 3 && size(col("vals")) === n)
    val cols = Seq(
      element_at(col("key"), 1).as("w1"),
      element_at(col("key"), 2).as("w2"),
      (lower(element_at(col("key"), 3)) === "true").as("related")) ++
      PairVectors.vectorColumns.zipWithIndex.map { case (c, i) =>
        element_at(col("vals"), i + 1).cast("double").as(c)
      }
    parsed.select(cols: _*)
  }

  /** Text source convenience (path or glob of Step-4 part files). */
  def readVectorLines(spark: SparkSession, path: String): DataFrame =
    vectorLines(spark.read.text(path))

  /** ARFF data rows (the reference's Weka input, [[ArffSink]] format) →
    * `related` + [[PairVectors.vectorColumns]]. ARFF carries no word pair,
    * so the relation has no w1/w2 — exactly what evaluation needs. Header
    * lines (`@...`) and blanks are skipped wherever they appear, matching
    * ARFF's structure without tracking the `@data` marker.
    */
  def arff(lines: DataFrame): DataFrame = {
    val data = lines
      .where(!col("value").startsWith("@") && trim(col("value")) =!= "")
      .select(split(col("value"), ",").as("vals"))
      .where(size(col("vals")) === n + 1)
    val cols = (trim(element_at(col("vals"), n + 1)) === "similar")
      .as("related") +:
      PairVectors.vectorColumns.zipWithIndex.map { case (c, i) =>
        element_at(col("vals"), i + 1).cast("double").as(c)
      }
    data.select(cols: _*)
  }

  /** ARFF file/path convenience. */
  def readArff(spark: SparkSession, path: String): DataFrame =
    arff(spark.read.text(path))
}
