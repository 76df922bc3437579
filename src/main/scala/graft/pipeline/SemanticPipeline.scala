package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}

/** End-to-end composition of the reference's Steps 1-4 as ONE lazily-built
  * logical plan (reference: 4 MR jobs with full S3 text materialization
  * between each, `App.java:51-116`). The only driver action is the grand
  * total; everything else stays in Catalyst's hands so predicate pushdown,
  * column pruning, partial aggregation, AQE shuffle sizing and skew-join
  * splitting all apply across what used to be job boundaries.
  */
object SemanticPipeline {

  /** corpus text path + gold text path → 24-dim similarity vectors
    * (`w1, w2, related` + [[PairVectors.vectorColumns]]).
    */
  def vectors(
      spark: SparkSession,
      corpusPath: String,
      goldPath: String,
      faithful: Boolean = false): DataFrame = {
    val assoc = associations(spark, corpusPath)
    val gold = PairVectors.parseGold(spark.read.text(goldPath))
    PairVectors.vectors(assoc, gold, faithful)
  }

  /** corpus text path → association-measure relation (Steps 1-3). */
  def associations(spark: SparkSession, corpusPath: String): DataFrame =
    Associate.associate(Counts.fromEdges(Biarcs.readEdges(spark, corpusPath)))
}
