package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** All registered engine operations, each a Spark implementation plus an
    * optional DuckDB oracle.
    */
  def defs: Seq[QueryDef] =
    Core.all ++ Analytics.all ++ DocPipeline.all ++ TrainingOps.all ++
      MlQueries.all ++ PipelineBench.all ++ PipelineOracle.all ++
      Storage.all ++ StreamingQuery.all ++ CdcQueries.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0:
    * the full semantic-similarity pair-vector pipeline re-expressed over the
    * documents table.
    */
  def entry(spark: SparkSession): DataFrame =
    DocPipeline.all.find(_.name == "q32_doc_pair_vectors").get
      .query(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    defs.map(q => q.name -> q.query).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    defs.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
