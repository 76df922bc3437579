package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One named engine operation: a Spark implementation over the test tables
  * plus (when SQL-expressible) an equivalent DuckDB oracle query the driver
  * hash-compares against.
  *
  * Contract notes (driver compare semantics):
  *   - column names must match between the two sides (compare sorts columns
  *     by name);
  *   - results must be deterministic: every query ends in an ORDER BY over a
  *     unique key on BOTH sides;
  *   - floating-point outputs are rounded (typically 6 dp) on both sides;
  *   - integer sums in DuckDB are CAST(.. AS BIGINT) to match Spark's LongType;
  *   - timestamps are cast to strings/dates before output (parquet-vs-duckdb
  *     timezone representation differs).
  */
final case class QueryDef(
    name: String,
    query: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object QueryDef {
  /** Read one of the driver-generated test tables. */
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Delete a staging directory a query created under java.io.tmpdir —
    * repeated battery/bench runs must not accumulate staged files.
    */
  def deleteRecursively(dir: java.nio.file.Path): Unit = {
    import java.nio.file.Files
    import scala.jdk.CollectionConverters._
    if (Files.exists(dir)) {
      val walk = Files.walk(dir)
      try walk.sorted(java.util.Comparator.reverseOrder())
        .iterator().asScala.foreach(Files.deleteIfExists(_))
      finally walk.close()
    }
  }
}
