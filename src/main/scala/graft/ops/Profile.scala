package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Data-quality profiling operators: the checks a pipeline runs on an
  * unfamiliar or drifting table before trusting it as training input.
  */
object Profile {

  /** Approximate functional-dependency profile `lhs → rhsCol`: for each
    * distinct `lhs` tuple, the row count, the number of distinct `rhs`
    * values, the majority `rhs` (ties to the smallest value) with its
    * support, and `violations` = rows disagreeing with the majority —
    * i.e. the minimal number of cell repairs that would make the FD hold
    * within the group (g3-style error measure). `violations = 0`
    * everywhere ⇔ the FD holds exactly.
    *
    * Shape at 100 TB: one aggregation to the (lhs, rhs) grain, then a
    * `row_number` window and the final collapse both run on that
    * already-collapsed relation — cardinality is the number of DISTINCT
    * value combinations, not the row count. No joins, no second pass
    * over the data.
    */
  def fdProfile(df: DataFrame, lhs: Seq[String],
      rhsCol: String): DataFrame = {
    require(lhs.nonEmpty, "lhs must be non-empty")
    require(!lhs.contains(rhsCol), s"rhs $rhsCol cannot be part of lhs")
    val cells = df.groupBy((lhs :+ rhsCol).map(col): _*)
      .agg(count(lit(1)).as("n"))
    val w = Window.partitionBy(lhs.map(col): _*)
      .orderBy(col("n").desc, col(rhsCol).asc)
    cells.withColumn("rk", row_number().over(w))
      .groupBy(lhs.map(col): _*)
      .agg(sum("n").as("n_rows"),
        count(lit(1)).as("n_rhs"),
        max(when(col("rk") === 1, col(rhsCol))).as("majority_rhs"),
        max(when(col("rk") === 1, col("n"))).as("majority_n"))
      .withColumn("violations", col("n_rows") - col("majority_n"))
  }
}
