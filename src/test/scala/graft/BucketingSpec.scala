package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Co-located joins via bucketing — the pre-shuffle strategy for repeated
  * large-large joins at the 100 TB target: both sides bucketed+sorted on
  * the join key join with ZERO Exchange in the physical plan.
  */
class BucketingSpec extends AnyFunSuite with SparkTestBase {

  test("bucketed tables join without any shuffle exchange") {
    val dir = java.nio.file.Files.createTempDirectory("graft_buckets")
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    val ord = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    try {
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
      spark.sql("DROP TABLE IF EXISTS b_orders")
      li.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .option("path", s"$dir/li").saveAsTable("b_lineitem")
      ord.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .option("path", s"$dir/ord").saveAsTable("b_orders")

      // the merge hint forces SortMergeJoin without mutating session conf
      val joined = spark.table("b_lineitem").hint("merge")
        .join(spark.table("b_orders"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderstatus")
        .agg(sum("l_quantity").as("qty"))
      val plan = joined.queryExecution.executedPlan.toString
      // the join itself must consume bucketed scans directly: the only
      // allowed exchange is the one AFTER the join for the groupBy
      assert(plan.contains("SortMergeJoin"), plan.take(800))
      val exchanges = "Exchange hashpartitioning\\((l|o)_orderkey".r
        .findAllIn(plan).size
      assert(exchanges == 0,
        s"join inputs were re-shuffled despite bucketing:\n${plan.take(1200)}")
      // and the result is correct
      val got = joined.collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      val want = li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderstatus").agg(sum("l_quantity"))
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      assert(got.keySet == want.keySet)
      got.foreach { case (k, v) => assert(math.abs(v - want(k)) < 1e-6) }
    } finally {
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
      spark.sql("DROP TABLE IF EXISTS b_orders")
    }
  }
}
