package graft.queries

import org.apache.spark.sql.functions._

import QueryDef.table

/** Storage/sketch surfaces: approximate distinct (HLL) self-validated
  * against exact, and a CSV sink→source roundtrip whose aggregates the
  * oracle can compute directly from the source table.
  */
object Storage {

  val all: Seq[QueryDef] = Seq(

    // approx_count_distinct: the oracle pins the exact count and the
    // claim "approx landed within 5%" (TRUE on both sides iff it did)
    QueryDef("q63_approx_distinct",
      (s, d) => table(s, d, "lineitem")
        .groupBy("l_returnflag")
        .agg(
          countDistinct("l_partkey").as("exact_nd"),
          (abs(approx_count_distinct("l_partkey", 0.02) -
            countDistinct("l_partkey")) <=
            countDistinct("l_partkey") * 0.05).as("approx_ok"))
        .orderBy("l_returnflag"),
      Some("""SELECT l_returnflag,
             |  COUNT(DISTINCT l_partkey) AS exact_nd,
             |  TRUE AS approx_ok
             |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin)),

    // quantile sketch (q63's pattern for the sketch family's third member
    // next to HLL and count-min): approx_percentile is a mergeable
    // KLL-style sketch — the 100 TB path for percentile questions, one
    // map-side-combined aggregation instead of q25's full sort. Validated
    // against the exact percentiles, which the oracle recomputes.
    QueryDef("q99_approx_quantiles",
      // one ARRAY-quantile buffer per family instead of one buffer per
      // quantile: the scalar spelling built two full per-group value
      // buffers (exact tier) and two identical KLL sketches (approx
      // tier); the array forms sort/sketch once and read both points —
      // same values, half the aggregation state (guide §1.2 per-task
      // work; the ok-flags recompute from the extracted columns)
      (s, d) => table(s, d, "lineitem")
        .groupBy("l_returnflag")
        .agg(
          expr("percentile(l_extendedprice, array(0.5D, 0.99D))").as("ep"),
          expr("approx_percentile(l_extendedprice, array(0.5D, 0.99D), " +
            "1000)").as("ap"))
        .select(col("l_returnflag"),
          round(element_at(col("ep"), 1), 4).as("exact_p50"),
          round(element_at(col("ep"), 2), 4).as("exact_p99"),
          (abs(element_at(col("ap"), 1) - element_at(col("ep"), 1)) <=
            element_at(col("ep"), 1) * 0.01).as("p50_ok"),
          (abs(element_at(col("ap"), 2) - element_at(col("ep"), 2)) <=
            element_at(col("ep"), 2) * 0.01).as("p99_ok"))
        .orderBy("l_returnflag"),
      Some("""SELECT l_returnflag,
             |  ROUND(quantile_cont(l_extendedprice, 0.5), 4) AS exact_p50,
             |  ROUND(quantile_cont(l_extendedprice, 0.99), 4) AS exact_p99,
             |  TRUE AS p50_ok, TRUE AS p99_ok
             |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin)),

    // CSV sink + schema-inferred source roundtrip; aggregates must equal
    // the direct-from-parquet oracle
    QueryDef("q64_csv_roundtrip",
      (s, d) => {
        val docs = table(s, d, "documents")
          .select("doc_id", "lang", "source", "n_chars")
        val tmp = java.nio.file.Files.createTempDirectory("graft_csv")
        docs.write.mode("overwrite").option("header", "true")
          .csv(tmp.toString)
        val res = s.read.option("header", "true")
          .option("inferSchema", "true").csv(tmp.toString)
          .agg(count(lit(1)).as("n"),
            sum("n_chars").cast("long").as("total_chars"),
            countDistinct("lang").as("n_langs"),
            countDistinct("source").as("n_sources"))
        // one-row result: materialize it so the staged CSV dir can be
        // deleted instead of accumulating across battery/bench runs
        val rows = res.collect()
        QueryDef.deleteRecursively(tmp)
        s.createDataFrame(java.util.Arrays.asList(rows: _*), res.schema)
      },
      Some("""SELECT COUNT(*) AS n,
             |  CAST(SUM(n_chars) AS BIGINT) AS total_chars,
             |  COUNT(DISTINCT lang) AS n_langs,
             |  COUNT(DISTINCT source) AS n_sources
             |FROM documents""".stripMargin)),

    // ORC sink + source roundtrip (the columnar sibling of q64): typed
    // schema survives natively, so exact per-group aggregates must match
    // the direct-from-parquet oracle
    QueryDef("q73_orc_roundtrip",
      (s, d) => {
        val li = table(s, d, "lineitem")
          .select("l_orderkey", "l_returnflag", "l_quantity",
            "l_extendedprice")
        val tmp = java.nio.file.Files.createTempDirectory("graft_orc")
        li.write.mode("overwrite").orc(tmp.toString)
        val res = s.read.orc(tmp.toString)
          .groupBy("l_returnflag")
          .agg(count(lit(1)).as("n"),
            sum("l_quantity").cast("double").as("sum_qty"),
            round(sum("l_extendedprice"), 2).as("sum_price"))
          .orderBy("l_returnflag")
        val rows = res.collect()
        QueryDef.deleteRecursively(tmp)
        s.createDataFrame(java.util.Arrays.asList(rows: _*), res.schema)
      },
      Some("""SELECT l_returnflag, COUNT(*) AS n,
             |  CAST(SUM(l_quantity) AS DOUBLE) AS sum_qty,
             |  ROUND(SUM(l_extendedprice), 2) AS sum_price
             |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Hive-style partitioned sink + partition-PRUNED source: documents
    // written partitionBy(lang), read back with a lang predicate — at
    // 100 TB the layout turns that predicate into directory pruning (the
    // scan's PartitionFilters; pinned in PlanShapeSpec) instead of a
    // full-corpus read. Aggregates must equal the direct oracle.
    QueryDef("q141_partitioned_pruning",
      (s, d) => {
        val docs = table(s, d, "documents")
          .select("doc_id", "source", "n_chars", "lang")
        val tmp = java.nio.file.Files.createTempDirectory("graft_part")
        docs.write.mode("overwrite").partitionBy("lang")
          .parquet(tmp.toString)
        val res = s.read.parquet(tmp.toString)
          .where(col("lang").isin("en", "de"))
          .groupBy("lang")
          .agg(count(lit(1)).as("n"),
            sum("n_chars").cast("long").as("total_chars"),
            countDistinct("source").as("n_sources"))
          .orderBy("lang")
        val rows = res.collect()
        QueryDef.deleteRecursively(tmp)
        s.createDataFrame(java.util.Arrays.asList(rows: _*), res.schema)
      },
      Some("""SELECT lang, COUNT(*) AS n,
             |  CAST(SUM(n_chars) AS BIGINT) AS total_chars,
             |  COUNT(DISTINCT source) AS n_sources
             |FROM documents WHERE lang IN ('en', 'de')
             |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Schema evolution: two parquet batches with DIFFERENT schemas (an
    // early crawl without quality, a later one with it) land in one
    // dataset; mergeSchema unifies them, old rows read NULL for the new
    // column. The oracle replays the union-with-nulls semantics; the
    // per-batch aggregate pins that the column really is absent (not
    // defaulted) for the old batch.
    QueryDef("q187_schema_evolution",
      (s, d) => {
        val docs = table(s, d, "documents")
        val tmp = java.nio.file.Files.createTempDirectory("graft_evo")
        try {
          docs.where(col("doc_id") % 2 === 0)
            .select(col("doc_id"), col("lang"), lit(0).as("batch"))
            .write.mode("append").parquet(tmp.toString)
          docs.where(col("doc_id") % 2 === 1)
            .select(col("doc_id"), col("lang"), lit(1).as("batch"),
              (col("n_chars") % 100).cast("int").as("quality"))
            .write.mode("append").parquet(tmp.toString)
          val res = s.read.option("mergeSchema", "true")
            .parquet(tmp.toString)
            .groupBy("batch")
            .agg(count(lit(1)).as("n"),
              count(col("quality")).as("n_with_quality"),
              sum("quality").as("quality_sum"))
            .orderBy("batch")
          val rows = res.collect()
          s.createDataFrame(java.util.Arrays.asList(rows: _*), res.schema)
        } finally QueryDef.deleteRecursively(tmp)
      },
      Some("""WITH evo AS (
             |  SELECT doc_id, lang, 0 AS batch,
             |    CAST(NULL AS INT) AS quality
             |  FROM documents WHERE doc_id % 2 = 0
             |  UNION ALL
             |  SELECT doc_id, lang, 1,
             |    CAST(n_chars % 100 AS INT)
             |  FROM documents WHERE doc_id % 2 = 1)
             |SELECT batch, COUNT(*) AS n,
             |  COUNT(quality) AS n_with_quality,
             |  CAST(SUM(quality) AS BIGINT) AS quality_sum
             |FROM evo GROUP BY 1 ORDER BY 1""".stripMargin)),
  )
}
