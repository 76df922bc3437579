package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import QueryDef.table

/** Analytic extensions of the battery: distribution window functions,
  * pivot, exact percentiles, bag semantics, correlated aggregation, range
  * frames — Spark-inherited surfaces (SURVEY §2.5/§2.7/§2.8 "absent in the
  * reference, engine gets them free") exercised against the oracle.
  */
object Analytics {

  val all: Seq[QueryDef] = Seq(

    QueryDef("q23_window_analytic",
      (s, d) => {
        val w = Window.partitionBy("o_orderpriority")
          .orderBy(col("o_totalprice"), col("o_orderkey"))
        table(s, d, "orders")
          .withColumn("bucket4", ntile(4).over(w))
          .withColumn("pr", round(percent_rank().over(w), 6))
          .withColumn("cd", round(cume_dist().over(w), 6))
          .withColumn("cheapest", first(col("o_totalprice")).over(
            w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
          .withColumn("priciest", last(col("o_totalprice")).over(
            w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
          .where(col("o_orderkey") % 101 === 0)
          .select("o_orderkey", "o_orderpriority", "bucket4", "pr", "cd",
            "cheapest", "priciest")
          .orderBy("o_orderkey")
      },
      Some("""SELECT o_orderkey, o_orderpriority, bucket4, pr, cd, cheapest, priciest
             |FROM (
             |  SELECT o_orderkey, o_orderpriority,
             |    NTILE(4) OVER w AS bucket4,
             |    ROUND(PERCENT_RANK() OVER w, 6) AS pr,
             |    ROUND(CUME_DIST() OVER w, 6) AS cd,
             |    FIRST_VALUE(o_totalprice) OVER
             |      (w ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
             |      AS cheapest,
             |    LAST_VALUE(o_totalprice) OVER
             |      (w ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
             |      AS priciest
             |  FROM orders
             |  WINDOW w AS (PARTITION BY o_orderpriority
             |               ORDER BY o_totalprice, o_orderkey)) t
             |WHERE o_orderkey % 101 = 0 ORDER BY o_orderkey""".stripMargin)),

    QueryDef("q24_pivot",
      (s, d) => table(s, d, "orders")
        .groupBy("o_orderpriority")
        .pivot("o_orderstatus", Seq("F", "O", "P"))
        .agg(count(lit(1)))
        .select(col("o_orderpriority"),
          coalesce(col("F"), lit(0L)).as("n_f"),
          coalesce(col("O"), lit(0L)).as("n_o"),
          coalesce(col("P"), lit(0L)).as("n_p"))
        .orderBy("o_orderpriority"),
      Some("""SELECT o_orderpriority,
             |  CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_f,
             |  CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_o,
             |  CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS n_p
             |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin)),

    QueryDef("q25_percentiles",
      // array-quantile form on l_quantity: the two scalar percentiles
      // each buffered every value per group; one buffer sorted once now
      // serves both points (same values — the q99 fusion)
      (s, d) => table(s, d, "lineitem")
        .groupBy("l_returnflag")
        .agg(
          expr("percentile(l_quantity, array(0.5D, 0.9D))").as("pq"),
          round(expr("percentile(l_extendedprice, 0.25)"), 6).as("p25_price"))
        .select(col("l_returnflag"),
          round(element_at(col("pq"), 1), 6).as("median_qty"),
          round(element_at(col("pq"), 2), 6).as("p90_qty"),
          col("p25_price"))
        .orderBy("l_returnflag"),
      Some("""SELECT l_returnflag,
             |  ROUND(quantile_cont(l_quantity, 0.5), 6) AS median_qty,
             |  ROUND(quantile_cont(l_quantity, 0.9), 6) AS p90_qty,
             |  ROUND(quantile_cont(l_extendedprice, 0.25), 6) AS p25_price
             |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin)),

    // bag (UNION ALL) vs set semantics in one result
    QueryDef("q26_union_all_bag",
      (s, d) => {
        val a = table(s, d, "orders").select(col("o_custkey").as("k"))
        val b = table(s, d, "customer").select(col("c_custkey").as("k"))
        val bag = a.unionAll(b)
        bag.agg(count(lit(1)).as("bag_rows"),
          countDistinct(col("k")).as("set_rows"))
      },
      Some("""SELECT COUNT(*) AS bag_rows, COUNT(DISTINCT k) AS set_rows
             |FROM (SELECT o_custkey AS k FROM orders
             |      UNION ALL SELECT c_custkey FROM customer) t""".stripMargin)),

    // correlated aggregate: customers whose order revenue exceeds 8x acctbal
    QueryDef("q27_correlated_agg",
      (s, d) => {
        val totals = table(s, d, "orders")
          .groupBy(col("o_custkey")).agg(sum("o_totalprice").as("rev"))
        table(s, d, "customer")
          .join(totals, col("c_custkey") === col("o_custkey"))
          .where(col("rev") > col("c_acctbal") * 8 && col("c_acctbal") > 0)
          .groupBy("c_nationkey")
          .agg(count(lit(1)).as("n_big_spenders"))
          .orderBy("c_nationkey")
      },
      Some("""SELECT c_nationkey, COUNT(*) AS n_big_spenders
             |FROM customer
             |WHERE c_acctbal > 0 AND
             |  (SELECT SUM(o_totalprice) FROM orders WHERE o_custkey = c_custkey)
             |    > c_acctbal * 8
             |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // event-time range frame: trailing 7-day quantity per supplier
    QueryDef("q28_range_frame",
      (s, d) => {
        val li = table(s, d, "lineitem").where(col("l_suppkey") <= 3)
          .withColumn("us", unix_micros(col("l_shipdate").cast("timestamp")))
        val w = Window.partitionBy("l_suppkey").orderBy(col("us"))
          .rangeBetween(-7L * 86400L * 1000000L, 0L)
        li.withColumn("qty_7d", round(sum("l_quantity").over(w), 4))
          .select("l_suppkey", "l_orderkey", "l_linenumber", "qty_7d")
          .orderBy("l_suppkey", "l_orderkey", "l_linenumber")
      },
      Some("""SELECT l_suppkey, l_orderkey, l_linenumber,
             |  ROUND(SUM(l_quantity) OVER (PARTITION BY l_suppkey
             |    ORDER BY epoch_us(l_shipdate)
             |    RANGE BETWEEN 604800000000 PRECEDING AND CURRENT ROW), 4)
             |    AS qty_7d
             |FROM lineitem WHERE l_suppkey <= 3
             |ORDER BY l_suppkey, l_orderkey, l_linenumber""".stripMargin)),

    // Z-order (Morton) clustering layout: every row's zvalue over
    // (l_partkey, l_suppkey), summarized per z-range bucket — the ranges a
    // range-partitioned write would cut into files. Narrow min/max of BOTH
    // keys per bucket is the point of the layout (file-skipping on either
    // predicate); the oracle replays the interleave with true integer
    // division, cross-checking Layout.normalize's double-division exactness.
    QueryDef("q97_zorder_layout",
      (s, d) => graft.ops.Layout.zValue(table(s, d, "lineitem"),
          Seq("l_partkey", "l_suppkey"), bits = 8)
        .groupBy((col("zvalue") / 256).cast("long").as("zbucket"))
        .agg(count(lit(1)).as("n"),
          min("l_partkey").as("pmin"), max("l_partkey").as("pmax"),
          min("l_suppkey").as("smin"), max("l_suppkey").as("smax"))
        .orderBy("zbucket"),
      Some {
        val terms = (0 until 8).flatMap(i => Seq(
          s"(((np >> $i) & 1) << ${2 * i})",
          s"(((ns >> $i) & 1) << ${2 * i + 1})")).mkString(" + ")
        s"""WITH b AS (
           |  SELECT MIN(l_partkey) pmin0, MAX(l_partkey) pmax0,
           |         MIN(l_suppkey) smin0, MAX(l_suppkey) smax0
           |  FROM lineitem),
           |n AS (
           |  SELECT l_partkey, l_suppkey,
           |    (l_partkey - pmin0) * 256 // (pmax0 - pmin0 + 1) AS np,
           |    (l_suppkey - smin0) * 256 // (smax0 - smin0 + 1) AS ns
           |  FROM lineitem, b),
           |z AS (SELECT l_partkey, l_suppkey, $terms AS zvalue FROM n)
           |SELECT zvalue // 256 AS zbucket, COUNT(*) AS n,
           |  MIN(l_partkey) AS pmin, MAX(l_partkey) AS pmax,
           |  MIN(l_suppkey) AS smin, MAX(l_suppkey) AS smax
           |FROM z GROUP BY 1 ORDER BY 1""".stripMargin
      }),

    // PageRank over the customer→supplier purchase graph (suppliers are
    // dangling — their mass redistributes uniformly each round). The
    // oracle unrolls the same 5 power iterations as chained CTEs; float
    // sums compare under the checker's 1e-9 relative tolerance.
    QueryDef("q98_pagerank",
      (s, d) => {
        val edges = table(s, d, "lineitem")
          .join(table(s, d, "orders"),
            col("l_orderkey") === col("o_orderkey"))
          .select(col("o_custkey").as("src"),
            (col("l_suppkey") + 100000L).as("dst"))
        graft.ops.Graph.pageRank(edges, iters = 5, damping = 0.85)
          .select(col("node"), round(col("rank"), 9).as("rank"))
          .orderBy("node")
      },
      Some {
        // AS MATERIALIZED throughout: every r_k is referenced twice
        // (contrib + dangling mass), so an inlining CTE planner would
        // re-evaluate the chain EXPONENTIALLY (2^iters scans of the
        // 6M-row edge build at sf1 — observed OOM); materialization pins
        // each iteration to one evaluation, like the Spark side's
        // localCheckpoint
        val iter = (k: Int) => {
          val p = s"r${k - 1}"
          s"""r$k AS MATERIALIZED (
             |  SELECT nodes.node, nodes.deg,
             |    (1 - 0.85) / nn.n + 0.85 * (COALESCE(c.contrib, 0)
             |      + d.mass / nn.n) AS rank
             |  FROM nodes
             |  CROSS JOIN nn
             |  CROSS JOIN (SELECT COALESCE(SUM(rank), 0) AS mass
             |              FROM $p WHERE deg = 0) d
             |  LEFT JOIN (SELECT e.dst AS node, SUM(r.rank / r.deg) AS contrib
             |             FROM e JOIN $p r ON e.src = r.node GROUP BY 1) c
             |    ON nodes.node = c.node)"""
        }
        (s"""WITH e AS MATERIALIZED (
            |  SELECT DISTINCT o.o_custkey AS src, 100000 + l.l_suppkey AS dst
            |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey),
            |deg AS MATERIALIZED (SELECT src, COUNT(*) AS deg FROM e GROUP BY 1),
            |nodes AS MATERIALIZED (
            |  SELECT n.node, COALESCE(deg.deg, 0) AS deg
            |  FROM (SELECT src AS node FROM e
            |        UNION SELECT dst FROM e) n
            |  LEFT JOIN deg ON n.node = deg.src),
            |nn AS MATERIALIZED (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM nodes),
            |r0 AS MATERIALIZED (
            |  SELECT node, deg, 1.0 / nn.n AS rank FROM nodes, nn),
            |""" + (1 to 5).map(iter).mkString(",\n") + """
            |SELECT node, ROUND(rank, 9) AS rank FROM r5
            |ORDER BY node""").stripMargin
      }),
  )
}
