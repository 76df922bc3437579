package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import QueryDef.{eventsMicros, table}

/** Core relational battery: aggregation, joins of every kind, windows, set
  * ops, grouping sets, sorts/limits, scalar function families — the operator
  * surface the engine inherits from Spark (SURVEY.md §2.3-§2.8), each with a
  * DuckDB oracle.
  */
object Core {

  private def li(s: SparkSession, d: String) = table(s, d, "lineitem")
  private def ord(s: SparkSession, d: String) = table(s, d, "orders")
  private def cust(s: SparkSession, d: String) = table(s, d, "customer")

  /** Events with `ts_us` exact-microsecond event time — see
    * [[QueryDef.eventsMicros]] for the encoding-adaptive normalization.
    */
  private def events(s: SparkSession, d: String): DataFrame =
    eventsMicros(s, d)

  val all: Seq[QueryDef] = Seq(

    // A1: hash agg with partial aggregation (TPC-H Q1 shape)
    QueryDef("q01_pricing_summary",
      (s, d) => li(s, d)
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          round(sum("l_quantity"), 4).as("sum_qty"),
          round(sum("l_extendedprice"), 4).as("sum_base_price"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 4).as("sum_disc_price"),
          round(avg("l_quantity"), 6).as("avg_qty"),
          round(avg("l_extendedprice"), 6).as("avg_price"),
          round(avg("l_discount"), 6).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus"),
      Some("""SELECT l_returnflag, l_linestatus,
             |  ROUND(SUM(l_quantity), 4) AS sum_qty,
             |  ROUND(SUM(l_extendedprice), 4) AS sum_base_price,
             |  ROUND(SUM(l_extendedprice * (1 - l_discount)), 4) AS sum_disc_price,
             |  ROUND(AVG(l_quantity), 6) AS avg_qty,
             |  ROUND(AVG(l_extendedprice), 6) AS avg_price,
             |  ROUND(AVG(l_discount), 6) AS avg_disc,
             |  COUNT(*) AS count_order
             |FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    // A2: global aggregates (the reference's counter side-channel analog)
    QueryDef("q02_global_agg",
      (s, d) => li(s, d)
        .agg(
          count(lit(1)).as("n_rows"),
          round(sum("l_quantity"), 4).as("total_qty"),
          round(avg("l_extendedprice"), 6).as("avg_price"),
          countDistinct("l_orderkey").as("n_orders"),
          date_format(min(col("l_shipdate")), "yyyy-MM-dd").as("first_ship"),
          date_format(max(col("l_shipdate")), "yyyy-MM-dd").as("last_ship")),
      Some("""SELECT COUNT(*) AS n_rows,
             |  ROUND(SUM(l_quantity), 4) AS total_qty,
             |  ROUND(AVG(l_extendedprice), 6) AS avg_price,
             |  COUNT(DISTINCT l_orderkey) AS n_orders,
             |  STRFTIME(MIN(l_shipdate), '%Y-%m-%d') AS first_ship,
             |  STRFTIME(MAX(l_shipdate), '%Y-%m-%d') AS last_ship
             |FROM lineitem""".stripMargin)),

    QueryDef("q03_distinct",
      (s, d) => li(s, d).select("l_returnflag", "l_linestatus").distinct()
        .orderBy("l_returnflag", "l_linestatus"),
      Some("""SELECT DISTINCT l_returnflag, l_linestatus
             |FROM lineitem ORDER BY 1, 2""".stripMargin)),

    // P2/predicate pushdown: selective filter reaching the parquet scan
    QueryDef("q04_filtered_revenue",
      (s, d) => li(s, d)
        .where(to_date(col("l_shipdate")).between("1996-01-01", "1996-12-31") &&
          col("l_discount").between(0.02, 0.06) && col("l_quantity") < 25)
        .agg(round(sum(col("l_extendedprice") * col("l_discount")), 4).as("revenue"),
          count(lit(1)).as("n")),
      Some("""SELECT ROUND(SUM(l_extendedprice * l_discount), 4) AS revenue,
             |  COUNT(*) AS n
             |FROM lineitem
             |WHERE CAST(l_shipdate AS DATE) BETWEEN '1996-01-01' AND '1996-12-31'
             |  AND l_discount BETWEEN 0.02 AND 0.06 AND l_quantity < 25""".stripMargin)),

    // J3 analog: broadcast hash join with a small dimension
    QueryDef("q05_join_broadcast",
      (s, d) => {
        val p = table(s, d, "part")
        li(s, d).join(broadcast(p), col("l_partkey") === col("p_partkey"))
          .groupBy("p_brand")
          .agg(round(sum("l_quantity"), 4).as("total_qty"),
            count(lit(1)).as("n_items"),
            round(avg("l_extendedprice"), 6).as("avg_price"))
          .orderBy("p_brand")
      },
      Some("""SELECT p_brand,
             |  ROUND(SUM(l_quantity), 4) AS total_qty,
             |  COUNT(*) AS n_items,
             |  ROUND(AVG(l_extendedprice), 6) AS avg_price
             |FROM lineitem JOIN part ON l_partkey = p_partkey
             |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // J1/J2 analog: multi-way equi-join chain
    QueryDef("q06_join_multiway",
      (s, d) => {
        val r = table(s, d, "region"); val n = table(s, d, "nation")
        cust(s, d)
          .join(n, col("c_nationkey") === col("n_nationkey"))
          .join(r, col("n_regionkey") === col("r_regionkey"))
          .join(ord(s, d), col("o_custkey") === col("c_custkey"))
          .groupBy("r_name")
          .agg(round(sum("o_totalprice"), 4).as("revenue"),
            count(lit(1)).as("n_orders"),
            countDistinct("c_custkey").as("n_customers"))
          .orderBy("r_name")
      },
      Some("""SELECT r_name,
             |  ROUND(SUM(o_totalprice), 4) AS revenue,
             |  COUNT(*) AS n_orders,
             |  COUNT(DISTINCT c_custkey) AS n_customers
             |FROM customer
             |JOIN nation ON c_nationkey = n_nationkey
             |JOIN region ON n_regionkey = r_regionkey
             |JOIN orders ON o_custkey = c_custkey
             |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // J4 analog: full-outer join with zero-padding
    QueryDef("q07_join_full_outer",
      (s, d) => {
        val cn = cust(s, d).groupBy(col("c_nationkey").as("cnk"))
          .agg(count(lit(1)).as("n_cust"))
        val sn = table(s, d, "supplier").groupBy(col("s_nationkey").as("snk"))
          .agg(count(lit(1)).as("n_supp"))
        cn.join(sn, col("cnk") === col("snk"), "full_outer")
          .select(coalesce(col("cnk"), col("snk")).as("nationkey"),
            coalesce(col("n_cust"), lit(0L)).as("n_cust"),
            coalesce(col("n_supp"), lit(0L)).as("n_supp"))
          .orderBy("nationkey")
      },
      Some("""SELECT COALESCE(cnk, snk) AS nationkey,
             |  COALESCE(n_cust, 0) AS n_cust,
             |  COALESCE(n_supp, 0) AS n_supp
             |FROM (SELECT c_nationkey cnk, COUNT(*) AS n_cust FROM customer GROUP BY 1) c
             |FULL OUTER JOIN
             |     (SELECT s_nationkey snk, COUNT(*) AS n_supp FROM supplier GROUP BY 1) s
             |ON cnk = snk
             |ORDER BY nationkey""".stripMargin)),

    QueryDef("q08_semi_join",
      (s, d) => cust(s, d)
        .join(ord(s, d), col("c_custkey") === col("o_custkey"), "left_semi")
        .groupBy("c_mktsegment").agg(count(lit(1)).as("n_customers"))
        .orderBy("c_mktsegment"),
      Some("""SELECT c_mktsegment, COUNT(*) AS n_customers
             |FROM customer
             |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
             |GROUP BY 1 ORDER BY 1""".stripMargin)),

    QueryDef("q09_anti_join",
      (s, d) => cust(s, d)
        .join(ord(s, d), col("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy("c_nationkey").agg(count(lit(1)).as("n_customers"))
        .orderBy("c_nationkey"),
      Some("""SELECT c_nationkey, COUNT(*) AS n_customers
             |FROM customer
             |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
             |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // theta / non-equi join against an inline band table
    QueryDef("q10_theta_band_join",
      (s, d) => {
        val s2 = s; import s2.implicits._
        val bands = Seq(("small", 1, 10), ("medium", 11, 25), ("large", 26, 50))
          .toDF("band", "lo", "hi")
        table(s, d, "part")
          .join(broadcast(bands),
            col("p_size") >= col("lo") && col("p_size") <= col("hi"))
          .groupBy("band")
          .agg(count(lit(1)).as("n_parts"),
            round(avg("p_retailprice"), 6).as("avg_price"))
          .orderBy("band")
      },
      Some("""SELECT band, COUNT(*) AS n_parts,
             |  ROUND(AVG(p_retailprice), 6) AS avg_price
             |FROM part
             |JOIN (VALUES ('small', 1, 10), ('medium', 11, 25), ('large', 26, 50))
             |  b(band, lo, hi)
             |ON p_size BETWEEN lo AND hi
             |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // window: ranked top-k per group
    QueryDef("q11_window_topk",
      (s, d) => {
        val w = Window.partitionBy("p_brand")
          .orderBy(col("p_retailprice").desc, col("p_partkey").asc)
        table(s, d, "part")
          .withColumn("rk", row_number().over(w))
          .where(col("rk") <= 3)
          .select("p_brand", "rk", "p_partkey", "p_retailprice")
          .orderBy("p_brand", "rk")
      },
      Some("""SELECT p_brand, rk, p_partkey, p_retailprice FROM (
             |  SELECT p_brand, p_partkey, p_retailprice,
             |    ROW_NUMBER() OVER (PARTITION BY p_brand
             |      ORDER BY p_retailprice DESC, p_partkey ASC) AS rk
             |  FROM part) t
             |WHERE rk <= 3 ORDER BY p_brand, rk""".stripMargin)),

    // window: running sum + lag over a deterministic total order
    QueryDef("q12_window_running",
      (s, d) => {
        val w = Window.partitionBy("l_suppkey")
          .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"))
        li(s, d).where(col("l_suppkey") <= 5)
          .withColumn("running_qty",
            round(sum("l_quantity").over(
              w.rowsBetween(Window.unboundedPreceding, Window.currentRow)), 4))
          .withColumn("prev_qty", lag(col("l_quantity"), 1, 0.0).over(w))
          .withColumn("rn", row_number().over(w))
          .select("l_suppkey", "rn", "l_orderkey", "l_linenumber",
            "l_quantity", "running_qty", "prev_qty")
          .orderBy("l_suppkey", "rn")
      },
      Some("""SELECT l_suppkey, rn, l_orderkey, l_linenumber, l_quantity,
             |  running_qty, prev_qty FROM (
             |  SELECT l_suppkey, l_orderkey, l_linenumber, l_quantity,
             |    ROUND(SUM(l_quantity) OVER (PARTITION BY l_suppkey
             |      ORDER BY l_shipdate, l_orderkey, l_linenumber
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4) AS running_qty,
             |    LAG(l_quantity, 1, 0.0) OVER (PARTITION BY l_suppkey
             |      ORDER BY l_shipdate, l_orderkey, l_linenumber) AS prev_qty,
             |    ROW_NUMBER() OVER (PARTITION BY l_suppkey
             |      ORDER BY l_shipdate, l_orderkey, l_linenumber) AS rn
             |  FROM lineitem WHERE l_suppkey <= 5) t
             |ORDER BY l_suppkey, rn""".stripMargin)),

    // set operations
    QueryDef("q13_set_ops",
      (s, d) => {
        val cn = cust(s, d).select(col("c_nationkey").as("n")).distinct()
        val sn = table(s, d, "supplier").select(col("s_nationkey").as("n")).distinct()
        cn.intersect(sn).withColumn("kind", lit("both"))
          .unionByName(cn.except(sn).withColumn("kind", lit("cust_only")))
          .unionByName(sn.except(cn).withColumn("kind", lit("supp_only")))
          .select("kind", "n")
          .orderBy("kind", "n")
      },
      Some("""SELECT 'both' AS kind, n FROM
             |  (SELECT DISTINCT c_nationkey AS n FROM customer
             |   INTERSECT SELECT DISTINCT s_nationkey FROM supplier) t1
             |UNION ALL
             |SELECT 'cust_only', n FROM
             |  (SELECT DISTINCT c_nationkey AS n FROM customer
             |   EXCEPT SELECT DISTINCT s_nationkey FROM supplier) t2
             |UNION ALL
             |SELECT 'supp_only', n FROM
             |  (SELECT DISTINCT s_nationkey AS n FROM supplier
             |   EXCEPT SELECT DISTINCT c_nationkey FROM customer) t3
             |ORDER BY kind, n""".stripMargin)),

    QueryDef("q14_rollup",
      (s, d) => ord(s, d)
        .rollup("o_orderstatus", "o_orderpriority")
        .agg(count(lit(1)).as("n"), round(sum("o_totalprice"), 4).as("revenue"))
        .select(coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
          coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
          col("n"), col("revenue"))
        .orderBy("status", "priority"),
      Some("""SELECT COALESCE(o_orderstatus, 'ALL') AS status,
             |  COALESCE(o_orderpriority, 'ALL') AS priority,
             |  COUNT(*) AS n, ROUND(SUM(o_totalprice), 4) AS revenue
             |FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
             |ORDER BY status, priority""".stripMargin)),

    QueryDef("q15_cube",
      (s, d) => li(s, d)
        .cube("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("n"), round(sum("l_quantity"), 4).as("qty"))
        .select(coalesce(col("l_returnflag"), lit("ALL")).as("returnflag"),
          coalesce(col("l_linestatus"), lit("ALL")).as("linestatus"),
          col("n"), col("qty"))
        .orderBy("returnflag", "linestatus"),
      Some("""SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
             |  COALESCE(l_linestatus, 'ALL') AS linestatus,
             |  COUNT(*) AS n, ROUND(SUM(l_quantity), 4) AS qty
             |FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
             |ORDER BY returnflag, linestatus""".stripMargin)),

    QueryDef("q16_topk",
      (s, d) => ord(s, d)
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .limit(10)
        .select("o_orderkey", "o_totalprice"),
      Some("""SELECT o_orderkey, o_totalprice FROM orders
             |ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10""".stripMargin)),

    // scalar string-function family
    QueryDef("q17_string_funcs",
      (s, d) => table(s, d, "part")
        .where(col("p_partkey") % 97 === 0)
        .select(
          col("p_partkey"),
          upper(col("p_name")).as("name_upper"),
          lower(col("p_brand")).as("brand_lower"),
          length(col("p_name")).cast("long").as("name_len"),
          element_at(split(col("p_name"), " "), 1).as("first_word"),
          regexp_replace(col("p_name"), "[aeiou]", "").as("consonants"),
          lpad(col("p_brand"), 12, "*").as("brand_padded"),
          substring(col("p_name"), 1, 3).as("name_prefix"),
          concat_ws("|", col("p_brand"), col("p_type")).as("brand_type"))
        .orderBy("p_partkey"),
      Some("""SELECT p_partkey,
             |  UPPER(p_name) AS name_upper,
             |  LOWER(p_brand) AS brand_lower,
             |  LENGTH(p_name) AS name_len,
             |  string_split(p_name, ' ')[1] AS first_word,
             |  REGEXP_REPLACE(p_name, '[aeiou]', '', 'g') AS consonants,
             |  LPAD(p_brand, 12, '*') AS brand_padded,
             |  SUBSTRING(p_name, 1, 3) AS name_prefix,
             |  CONCAT_WS('|', p_brand, p_type) AS brand_type
             |FROM part WHERE p_partkey % 97 = 0 ORDER BY p_partkey""".stripMargin)),

    QueryDef("q18_datetime",
      (s, d) => ord(s, d)
        .groupBy(year(col("o_orderdate")).as("yr"), month(col("o_orderdate")).as("mo"))
        .agg(count(lit(1)).as("n"), round(sum("o_totalprice"), 4).as("revenue"))
        .orderBy("yr", "mo"),
      Some("""SELECT CAST(EXTRACT(year FROM o_orderdate) AS INT) AS yr,
             |  CAST(EXTRACT(month FROM o_orderdate) AS INT) AS mo,
             |  COUNT(*) AS n, ROUND(SUM(o_totalprice), 4) AS revenue
             |FROM orders GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    QueryDef("q19_case_buckets",
      (s, d) => cust(s, d)
        .select(when(col("c_acctbal") < 0, "negative")
          .when(col("c_acctbal") < 3000, "low")
          .when(col("c_acctbal") < 7000, "mid")
          .otherwise("high").as("band"), col("c_acctbal"))
        .groupBy("band")
        .agg(count(lit(1)).as("n"), round(avg("c_acctbal"), 6).as("avg_bal"))
        .orderBy("band"),
      Some("""SELECT CASE WHEN c_acctbal < 0 THEN 'negative'
             |  WHEN c_acctbal < 3000 THEN 'low'
             |  WHEN c_acctbal < 7000 THEN 'mid'
             |  ELSE 'high' END AS band,
             |  COUNT(*) AS n, ROUND(AVG(c_acctbal), 6) AS avg_bal
             |FROM customer GROUP BY 1 ORDER BY 1""".stripMargin)),

    // event sessionization: lag + gap flag + running-sum session ids
    QueryDef("q20_events_sessionize",
      (s, d) => {
        val byUser = Window.partitionBy("user_id").orderBy(col("ts_us"), col("event_id"))
        events(s, d)
          .withColumn("prev_us", lag(col("ts_us"), 1).over(byUser))
          .withColumn("new_session",
            when(col("prev_us").isNull ||
              col("ts_us") - col("prev_us") > 1800L * 1000000L, 1L)
              .otherwise(0L))
          .withColumn("session_id", sum("new_session").over(
            byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .groupBy("user_id", "session_id")
          .agg(count(lit(1)).as("n_events"),
            (max(col("ts_us")) - min(col("ts_us"))).as("duration_us"),
            round(sum("value"), 4).as("total_value"))
          .orderBy("user_id", "session_id")
      },
      Some("""SELECT user_id, session_id, COUNT(*) AS n_events,
             |  MAX(us) - MIN(us) AS duration_us,
             |  ROUND(SUM(value), 4) AS total_value
             |FROM (
             |  SELECT user_id, us, value,
             |    CAST(SUM(new_session) OVER (PARTITION BY user_id
             |      ORDER BY us, event_id
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
             |  FROM (
             |    SELECT user_id, us, event_id, value,
             |      CASE WHEN prev_us IS NULL OR us - prev_us > 1800000000
             |        THEN 1 ELSE 0 END AS new_session
             |    FROM (
             |      SELECT user_id, epoch_us(ts) AS us, event_id, value,
             |        LAG(epoch_us(ts), 1) OVER (PARTITION BY user_id
             |          ORDER BY epoch_us(ts), event_id) AS prev_us
             |      FROM events) t1) t2) t3
             |GROUP BY user_id, session_id
             |ORDER BY user_id, session_id""".stripMargin)),

    // batch analog of a tumbling event-time window
    QueryDef("q21_events_hourly",
      (s, d) => events(s, d)
        .groupBy(date_format(timestamp_micros(col("ts_us")), "yyyy-MM-dd HH:00:00")
          .as("hour"), col("event_type"))
        .agg(count(lit(1)).as("n"), round(sum("value"), 4).as("total_value"))
        .orderBy("hour", "event_type"),
      Some("""SELECT STRFTIME(make_timestamp(epoch_us(ts)), '%Y-%m-%d %H:00:00') AS hour,
             |  event_type,
             |  COUNT(*) AS n, ROUND(SUM(value), 4) AS total_value
             |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    QueryDef("q22_events_json",
      (s, d) => events(s, d)
        .select(col("event_type"),
          get_json_object(col("props"), "$.k").cast("int").as("k"))
        .groupBy("event_type")
        .agg(sum("k").cast("long").as("sum_k"),
          count(lit(1)).as("n"),
          max("k").as("max_k"))
        .orderBy("event_type"),
      Some("""SELECT event_type,
             |  CAST(SUM(k) AS BIGINT) AS sum_k,
             |  COUNT(*) AS n,
             |  MAX(k) AS max_k
             |FROM (SELECT event_type,
             |        CAST(json_extract_string(props, '$.k') AS INT) AS k
             |      FROM events) t
             |GROUP BY 1 ORDER BY 1""".stripMargin)),
  )
}
