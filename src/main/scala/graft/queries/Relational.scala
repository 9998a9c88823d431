package graft.queries

import graft.{Q, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Family A — the relational SELECT surface (SURVEY §2.1–§2.8).
  *
  * The reference delegates its whole SELECT grammar to DuckDB
  * (`csv_tool.py:273-386`, `excel_tool.py:474-653`); here each
  * capability is a declarative DataFrame plan so Catalyst does
  * pushdown/pruning/join-reorder, and dimension joins are
  * broadcast only when fixed-size (nation/region; customer,
  * supplier and part scale with SF, so their joins are left to the
  * optimizer/AQE).
  */
object Relational {

  private val D12_2 = DecimalType(12, 2)

  /** Money/percent in integer cents: floor(x·100 + 0.5) as BIGINT
    * (half-up for these non-negative values). Per-row products then
    * stay in codegen'd long arithmetic — Spark's Decimal multiply
    * ALWAYS routes through java.math.BigDecimal (only +/− have a
    * compact fast path), and Spark's round() builds a BigDecimal PER
    * VALUE (measured ~0.3 s for the 4-column projection alone at
    * sf0.1); floor is a bare IEEE op. Oracle twin:
    * `CAST(floor(x*100 + 0.5) AS BIGINT)` — floor first because
    * DuckDB's double→BIGINT cast rounds half-even while Spark's
    * truncates; floor-of-identical-doubles is exact on both. */
  private def cents(c: Column): Column = floor(c * 100 + 0.5)

  /** Overflow-safe EXACT sum of a long-valued expression: the native
    * 128-bit accumulator ([[graft.functions.Sum128]]) — two compact
    * long buffer slots, wrapping-add + carry in whole-stage codegen,
    * DECIMAL(38,0) materialized once per group. Replaces the earlier
    * `sum(CAST(x AS DECIMAL(18,0)))`, whose >18-precision accumulator
    * boxed a BigDecimal per update (measured ~2.5× slower at 600 k
    * rows). Oracle twin: DuckDB `SUM(BIGINT)` is HUGEINT(int128)-exact
    * — the same arithmetic. Cast to DOUBLE and de-scale at the end. */
  private def sumExact(c: Column): Column =
    graft.functions.Sum128.sum128(c.cast("long"))

  // ---------------------------------------------------------------
  // q01 pricing summary — full-scan groupBy w/ exact decimal sums
  // (SQL GROUP BY contract, csv_tool.py:301-303; TPC-H Q1 shape)
  val q01 = Q(
    "q01_pricing_summary",
    """WITH c AS (SELECT l_returnflag, l_linestatus,
      |    CAST(floor(l_quantity*100 + 0.5) AS BIGINT) AS qc,
      |    CAST(floor(l_extendedprice*100 + 0.5) AS BIGINT) AS epc,
      |    CAST(floor(l_discount*100 + 0.5) AS BIGINT) AS dc,
      |    CAST(floor(l_tax*100 + 0.5) AS BIGINT) AS tc
      |  FROM lineitem)
      |SELECT l_returnflag, l_linestatus,
      |  CAST(SUM(qc) AS DOUBLE) / 100.0 AS sum_qty,
      |  CAST(SUM(epc) AS DOUBLE) / 100.0 AS sum_base_price,
      |  CAST(SUM(epc * (100 - dc)) AS DOUBLE) / 10000.0 AS sum_disc_price,
      |  CAST(SUM(epc * (100 - dc) * (100 + tc)) AS DOUBLE) / 1000000.0 AS sum_charge,
      |  CAST(SUM(qc) AS DOUBLE) / 100.0 / COUNT(*) AS avg_qty,
      |  CAST(SUM(epc) AS DOUBLE) / 100.0 / COUNT(*) AS avg_price,
      |  CAST(SUM(dc) AS DOUBLE) / 100.0 / COUNT(*) AS avg_disc,
      |  COUNT(*) AS count_order
      |FROM c GROUP BY l_returnflag, l_linestatus""".stripMargin) {
    (s, dir) =>
      Tables.load(s, dir, "lineitem")
        .select(col("l_returnflag"), col("l_linestatus"),
          cents(col("l_quantity")).as("qc"),
          cents(col("l_extendedprice")).as("epc"),
          cents(col("l_discount")).as("dc"),
          cents(col("l_tax")).as("tc"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          (sumExact(col("qc")).cast(DoubleType) / 100.0).as("sum_qty"),
          (sumExact(col("epc")).cast(DoubleType) / 100.0)
            .as("sum_base_price"),
          (sumExact(col("epc") * (lit(100L) - col("dc")))
            .cast(DoubleType) / 10000.0).as("sum_disc_price"),
          (sumExact(col("epc") * (lit(100L) - col("dc")) *
            (lit(100L) + col("tc"))).cast(DoubleType) / 1000000.0)
            .as("sum_charge"),
          (sumExact(col("qc")).cast(DoubleType) / 100.0 / count(lit(1)))
            .as("avg_qty"),
          (sumExact(col("epc")).cast(DoubleType) / 100.0 / count(lit(1)))
            .as("avg_price"),
          (sumExact(col("dc")).cast(DoubleType) / 100.0 / count(lit(1)))
            .as("avg_disc"),
          count(lit(1)).as("count_order"))
  }

  // ---------------------------------------------------------------
  // q02 filter + project + ORDER BY ... LIMIT with unique tiebreak
  // (csv_sql contract `SELECT name, price FROM data ORDER BY price
  //  DESC LIMIT 5`, csv_tool.py:305-306)
  val q02 = Q(
    "q02_filter_topk",
    """SELECT o_orderkey, o_custkey,
      |  CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS DOUBLE) AS total_price,
      |  CAST(o_orderdate AS DATE) AS order_date
      |FROM orders WHERE o_orderstatus = 'O'
      |ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin) {
    (s, dir) =>
      // rank on the RAW price — the oracle's ORDER BY o_totalprice
      // sees unrounded values, so ordering on the DECIMAL-cast output
      // column would pick a different row set whenever prices carry
      // sub-cent precision
      Tables.load(s, dir, "orders")
        .filter(col("o_orderstatus") === "O")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(10)
        .select(
          col("o_orderkey"), col("o_custkey"),
          col("o_totalprice").cast(D12_2).cast(DoubleType).as("total_price"),
          col("o_orderdate").cast(DateType).as("order_date"))
  }

  // ---------------------------------------------------------------
  // q03 revenue per nation — fact⋈fact shuffle join + broadcast dims
  // (multi-table equi-join contract, excel_tool.py:505-509)
  val q03 = Q(
    "q03_revenue_by_nation",
    """SELECT n.n_name AS nation,
      |  CAST(SUM(CAST(floor(l.l_extendedprice*100 + 0.5) AS BIGINT) *
      |           (100 - CAST(floor(l.l_discount*100 + 0.5) AS BIGINT))) AS DOUBLE)
      |    / 10000.0 AS revenue,
      |  COUNT(*) AS n_items
      |FROM lineitem l
      |JOIN orders o ON l.l_orderkey = o.o_orderkey
      |JOIN customer c ON o.o_custkey = c.c_custkey
      |JOIN nation n ON c.c_nationkey = n.n_nationkey
      |GROUP BY n.n_name""".stripMargin) { (s, dir) =>
    val li = Tables.load(s, dir, "lineitem")
    val o = Tables.load(s, dir, "orders")
    val c = Tables.load(s, dir, "customer")
    val n = Tables.load(s, dir, "nation")
    // customer scales with SF (TPC-H: SF x 150k rows) — no forced
    // broadcast; AQE picks broadcast at small SF and shuffles at scale.
    // nation is a true fixed-size dim (25 rows) and stays hinted.
    li.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name").as("nation"))
      .agg(
        (sumExact(cents(col("l_extendedprice")) *
          (lit(100L) - cents(col("l_discount"))))
          .cast(DoubleType) / 10000.0).as("revenue"),
        count(lit(1)).as("n_items"))
  }

  // ---------------------------------------------------------------
  // q04 top-k customers by revenue (top-k contract, SURVEY §2.6)
  val q04 = Q(
    "q04_top_customers",
    """SELECT c.c_custkey, c.c_name,
      |  CAST(SUM(CAST(o.o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS revenue,
      |  COUNT(*) AS n_orders
      |FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
      |GROUP BY c.c_custkey, c.c_name
      |ORDER BY revenue DESC, c_custkey LIMIT 10""".stripMargin) { (s, dir) =>
    val c = Tables.load(s, dir, "customer")
    val o = Tables.load(s, dir, "orders")
    // aggregate the fact table BEFORE the join: at scale the
    // per-customer partial agg is tiny vs joining raw orders first
    val byCust = o.groupBy("o_custkey").agg(
      sum(col("o_totalprice").cast(D12_2)).cast(DoubleType).as("revenue"),
      count(lit(1)).as("n_orders"))
    byCust.join(c, col("o_custkey") === col("c_custkey"))
      .select(col("c_custkey"), col("c_name"), col("revenue"), col("n_orders"))
      .orderBy(col("revenue").desc, col("c_custkey"))
      .limit(10)
  }

  // ---------------------------------------------------------------
  // q05 region revenue — 5-way join through the dim hierarchy
  val q05 = Q(
    "q05_region_revenue",
    """SELECT r.r_name AS region,
      |  CAST(SUM(CAST(floor(l.l_extendedprice*100 + 0.5) AS BIGINT) *
      |           (100 - CAST(floor(l.l_discount*100 + 0.5) AS BIGINT))) AS DOUBLE)
      |    / 10000.0 AS revenue
      |FROM lineitem l
      |JOIN orders o ON l.l_orderkey = o.o_orderkey
      |JOIN customer c ON o.o_custkey = c.c_custkey
      |JOIN nation n ON c.c_nationkey = n.n_nationkey
      |JOIN region r ON n.n_regionkey = r.r_regionkey
      |GROUP BY r.r_name""".stripMargin) { (s, dir) =>
    val li = Tables.load(s, dir, "lineitem")
    val o = Tables.load(s, dir, "orders")
    val c = Tables.load(s, dir, "customer")
    val n = Tables.load(s, dir, "nation")
    val r = Tables.load(s, dir, "region")
    li.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name").as("region"))
      .agg((sumExact(cents(col("l_extendedprice")) *
        (lit(100L) - cents(col("l_discount"))))
        .cast(DoubleType) / 10000.0).as("revenue"))
  }

  // ---------------------------------------------------------------
  // q06 selective filter + single agg (predicate-pushdown showcase;
  // TPC-H Q6 shape — filters reach the parquet scan)
  val q06 = Q(
    "q06_selective_agg",
    """SELECT
      |  CAST(SUM(CAST(floor(l_extendedprice*100 + 0.5) AS BIGINT) *
      |           CAST(floor(l_discount*100 + 0.5) AS BIGINT)) AS DOUBLE)
      |    / 10000.0 AS promo_revenue,
      |  COUNT(*) AS n_rows
      |FROM lineitem
      |WHERE l_discount >= 0.05 AND l_quantity < 25
      |  AND CAST(l_shipdate AS DATE) >= DATE '1995-01-01'""".stripMargin) {
    (s, dir) =>
      Tables.load(s, dir, "lineitem")
        .filter(col("l_discount") >= 0.05 && col("l_quantity") < 25 &&
          col("l_shipdate").cast(DateType) >= lit("1995-01-01").cast(DateType))
        .agg(
          (sumExact(cents(col("l_extendedprice")) *
            cents(col("l_discount"))).cast(DoubleType) / 10000.0)
            .as("promo_revenue"),
          count(lit(1)).as("n_rows"))
  }

  // ---------------------------------------------------------------
  // q07 semi-join: customers having at least one high-value order
  // (EXISTS; reference tool-availability joins, SURVEY §2.3)
  val q07 = Q(
    "q07_semi_join",
    """SELECT c_custkey, c_name, c_mktsegment FROM customer c
      |WHERE EXISTS (SELECT 1 FROM orders o
      |              WHERE o.o_custkey = c.c_custkey
      |                AND o.o_totalprice > 100000)""".stripMargin) {
    (s, dir) =>
      val c = Tables.load(s, dir, "customer")
      val o = Tables.load(s, dir, "orders")
        .filter(col("o_totalprice") > 100000)
      c.join(o, col("c_custkey") === col("o_custkey"), "left_semi")
        .select("c_custkey", "c_name", "c_mktsegment")
  }

  // ---------------------------------------------------------------
  // q08 anti-join: customers with no urgent orders (NOT EXISTS;
  // missing-tools difference, executor.py:275 → left_anti)
  val q08 = Q(
    "q08_anti_join",
    """SELECT c_custkey, c_name FROM customer c
      |WHERE NOT EXISTS (SELECT 1 FROM orders o
      |                  WHERE o.o_custkey = c.c_custkey
      |                    AND o.o_orderpriority = '1-URGENT')""".stripMargin) {
    (s, dir) =>
      val c = Tables.load(s, dir, "customer")
      val o = Tables.load(s, dir, "orders")
        .filter(col("o_orderpriority") === "1-URGENT")
      c.join(o, col("c_custkey") === col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name")
  }

  // ---------------------------------------------------------------
  // q09 set ops — INTERSECT / EXCEPT / UNION (SURVEY §2.7)
  val q09 = Q(
    "q09_set_ops",
    """SELECT c_custkey FROM customer WHERE c_acctbal > 5000
      |INTERSECT
      |SELECT o_custkey AS c_custkey FROM orders WHERE o_totalprice > 150000
      |UNION
      |SELECT c_custkey FROM customer WHERE c_acctbal < 0
      |EXCEPT
      |SELECT o_custkey AS c_custkey FROM orders
      |WHERE o_orderstatus = 'F' AND o_totalprice > 250000""".stripMargin) {
    (s, dir) =>
      val c = Tables.load(s, dir, "customer")
      val o = Tables.load(s, dir, "orders")
      val rich = c.filter(col("c_acctbal") > 5000).select("c_custkey")
      val big = o.filter(col("o_totalprice") > 150000)
        .select(col("o_custkey").as("c_custkey"))
      val neg = c.filter(col("c_acctbal") < 0).select("c_custkey")
      val oldBig = o.filter(col("o_orderstatus") === "F" &&
          col("o_totalprice") > 250000)
        .select(col("o_custkey").as("c_custkey"))
      rich.intersect(big).union(neg).distinct().except(oldBig)
  }

  // ---------------------------------------------------------------
  // q10 GROUP BY ... HAVING (failure-rate > 0.10 filter shape,
  // builder/query.py:270)
  val q10 = Q(
    "q10_having",
    """SELECT p_brand, COUNT(*) AS n_parts,
      |  CAST(SUM(CAST(p_retailprice AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_price,
      |  CAST(MAX(CAST(p_retailprice AS DECIMAL(12,2))) AS DOUBLE) AS max_price
      |FROM part GROUP BY p_brand HAVING COUNT(*) > 5""".stripMargin) {
    (s, dir) =>
      Tables.load(s, dir, "part")
        .groupBy("p_brand")
        .agg(
          count(lit(1)).as("n_parts"),
          (sum(col("p_retailprice").cast(D12_2)).cast(DoubleType) /
            count(lit(1))).as("avg_price"),
          max(col("p_retailprice").cast(D12_2)).cast(DoubleType)
            .as("max_price"))
        .filter(col("n_parts") > 5)
  }

  // ---------------------------------------------------------------
  // q11 string functions (LOWER/LIKE/substring/length contracts,
  // csv_tool.py:308-309, excel_tool.py:656-790, safe_eval.py:199-208)
  val q11 = Q(
    "q11_string_ops",
    """SELECT p_partkey,
      |  UPPER(p_brand) AS brand_upper,
      |  SUBSTRING(p_name, 1, 12) AS name_prefix,
      |  LENGTH(p_name) AS name_len,
      |  CASE WHEN p_type LIKE '%BRASS%' THEN 'brass' ELSE 'other' END AS type_class
      |FROM part
      |WHERE LOWER(p_name) LIKE '%a%' AND p_size >= 10
      |ORDER BY p_partkey LIMIT 100""".stripMargin) { (s, dir) =>
    Tables.load(s, dir, "part")
      .filter(lower(col("p_name")).like("%a%") && col("p_size") >= 10)
      .select(
        col("p_partkey"),
        upper(col("p_brand")).as("brand_upper"),
        substring(col("p_name"), 1, 12).as("name_prefix"),
        length(col("p_name")).as("name_len"),
        when(col("p_type").like("%BRASS%"), "brass").otherwise("other")
          .as("type_class"))
      .orderBy("p_partkey")
      .limit(100)
  }

  // ---------------------------------------------------------------
  // q12 date breakdown — year/month extraction + grouping
  // (ISO timestamp handling, SURVEY §2.8)
  val q12 = Q(
    "q12_date_breakdown",
    """SELECT CAST(EXTRACT(year FROM o_orderdate) AS INT) AS order_year,
      |  CAST(EXTRACT(month FROM o_orderdate) AS INT) AS order_month,
      |  COUNT(*) AS n_orders,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total,
      |  COUNT(DISTINCT o_custkey) AS n_customers
      |FROM orders GROUP BY 1, 2""".stripMargin) { (s, dir) =>
    Tables.load(s, dir, "orders")
      .groupBy(
        year(col("o_orderdate")).as("order_year"),
        month(col("o_orderdate")).as("order_month"))
      .agg(
        count(lit(1)).as("n_orders"),
        sum(col("o_totalprice").cast(D12_2)).cast(DoubleType).as("total"),
        countDistinct(col("o_custkey")).as("n_customers"))
  }

  // ---------------------------------------------------------------
  // q13 conditional aggregation — CASE WHEN routing predicates
  // (edge-condition semantics, edge.py:39-46 → when/otherwise)
  val q13 = Q(
    "q13_conditional_agg",
    """SELECT o_orderstatus,
      |  COUNT(*) AS n_orders,
      |  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS n_high_priority,
      |  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*) AS high_priority_rate,
      |  CAST(SUM(CASE WHEN o_totalprice > 200000 THEN 1 ELSE 0 END) AS BIGINT) AS n_big
      |FROM orders GROUP BY o_orderstatus""".stripMargin) { (s, dir) =>
    val hi = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    Tables.load(s, dir, "orders")
      .groupBy("o_orderstatus")
      .agg(
        count(lit(1)).as("n_orders"),
        sum(when(hi, 1).otherwise(0)).as("n_high_priority"),
        (sum(when(hi, 1).otherwise(0)).cast(DoubleType) / count(lit(1)))
          .as("high_priority_rate"),
        sum(when(col("o_totalprice") > 200000, 1).otherwise(0)).as("n_big"))
  }

  // ---------------------------------------------------------------
  // q14 decorrelated subquery — orders above their customer's mean
  // (summary-fallback lookup shape, storage/backend.py:116-127)
  val q14 = Q(
    "q14_above_avg_orders",
    """WITH cust_avg AS (
      |  SELECT o_custkey,
      |    CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_price
      |  FROM orders GROUP BY o_custkey)
      |SELECT o.o_orderkey, o.o_custkey,
      |  CAST(CAST(o.o_totalprice AS DECIMAL(12,2)) AS DOUBLE) AS total_price,
      |  a.avg_price AS cust_avg_price
      |FROM orders o JOIN cust_avg a ON o.o_custkey = a.o_custkey
      |WHERE o.o_totalprice > 1.5 * a.avg_price""".stripMargin) { (s, dir) =>
    val o = Tables.load(s, dir, "orders")
    val avg = o.groupBy("o_custkey").agg(
      (sum(col("o_totalprice").cast(D12_2)).cast(DoubleType) /
        count(lit(1))).as("avg_price"))
    o.join(avg, Seq("o_custkey"))
      .filter(col("o_totalprice") > lit(1.5) * col("avg_price"))
      .select(
        col("o_orderkey"), col("o_custkey"),
        col("o_totalprice").cast(D12_2).cast(DoubleType).as("total_price"),
        col("avg_price").as("cust_avg_price"))
  }

  // ---------------------------------------------------------------
  // q15 window rank — top-3 parts by price within each brand
  // (modal-choice row_number()=1 shape, builder/query.py:453-462)
  val q15 = Q(
    "q15_window_rank",
    """SELECT p_brand, p_partkey,
      |  CAST(CAST(p_retailprice AS DECIMAL(12,2)) AS DOUBLE) AS price, rnk
      |FROM (SELECT p_brand, p_partkey, p_retailprice,
      |        ROW_NUMBER() OVER (PARTITION BY p_brand
      |          ORDER BY p_retailprice DESC, p_partkey) AS rnk
      |      FROM part) t WHERE rnk <= 3""".stripMargin) { (s, dir) =>
    val w = Window.partitionBy("p_brand")
      .orderBy(col("p_retailprice").desc, col("p_partkey"))
    Tables.load(s, dir, "part")
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 3)
      .select(
        col("p_brand"), col("p_partkey"),
        col("p_retailprice").cast(D12_2).cast(DoubleType).as("price"),
        col("rnk"))
  }

  // ---------------------------------------------------------------
  // q16 running aggregate — cumulative spend per customer over time
  // (RunMetrics incremental agg shape, run.py:111-131)
  val q16 = Q(
    "q16_running_total",
    """SELECT o_custkey, o_orderkey,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2)))
      |    OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
      |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_spend,
      |  ROW_NUMBER() OVER (PARTITION BY o_custkey
      |    ORDER BY o_orderdate, o_orderkey) AS order_seq
      |FROM orders""".stripMargin) { (s, dir) =>
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    Tables.load(s, dir, "orders")
      .select(
        col("o_custkey"), col("o_orderkey"),
        sum(col("o_totalprice").cast(D12_2))
          .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .cast(DoubleType).as("running_spend"),
        row_number().over(w).as("order_seq"))
  }

  // ---------------------------------------------------------------
  // q17 lag — gap in days between consecutive orders per customer
  // (stall-detection lag shape, event_loop_node.py:2047-2055)
  val q17 = Q(
    "q17_order_gaps",
    """SELECT o_custkey, o_orderkey,
      |  DATEDIFF('day',
      |    LAG(CAST(o_orderdate AS DATE)) OVER (PARTITION BY o_custkey
      |      ORDER BY o_orderdate, o_orderkey),
      |    CAST(o_orderdate AS DATE)) AS gap_days
      |FROM orders""".stripMargin) { (s, dir) =>
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    Tables.load(s, dir, "orders")
      .select(
        col("o_custkey"), col("o_orderkey"),
        datediff(
          col("o_orderdate").cast(DateType),
          lag(col("o_orderdate").cast(DateType), 1).over(w)).as("gap_days"))
  }

  // ---------------------------------------------------------------
  // q18 rollup — multi-level aggregation with grouping id
  // (grouping sets noted free via spark.sql, SURVEY §2.4)
  val q18 = Q(
    "q18_rollup",
    """SELECT COALESCE(l_returnflag, '<all>') AS return_flag,
      |  COALESCE(l_linestatus, '<all>') AS line_status,
      |  GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS grouping_lvl,
      |  COUNT(*) AS n_items,
      |  CAST(SUM(CAST(floor(l_quantity*100 + 0.5) AS BIGINT)) AS DOUBLE) / 100.0 AS sum_qty
      |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)""".stripMargin) {
    (s, dir) =>
      Tables.load(s, dir, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(
          (grouping(col("l_returnflag")) * 2 + grouping(col("l_linestatus")))
            .as("grouping_lvl"),
          count(lit(1)).as("n_items"),
          (sumExact(cents(col("l_quantity"))).cast(DoubleType) / 100.0)
            .as("sum_qty"))
        .select(
          coalesce(col("l_returnflag"), lit("<all>")).as("return_flag"),
          coalesce(col("l_linestatus"), lit("<all>")).as("line_status"),
          col("grouping_lvl"), col("n_items"), col("sum_qty"))
  }

  // ---------------------------------------------------------------
  // q19 manual variance/stddev via exact sums — order-independent
  // (perf-stats aggregations, builder/query.py:366-396)
  val q19 = Q(
    "q19_dispersion",
    """WITH s AS (
      |  SELECT p_type, COUNT(*) AS n,
      |    CAST(SUM(CAST(floor(p_retailprice*100 + 0.5) AS BIGINT)) AS DOUBLE) / 100.0 AS sx,
      |    CAST(SUM(CAST(floor(p_retailprice*100 + 0.5) AS BIGINT) *
      |             CAST(floor(p_retailprice*100 + 0.5) AS BIGINT)) AS DOUBLE) / 10000.0 AS sxx
      |  FROM part GROUP BY p_type)
      |SELECT p_type, n, sx / n AS mean_price,
      |  CASE WHEN n > 1 THEN (sxx - sx * sx / n) / (n - 1) ELSE NULL END AS var_price
      |FROM s""".stripMargin) { (s, dir) =>
    val px = cents(col("p_retailprice"))
    Tables.load(s, dir, "part")
      .groupBy("p_type")
      .agg(
        count(lit(1)).as("n"),
        (sumExact(px).cast(DoubleType) / 100.0).as("sx"),
        (sumExact(px * px).cast(DoubleType) / 10000.0).as("sxx"))
      .select(
        col("p_type"), col("n"),
        (col("sx") / col("n")).as("mean_price"),
        when(col("n") > 1,
          (col("sxx") - col("sx") * col("sx") / col("n")) / (col("n") - 1))
          .otherwise(lit(null)).as("var_price"))
  }

  // ---------------------------------------------------------------
  // q20 multi-fact join: supplier-part shipping volumes
  val q20 = Q(
    "q20_supplier_part_volume",
    """SELECT s.s_name, p.p_brand,
      |  CAST(SUM(CAST(floor(l.l_quantity*100 + 0.5) AS BIGINT)) AS DOUBLE) / 100.0 AS total_qty,
      |  COUNT(*) AS n_shipments
      |FROM lineitem l
      |JOIN supplier s ON l.l_suppkey = s.s_suppkey
      |JOIN part p ON l.l_partkey = p.p_partkey
      |GROUP BY s.s_name, p.p_brand""".stripMargin) { (s, dir) =>
    val li = Tables.load(s, dir, "lineitem")
    val sup = Tables.load(s, dir, "supplier")
    val p = Tables.load(s, dir, "part")
    // supplier/part scale with SF (SF x 10k / 200k rows) — let the
    // optimizer pick the strategy instead of forcing a broadcast
    li.join(sup, col("l_suppkey") === col("s_suppkey"))
      .join(p, col("l_partkey") === col("p_partkey"))
      .groupBy("s_name", "p_brand")
      .agg(
        (sumExact(cents(col("l_quantity"))).cast(DoubleType) / 100.0)
          .as("total_qty"),
        count(lit(1)).as("n_shipments"))
  }

  // ---------------------------------------------------------------
  // q21 CUBE — full grouping-set lattice over (status, priority) with
  // GROUPING() indicators disambiguating the subtotal rows (rollup is
  // q18; the cube is the general grouping-sets surface the SQL grammar
  // implies, SURVEY §2.4).
  val q21 = Q(
    "q21_cube",
    """SELECT o_orderstatus, o_orderpriority,
      |  CAST(GROUPING(o_orderstatus) AS INT) AS g_status,
      |  CAST(GROUPING(o_orderpriority) AS INT) AS g_priority,
      |  COUNT(*) AS n_orders,
      |  CAST(SUM(CAST(floor(o_totalprice*100 + 0.5) AS BIGINT)) AS DOUBLE) / 100.0 AS total
      |FROM orders
      |GROUP BY CUBE (o_orderstatus, o_orderpriority)""".stripMargin) {
    (s, dir) =>
      Tables.load(s, dir, "orders")
        .cube(col("o_orderstatus"), col("o_orderpriority"))
        .agg(
          grouping(col("o_orderstatus")).cast(IntegerType).as("g_status"),
          grouping(col("o_orderpriority")).cast(IntegerType)
            .as("g_priority"),
          count(lit(1)).as("n_orders"),
          (sumExact(cents(col("o_totalprice"))).cast(DoubleType) / 100.0)
            .as("total"))
  }

  /** Family-A end-to-end: the SAME SQL text runs through the gated
    * Spark SQL surface (SqlGate over registered views) and in DuckDB —
    * the strongest form of dialect parity the oracle can check. Only
    * the referenced tables register (a view registration reads the
    * parquet footer; 10 of them is measurable per-query overhead). */
  private def sqlQ(name: String, tables: Seq[String], sql: String): Q =
    Q(name, sql) { (s, dir) =>
      tables.foreach(t =>
        graft.Tables.load(s, dir, t).createOrReplaceTempView(t))
      graft.plans.SqlGate.query(s, sql)
    }

  // ---------------------------------------------------------------
  // q22 correlated EXISTS — customers with at least one urgent order
  // (subquery decorrelation is Catalyst's job, SURVEY §4.1)
  val q22 = sqlQ(
    "q22_exists_subquery", Seq("customer", "orders"),
    """SELECT c.c_mktsegment, COUNT(*) AS n_customers
      |FROM customer c
      |WHERE EXISTS (SELECT 1 FROM orders o
      |              WHERE o.o_custkey = c.c_custkey
      |                AND o.o_orderpriority = '1-URGENT')
      |GROUP BY c.c_mktsegment""".stripMargin)

  // ---------------------------------------------------------------
  // q23 scalar subquery — orders above the global mean price
  // (DECIMAL-exact mean so the threshold is bit-identical)
  val q23 = sqlQ(
    "q23_scalar_subquery", Seq("orders"),
    """SELECT o_orderstatus, COUNT(*) AS n_orders
      |FROM orders
      |WHERE o_totalprice >
      |  (SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE)
      |     / COUNT(*) FROM orders)
      |GROUP BY o_orderstatus""".stripMargin)

  // ---------------------------------------------------------------
  // q24 IN subquery — lineitems of parts in the largest-size decile
  val q24 = sqlQ(
    "q24_in_subquery", Seq("lineitem", "part"),
    """SELECT l_linestatus, COUNT(*) AS n_items,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS total_qty
      |FROM lineitem
      |WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_size >= 46)
      |GROUP BY l_linestatus""".stripMargin)

  // ---------------------------------------------------------------
  // q25 ranking distributions — ntile / percent_rank / cume_dist per
  // customer (the §2.5 distribution-rank family; quartile bucketing is
  // the per-group analog of e06's global quantiles). percent_rank and
  // cume_dist divide exact window integers in IEEE double, so both
  // engines hash identically; the order key carries the unique
  // o_orderkey tie-break.
  val q25 = Q(
    "q25_rank_distributions",
    """SELECT o_custkey, o_orderkey,
      |  CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS DOUBLE) AS price,
      |  CAST(NTILE(4) OVER w AS INT) AS quartile,
      |  PERCENT_RANK() OVER w AS pct_rank,
      |  CUME_DIST() OVER w AS cume
      |FROM orders
      |WINDOW w AS (PARTITION BY o_custkey
      |             ORDER BY o_totalprice, o_orderkey)""".stripMargin) {
    (s, dir) =>
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_totalprice"), col("o_orderkey"))
      Tables.load(s, dir, "orders")
        .select(
          col("o_custkey"), col("o_orderkey"),
          col("o_totalprice").cast(D12_2).cast(DoubleType).as("price"),
          ntile(4).over(w).as("quartile"),
          percent_rank().over(w).as("pct_rank"),
          cume_dist().over(w).as("cume"))
  }

  // ---------------------------------------------------------------
  // q26 column profiler — the Deequ-style data-quality pass every
  // ingest runs before training: per column, row/null/exact-distinct
  // counts plus min/max and an exact-DECIMAL mean for numerics,
  // lexicographic min/max for strings. ONE column list drives both
  // engines (a drifted column set cannot hash-match).
  //
  // One UNION branch PER COLUMN: each branch's scan prunes to a
  // single parquet column and the branches' stages schedule
  // independently. The one-pass alternatives were MEASURED and
  // rejected at sf0.1: explode-to-(col, value) pays the generator
  // (3.6–9 s), a single 5-distinct wide agg pays Spark's expand-per-
  // distinct planning (24 s) — the branch union is 1.2 s, and at
  // scale per-stage floors amortize while the pruned single-column
  // scans are exactly what a 100 TB columnar profiler wants. Mean
  // sums in DECIMAL(38,6) first (order-independent, bit-identical
  // cross-engine) and divides in double at the end; NULLIF guards
  // the all-null column. Profiles `events` — the ingest table, and
  // the one that scales in the campaign corpora.
  private val ProfileNumCols = Seq("event_id", "user_id", "value")
  private val ProfileStrCols = Seq("event_type", "props")
  val q26 = Q(
    "q26_column_profile",
    (ProfileNumCols.map(c =>
      s"""SELECT '$c' AS col_name, CAST(COUNT(*) AS BIGINT) AS n_rows,
        |  CAST(COUNT(*) - COUNT($c) AS BIGINT) AS n_null,
        |  CAST(COUNT(DISTINCT $c) AS BIGINT) AS n_distinct,
        |  MIN($c)::DOUBLE AS min_num, MAX($c)::DOUBLE AS max_num,
        |  CAST(SUM(CAST($c AS DECIMAL(38,6))) AS DOUBLE)
        |    / NULLIF(COUNT($c), 0) AS mean_num,
        |  NULL::VARCHAR AS min_str, NULL::VARCHAR AS max_str
        |FROM events""".stripMargin) ++
      ProfileStrCols.map(c =>
        s"""SELECT '$c', CAST(COUNT(*) AS BIGINT),
          |  CAST(COUNT(*) - COUNT($c) AS BIGINT),
          |  CAST(COUNT(DISTINCT $c) AS BIGINT),
          |  NULL::DOUBLE, NULL::DOUBLE, NULL::DOUBLE,
          |  MIN($c), MAX($c)
          |FROM events""".stripMargin))
      .mkString("\nUNION ALL\n")) { (s, dir) =>
    val ev = Tables.load(s, dir, "events")
    def base(c: String, extra: Column*) = {
      val aggs = Seq(count(lit(1)).as("n_rows"),
        (count(lit(1)) - count(col(c))).as("n_null"),
        countDistinct(col(c)).as("n_distinct"),
        min(col(c)).as("mn"), max(col(c)).as("mx")) ++ extra
      ev.agg(aggs.head, aggs.tail: _*)
    }
    val parts =
      ProfileNumCols.map(c => base(c,
        (sum(col(c).cast(DecimalType(38, 6))).cast(DoubleType) /
          nullif(count(col(c)), lit(0L))).as("mean"))
        .select(lit(c).as("col_name"),
          col("n_rows"), col("n_null"), col("n_distinct"),
          col("mn").cast(DoubleType).as("min_num"),
          col("mx").cast(DoubleType).as("max_num"),
          col("mean").as("mean_num"),
          lit(null).cast(StringType).as("min_str"),
          lit(null).cast(StringType).as("max_str"))) ++
      ProfileStrCols.map(c => base(c)
        .select(lit(c).as("col_name"),
          col("n_rows"), col("n_null"), col("n_distinct"),
          lit(null).cast(DoubleType).as("min_num"),
          lit(null).cast(DoubleType).as("max_num"),
          lit(null).cast(DoubleType).as("mean_num"),
          col("mn").as("min_str"), col("mx").as("max_str")))
    parts.reduce(_ unionAll _)
  }

  // ---------------------------------------------------------------
  // q27 data-quality constraint verdicts — the CHECK half of q26's
  // profile half (Deequ's Check/VerificationSuite shape, Schelter et
  // al. 2018 §3.2): declared constraints over the ingest table, each
  // evaluated to (metric, threshold, passed) in ONE corpus pass —
  // completeness(event_id/user_id/props), uniqueness(event_id),
  // non-negativity(value), and set-membership(event_type). The gate a
  // 100 TB ingest runs before admitting a partition: every metric is
  // a ratio of exact counts (deterministic in IEEE double on both
  // engines), the whole suite is ONE aggregate row fanned out to
  // |constraints| verdict rows — no second scan per check (Deequ's
  // own scan-sharing design), and the distinct for uniqueness is the
  // only non-trivially-mergeable term (q26/e21's documented class;
  // e14's HLL is the sketch alternative at the extreme).
  private val KnownEventTypes =
    Seq("click", "error", "purchase", "signup", "view")
  val q27 = Q(
    "q27_quality_checks",
    s"""WITH a AS (SELECT
      |    CAST(COUNT(*) AS BIGINT) AS n,
      |    CAST(COUNT(event_id) AS BIGINT) AS nn_id,
      |    CAST(COUNT(DISTINCT event_id) AS BIGINT) AS d_id,
      |    CAST(COUNT(user_id) AS BIGINT) AS nn_user,
      |    CAST(COUNT(props) AS BIGINT) AS nn_props,
      |    CAST(COUNT(value) AS BIGINT) AS nn_val,
      |    CAST(SUM(CASE WHEN value >= 0 THEN 1 ELSE 0 END) AS BIGINT)
      |      AS nonneg,
      |    CAST(SUM(CASE WHEN event_type IN
      |      (${KnownEventTypes.map(t => s"'$t'").mkString(",")})
      |      THEN 1 ELSE 0 END) AS BIGINT) AS known
      |  FROM events)
      |SELECT 'event_id_complete' AS check_name,
      |  nn_id::DOUBLE / n AS metric, 1.0::DOUBLE AS threshold,
      |  nn_id::DOUBLE / n >= 1.0 AS passed FROM a
      |UNION ALL SELECT 'event_id_unique',
      |  d_id::DOUBLE / nn_id, 1.0::DOUBLE,
      |  d_id::DOUBLE / nn_id >= 1.0 FROM a
      |UNION ALL SELECT 'user_id_complete',
      |  nn_user::DOUBLE / n, 0.99::DOUBLE,
      |  nn_user::DOUBLE / n >= 0.99 FROM a
      |UNION ALL SELECT 'props_complete',
      |  nn_props::DOUBLE / n, 0.99::DOUBLE,
      |  nn_props::DOUBLE / n >= 0.99 FROM a
      |UNION ALL SELECT 'value_nonnegative',
      |  nonneg::DOUBLE / nn_val, 0.95::DOUBLE,
      |  nonneg::DOUBLE / nn_val >= 0.95 FROM a
      |UNION ALL SELECT 'event_type_known',
      |  known::DOUBLE / n, 1.0::DOUBLE,
      |  known::DOUBLE / n >= 1.0 FROM a"""
      .stripMargin) { (s, dir) =>
    // pinned: ONE corpus pass feeds all six verdict branches (the
    // oracle's CTE computes once for the same reason)
    val a = graft.operators.Pin(Tables.load(s, dir, "events").agg(
      count(lit(1)).as("n"),
      count(col("event_id")).as("nn_id"),
      countDistinct(col("event_id")).as("d_id"),
      count(col("user_id")).as("nn_user"),
      count(col("props")).as("nn_props"),
      count(col("value")).as("nn_val"),
      sum(when(col("value") >= 0, 1L).otherwise(0L)).as("nonneg"),
      sum(when(col("event_type").isInCollection(KnownEventTypes), 1L)
        .otherwise(0L)).as("known")))
    def verdict(name: String, metric: Column, threshold: Double) =
      a.select(lit(name).as("check_name"),
        metric.as("metric"), lit(threshold).as("threshold"),
        (metric >= threshold).as("passed"))
    // empty-table guard (t09's pattern): a 0-denominator metric must
    // be the oracle's x/0 NULL, not an ANSI DIVIDE_BY_ZERO abort
    def frac(num: Column, den: Column): Column =
      when(den > 0, num.cast(DoubleType) / den)
    Seq(
      verdict("event_id_complete", frac(col("nn_id"), col("n")), 1.0),
      verdict("event_id_unique", frac(col("d_id"), col("nn_id")), 1.0),
      verdict("user_id_complete", frac(col("nn_user"), col("n")), 0.99),
      verdict("props_complete", frac(col("nn_props"), col("n")), 0.99),
      verdict("value_nonnegative",
        frac(col("nonneg"), col("nn_val")), 0.95),
      verdict("event_type_known", frac(col("known"), col("n")), 1.0))
      .reduce(_ unionAll _)
  }

  // ---------------------------------------------------------------
  // q28 — the reference's #1 query entry point made oracle-checked
  // (VERDICT r8 ask #4): `csv_sql` loads a header CSV, registers it
  // as table `data`, and runs a gated SELECT (`csv_tool.py:273-386`;
  // docstring contract queries :297-309 — GROUP BY aggregate, LIKE
  // filter, ORDER BY/LIMIT — composed into one report). The Spark
  // side goes through the REAL entry point ([[graft.plans.SqlGate
  // .csvSql]]: parsed-plan gate → header/inferSchema load → temp view
  // → spark.sql) over a committed fixture; DuckDB reads the same file
  // with read_csv_auto — exactly how the reference executes it.
  // Money sums in DECIMAL then cast to DOUBLE (float summation order
  // differs between engines); COUNT/SUM(int) cast to BIGINT (DuckDB
  // widens to HUGEINT, which no parquet type carries). The fixture is
  // SF-independent — the operator under test is the CSV SQL surface,
  // not the corpus.
  // resolved, in order: an explicit -Dgraft.q28.fixture / env
  // GRAFT_Q28_FIXTURE override; a walk UP from the working directory
  // to the filesystem root looking for the repo-root marker
  // (build.sbt) with the fixture present beside it — so any checkout
  // location works from any cwd inside it, and a same-named file in
  // an unrelated project can never be picked up (the marker gates the
  // match); the classpath resource (test/Verify runs), copied to a
  // temp file so both engines read a filesystem path; finally the
  // canonical driver checkout. The oracle SQL interpolates the SAME
  // resolved path (single quotes doubled per SQL string rules), so
  // both engines always read one file.
  // lazy-once (VERDICT r10 ask #8): the classpath branch copies the
  // resource to a temp file, so resolution must not run at object
  // init — it runs on the first q28 use (Q.oracle is itself lazy)
  // and caches for the JVM. The resolver is a function so the spec
  // can drive each branch of the order: override > repo-walk >
  // classpath > canonical.
  private[queries] lazy val Q28Csv: String =
    resolveQ28(sys.props.get("graft.q28.fixture")
      .orElse(sys.env.get("GRAFT_Q28_FIXTURE")))

  private[queries] def resolveQ28(explicitOverride: Option[String])
      : String = {
    val relPath = "src/test/resources/fixtures/q28_sales.csv"
    def override_ : Option[String] =
      explicitOverride.filter(p => new java.io.File(p).exists)
    def repoWalk: Option[String] = Iterator
      .iterate(new java.io.File(".").getAbsoluteFile.getParentFile)(
        _.getParentFile)
      .takeWhile(_ != null)
      .collectFirst {
        case d if new java.io.File(d, "build.sbt").exists &&
            new java.io.File(d, relPath).exists =>
          new java.io.File(d, relPath).getAbsolutePath
      }
    def classpath: Option[String] =
      Option(getClass.getResource("/fixtures/q28_sales.csv")).map { u =>
        val tmp = java.io.File.createTempFile("q28_sales", ".csv")
        tmp.deleteOnExit()
        val in = u.openStream()
        try java.nio.file.Files.copy(in, tmp.toPath,
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
        finally in.close()
        tmp.getAbsolutePath
      }
    override_.orElse(repoWalk).orElse(classpath)
      .getOrElse("/root/repo/" + relPath)
  }
  private def sqlQuote(p: String): String = p.replace("'", "''")
  private val q28Select =
    """SELECT category,
      |  CAST(COUNT(*) AS BIGINT) AS n_rows,
      |  CAST(SUM(qty) AS BIGINT) AS total_qty,
      |  CAST(SUM(CAST(amount AS DECIMAL(18,2))) AS DOUBLE) AS revenue
      |FROM data
      |WHERE region LIKE 'N%'
      |GROUP BY category
      |ORDER BY revenue DESC, category
      |LIMIT 3""".stripMargin
  val q28 = Q(
    "q28_csv_sql",
    s"""WITH data AS (SELECT * FROM read_csv_auto('${sqlQuote(Q28Csv)}',
      |  header=true))
      |$q28Select""".stripMargin) { (s, _) =>
    graft.plans.SqlGate.csvSql(s, Q28Csv, q28Select)
  }

  val all: Seq[Q] = Seq(q01, q02, q03, q04, q05, q06, q07, q08, q09, q10,
    q11, q12, q13, q14, q15, q16, q17, q18, q19, q20, q21, q22, q23, q24,
    q25, q26, q27, q28)
}
