package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType

import graft.Tables
import graft.ops.TextClean

/** Core relational query inventory (SURVEY.md §2 + §7.2 step 5).
  *
  * Every query has a matching DuckDB oracle in [[sql]]. Determinism rules:
  *  - every result carries a total ORDER BY (unique key suffix);
  *  - double aggregations go through exact DECIMAL(18,2) arithmetic
  *    (order-independent) and are cast back to double at the end, so the
  *    Spark and DuckDB results are bit-identical regardless of evaluation
  *    order;
  *  - `count(lit(1))` (not `count(col)`) mirrors the reference's `count('*')`
  *    null semantics (`/root/reference/dags/gold_data_aggregation.py:50`).
  */
object CoreQueries {

  private def dec(c: Column): Column = c.cast(DecimalType(18, 2))

  /** query name -> (spark fn, duckdb oracle sql) */
  val all: Seq[(String, (SparkSession, String) => DataFrame, Option[String])] = Seq(

    // ---- scan + filter + project + group agg (TPC-H Q1 shape) -------------
    ("q01_pricing_summary",
      (s: SparkSession, d: String) => {
        val li = Tables.load(s, d, "lineitem")
        li.filter(col("l_shipdate") < lit("2000-01-01").cast("timestamp"))
          .groupBy(col("l_returnflag"), col("l_linestatus"))
          .agg(
            sum(col("l_quantity")).as("sum_qty"),
            sum(dec(col("l_extendedprice"))).cast("double").as("sum_base_price"),
            sum(dec(col("l_extendedprice")) * (lit(1).cast(DecimalType(18, 2)) - dec(col("l_discount"))))
              .cast("double").as("sum_disc_price"),
            count(lit(1)).as("count_order"))
          .orderBy(col("l_returnflag"), col("l_linestatus"))
      },
      Some("""SELECT l_returnflag, l_linestatus,
             |  SUM(l_quantity) AS sum_qty,
             |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
             |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
             |  COUNT(*) AS count_order
             |FROM lineitem
             |WHERE l_shipdate < TIMESTAMP '2000-01-01'
             |GROUP BY l_returnflag, l_linestatus
             |ORDER BY l_returnflag, l_linestatus""".stripMargin)),

    // ---- selective filter w/ parquet predicate pushdown -------------------
    ("q02_filter_project",
      (s: SparkSession, d: String) => {
        Tables.load(s, d, "lineitem")
          .filter(col("l_quantity") >= 48 && col("l_returnflag") === "R")
          .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"), col("l_extendedprice"))
          .orderBy(col("l_orderkey"), col("l_linenumber"))
      },
      Some("""SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
             |FROM lineitem
             |WHERE l_quantity >= 48 AND l_returnflag = 'R'
             |ORDER BY l_orderkey, l_linenumber""".stripMargin)),

    // ---- broadcast join (small dims) --------------------------------------
    ("q03_join_broadcast",
      (s: SparkSession, d: String) => {
        val nation = Tables.load(s, d, "nation")
        val region = Tables.load(s, d, "region")
        nation.join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
          .select(col("n_nationkey"), col("n_name"), col("r_name").as("region_name"))
          .orderBy(col("n_nationkey"))
      },
      Some("""SELECT n_nationkey, n_name, r_name AS region_name
             |FROM nation JOIN region ON n_regionkey = r_regionkey
             |ORDER BY n_nationkey""".stripMargin)),

    // ---- large fact-fact join + agg (shuffle join path) -------------------
    ("q04_join_agg",
      (s: SparkSession, d: String) => {
        val li = Tables.load(s, d, "lineitem")
        val o = Tables.load(s, d, "orders")
        li.join(o, col("l_orderkey") === col("o_orderkey"))
          .groupBy(col("o_orderstatus"))
          .agg(sum(col("l_quantity")).as("sum_qty"), count(lit(1)).as("n_items"))
          .orderBy(col("o_orderstatus"))
      },
      Some("""SELECT o_orderstatus, SUM(l_quantity) AS sum_qty, COUNT(*) AS n_items
             |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
             |GROUP BY o_orderstatus
             |ORDER BY o_orderstatus""".stripMargin)),

    // ---- semi join (EXISTS) ----------------------------------------------
    ("q05_semi_join",
      (s: SparkSession, d: String) => {
        val c = Tables.load(s, d, "customer")
        val o = Tables.load(s, d, "orders")
        c.join(o, col("c_custkey") === col("o_custkey"), "left_semi")
          .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
          .orderBy(col("c_custkey"))
      },
      Some("""SELECT c_custkey, c_name, c_mktsegment
             |FROM customer
             |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
             |ORDER BY c_custkey""".stripMargin)),

    // ---- anti join (NOT EXISTS) ------------------------------------------
    ("q06_anti_join",
      (s: SparkSession, d: String) => {
        val c = Tables.load(s, d, "customer")
        val bigOrders = Tables.load(s, d, "orders").filter(col("o_totalprice") > 400000)
        c.join(bigOrders, col("c_custkey") === col("o_custkey"), "left_anti")
          .select(col("c_custkey"), col("c_name"))
          .orderBy(col("c_custkey"))
      },
      Some("""SELECT c_custkey, c_name
             |FROM customer
             |WHERE NOT EXISTS (SELECT 1 FROM orders
             |                  WHERE o_custkey = c_custkey AND o_totalprice > 400000)
             |ORDER BY c_custkey""".stripMargin)),

    // ---- window: row_number top-N per group -------------------------------
    ("q07_window_topn",
      (s: SparkSession, d: String) => {
        val o = Tables.load(s, d, "orders")
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_orderdate").desc, col("o_orderkey").desc)
        o.withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 3)
          .select(col("o_custkey"), col("o_orderkey"), col("rn"))
          .orderBy(col("o_custkey"), col("rn"))
      },
      Some("""SELECT o_custkey, o_orderkey, rn FROM (
             |  SELECT o_custkey, o_orderkey,
             |    ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
             |  FROM orders)
             |WHERE rn <= 3
             |ORDER BY o_custkey, rn""".stripMargin)),

    // ---- window: running (cumulative) aggregate ---------------------------
    ("q08_window_running",
      (s: SparkSession, d: String) => {
        val o = Tables.load(s, d, "orders")
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_orderdate"), col("o_orderkey"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        o.select(
          col("o_custkey"), col("o_orderkey"),
          sum(dec(col("o_totalprice"))).over(w).cast("double").as("running_spend"))
          .orderBy(col("o_custkey"), col("o_orderkey"))
      },
      Some("""SELECT o_custkey, o_orderkey,
             |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
             |    PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_spend
             |FROM orders
             |ORDER BY o_custkey, o_orderkey""".stripMargin)),

    // ---- global top-k (TakeOrderedAndProject, no full sort at scale) ------
    ("q09_topk",
      (s: SparkSession, d: String) => {
        Tables.load(s, d, "orders")
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
          .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
          .limit(10)
      },
      Some("""SELECT o_orderkey, o_custkey, o_totalprice
             |FROM orders
             |ORDER BY o_totalprice DESC, o_orderkey
             |LIMIT 10""".stripMargin)),

    // ---- set ops ----------------------------------------------------------
    ("q10_set_intersect",
      (s: SparkSession, d: String) => {
        val c = Tables.load(s, d, "customer").select(col("c_nationkey").as("nationkey"))
        val sup = Tables.load(s, d, "supplier").select(col("s_nationkey").as("nationkey"))
        c.intersect(sup).orderBy(col("nationkey"))
      },
      Some("""SELECT c_nationkey AS nationkey FROM customer
             |INTERSECT
             |SELECT s_nationkey FROM supplier
             |ORDER BY nationkey""".stripMargin)),

    ("q11_set_except",
      (s: SparkSession, d: String) => {
        val c = Tables.load(s, d, "customer").select(col("c_nationkey").as("nationkey"))
        val sup = Tables.load(s, d, "supplier").filter(col("s_acctbal") > 5000)
          .select(col("s_nationkey").as("nationkey"))
        c.except(sup).orderBy(col("nationkey"))
      },
      Some("""SELECT c_nationkey AS nationkey FROM customer
             |EXCEPT
             |SELECT s_nationkey FROM supplier WHERE s_acctbal > 5000
             |ORDER BY nationkey""".stripMargin)),

    ("q12_union_all",
      (s: SparkSession, d: String) => {
        val c = Tables.load(s, d, "customer")
          .agg(count(lit(1)).as("n")).select(lit("customer").as("side"), col("n"))
        val sup = Tables.load(s, d, "supplier")
          .agg(count(lit(1)).as("n")).select(lit("supplier").as("side"), col("n"))
        c.unionAll(sup).orderBy(col("side"))
      },
      Some("""SELECT 'customer' AS side, COUNT(*) AS n FROM customer
             |UNION ALL
             |SELECT 'supplier' AS side, COUNT(*) AS n FROM supplier
             |ORDER BY side""".stripMargin)),

    // ---- distinct (dropDuplicates) ----------------------------------------
    ("q13_distinct",
      (s: SparkSession, d: String) => {
        Tables.load(s, d, "lineitem")
          .select(col("l_returnflag"), col("l_linestatus"))
          .dropDuplicates()
          .orderBy(col("l_returnflag"), col("l_linestatus"))
      },
      Some("""SELECT DISTINCT l_returnflag, l_linestatus
             |FROM lineitem
             |ORDER BY l_returnflag, l_linestatus""".stripMargin)),

    // ---- date/time extraction + agg ---------------------------------------
    ("q14_date_agg",
      (s: SparkSession, d: String) => {
        Tables.load(s, d, "lineitem")
          .groupBy(
            year(col("l_shipdate")).cast("int").as("y"),
            month(col("l_shipdate")).cast("int").as("m"))
          .agg(
            count(lit(1)).as("n"),
            sum(dec(col("l_extendedprice"))).cast("double").as("revenue"))
          .orderBy(col("y"), col("m"))
      },
      Some("""SELECT CAST(year(l_shipdate) AS INT) AS y, CAST(month(l_shipdate) AS INT) AS m,
             |  COUNT(*) AS n,
             |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
             |FROM lineitem
             |GROUP BY y, m
             |ORDER BY y, m""".stripMargin)),

    // ---- date arithmetic ---------------------------------------------------
    ("q15_date_arith",
      (s: SparkSession, d: String) => {
        Tables.load(s, d, "orders")
          .select(
            col("o_orderkey"),
            date_add(to_date(col("o_orderdate")), 30).as("due_date"))
          .orderBy(col("o_orderkey"))
      },
      Some("""SELECT o_orderkey, CAST(o_orderdate AS DATE) + 30 AS due_date
             |FROM orders
             |ORDER BY o_orderkey""".stripMargin)),

    // ---- scalar string funcs + CASE ---------------------------------------
    ("q16_scalar_funcs",
      (s: SparkSession, d: String) => {
        Tables.load(s, d, "orders")
          .select(
            col("o_orderkey"),
            upper(col("o_orderpriority")).as("pri_upper"),
            substring(col("o_orderpriority"), 1, 1).as("pri_code"),
            when(col("o_totalprice") > 300000, "big")
              .when(col("o_totalprice") > 100000, "mid")
              .otherwise("small").as("bucket"))
          .orderBy(col("o_orderkey"))
      },
      Some("""SELECT o_orderkey, upper(o_orderpriority) AS pri_upper,
             |  substr(o_orderpriority, 1, 1) AS pri_code,
             |  CASE WHEN o_totalprice > 300000 THEN 'big'
             |       WHEN o_totalprice > 100000 THEN 'mid'
             |       ELSE 'small' END AS bucket
             |FROM orders
             |ORDER BY o_orderkey""".stripMargin)),

    // ---- min/max/explicit-avg agg ------------------------------------------
    ("q17_agg_stats",
      (s: SparkSession, d: String) => {
        Tables.load(s, d, "lineitem")
          .groupBy(col("l_returnflag"))
          .agg(
            (sum(col("l_quantity")).cast("double") / count(lit(1))).as("avg_qty"),
            min(col("l_extendedprice")).as("min_price"),
            max(col("l_extendedprice")).as("max_price"))
          .orderBy(col("l_returnflag"))
      },
      Some("""SELECT l_returnflag,
             |  CAST(SUM(l_quantity) AS DOUBLE) / COUNT(*) AS avg_qty,
             |  MIN(l_extendedprice) AS min_price,
             |  MAX(l_extendedprice) AS max_price
             |FROM lineitem
             |GROUP BY l_returnflag
             |ORDER BY l_returnflag""".stripMargin)),

    // ---- reference gold query shape: cleanse + group-count ----------------
    // Mirrors silver slug-normalize (`data_transformations_bronze_to_silver.py:94-96`)
    // + gold group-count (`gold_data_aggregation.py:49-50`) over `events`.
    // The Spark side runs the FULL cleanse chain (incl. \p{Pc} strip +
    // diacritic fold); the oracle mirrors the fixture-relevant reduced map
    // (SURVEY.md §7.4.6) — event_type values are ASCII single words, on which
    // the extra steps are identity (pinned by ScalaTest goldens instead).
    ("q18_cleanse_group_count",
      (s: SparkSession, d: String) => {
        Tables.load(s, d, "events")
          .groupBy(TextClean.cleanLocation(col("event_type")).as("event_type_clean"))
          .agg(count(lit(1)).as("event_count"))
          .orderBy(col("event_type_clean"))
      },
      Some("""SELECT replace(lower(trim(event_type)), ' ', '-') AS event_type_clean,
             |  COUNT(*) AS event_count
             |FROM events
             |GROUP BY 1
             |ORDER BY 1""".stripMargin)),
  )
}
