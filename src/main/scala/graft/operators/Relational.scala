package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Relational / analytics core (SURVEY §2A) — TPC-H-style queries adapted to
  * the graft star schema.
  *
  * Determinism rules (SURVEY §5): money math runs on DECIMAL (exact, so
  * parallel partial aggregation is order-independent and bit-identical to the
  * DuckDB oracle), final outputs are rounded doubles, every query ends with a
  * total ORDER BY.
  *
  * Scale notes: dimension joins (region/nation/customer/supplier/part) are
  * explicit `broadcast()`; only lineitem↔orders shuffles, on the join key.
  */
object Relational {

  /** Exact money column: double parquet column → DECIMAL(12,2). */
  private def dec(c: Column): Column = c.cast("decimal(12,2)")
  /** Small exact factor, e.g. discounts/taxes in [0,1): DECIMAL(3,2). */
  private def dec3(c: Column): Column = c.cast("decimal(3,2)")
  private val one = lit(1).cast("decimal(3,2)")

  /** l_extendedprice * (1 - l_discount), exact. */
  private def discPrice(df: DataFrame): Column =
    dec(df("l_extendedprice")) * (one - dec3(df("l_discount")))

  /** Pricing summary report — grouped agg with exact sums (TPC-H Q1 analog). */
  def q1PricingSummary(spark: SparkSession, dir: String): DataFrame = {
    val l = Tables.lineitem(spark, dir)
    l.filter(col("l_shipdate") <= lit("2000-09-02").cast("date"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        round(sum(dec(col("l_quantity"))).cast("double"), 2).as("sum_qty"),
        round(sum(dec(col("l_extendedprice"))).cast("double"), 2).as("sum_base_price"),
        round(sum(discPrice(l)).cast("double"), 2).as("sum_disc_price"),
        round(sum(discPrice(l) * (one + dec3(col("l_tax")))).cast("double"), 2).as("sum_charge"),
        round(sum(dec(col("l_quantity"))).cast("double") / count(lit(1)), 4).as("avg_qty"),
        round(sum(dec(col("l_extendedprice"))).cast("double") / count(lit(1)), 4).as("avg_price"),
        round(sum(dec3(col("l_discount"))).cast("double") / count(lit(1)), 6).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .contractOrderBy("l_returnflag", "l_linestatus")
  }

  val q1Sql: String =
    """SELECT l_returnflag, l_linestatus,
      |  round(CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE), 2) AS sum_qty,
      |  round(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE), 2) AS sum_base_price,
      |  round(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2)))) AS DOUBLE), 2) AS sum_disc_price,
      |  round(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2))) * (CAST(1 AS DECIMAL(3,2)) + CAST(l_tax AS DECIMAL(3,2)))) AS DOUBLE), 2) AS sum_charge,
      |  round(CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / count(*), 4) AS avg_qty,
      |  round(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / count(*), 4) AS avg_price,
      |  round(CAST(sum(CAST(l_discount AS DECIMAL(3,2))) AS DOUBLE) / count(*), 6) AS avg_disc,
      |  count(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= DATE '2000-09-02'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  /** Shipping-priority: top unshipped orders by revenue (TPC-H Q3 analog). */
  def q3ShippingPriority(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir).filter(col("c_mktsegment") === "BUILDING")
    val o = Tables.orders(spark, dir).filter(col("o_orderdate") < lit("1998-01-01").cast("date"))
    val l = Tables.lineitem(spark, dir).filter(col("l_shipdate") > lit("1998-01-01").cast("date"))
    l.join(o, l("l_orderkey") === o("o_orderkey"))
      .join(broadcast(c), o("o_custkey") === c("c_custkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(round(sum(discPrice(l)).cast("double"), 2).as("revenue"))
      .select(col("l_orderkey"), col("revenue"),
        col("o_orderdate").cast("date").cast("string").as("o_orderdate"), col("o_orderpriority"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  val q3Sql: String =
    """SELECT l_orderkey,
      |  round(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2)))) AS DOUBLE), 2) AS revenue,
      |  CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS o_orderdate, o_orderpriority
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |WHERE c_mktsegment = 'BUILDING' AND o_orderdate < DATE '1998-01-01' AND l_shipdate > DATE '1998-01-01'
      |GROUP BY l_orderkey, o_orderdate, o_orderpriority
      |ORDER BY revenue DESC, l_orderkey
      |LIMIT 10""".stripMargin

  /** Local-supplier volume per nation in a region (TPC-H Q5 analog). */
  def q5LocalSupplier(spark: SparkSession, dir: String): DataFrame = {
    val r = Tables.region(spark, dir).filter(col("r_name") === "ASIA")
    val n = Tables.nation(spark, dir)
    val c = Tables.customer(spark, dir)
    val s = Tables.supplier(spark, dir)
    val o = Tables.orders(spark, dir)
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("date") &&
              col("o_orderdate") < lit("1998-01-01").cast("date"))
    val l = Tables.lineitem(spark, dir)
    l.join(o, l("l_orderkey") === o("o_orderkey"))
      .join(broadcast(s), l("l_suppkey") === s("s_suppkey"))
      .join(broadcast(c), o("o_custkey") === c("c_custkey") &&
                          c("c_nationkey") === s("s_nationkey"))
      .join(broadcast(n), s("s_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .groupBy(col("n_name"))
      .agg(round(sum(discPrice(l)).cast("double"), 2).as("revenue"))
      .contractOrderBy(col("revenue").desc, col("n_name"))
  }

  val q5Sql: String =
    """SELECT n_name,
      |  round(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2)))) AS DOUBLE), 2) AS revenue
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |JOIN supplier ON l_suppkey = s_suppkey
      |JOIN customer ON o_custkey = c_custkey AND c_nationkey = s_nationkey
      |JOIN nation ON s_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |WHERE r_name = 'ASIA' AND o_orderdate >= DATE '1996-01-01' AND o_orderdate < DATE '1998-01-01'
      |GROUP BY n_name
      |ORDER BY revenue DESC, n_name""".stripMargin

  /** Returned-item revenue per customer (TPC-H Q10 analog). */
  def q10ReturnedItems(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
    val n = Tables.nation(spark, dir)
    val o = Tables.orders(spark, dir)
    val l = Tables.lineitem(spark, dir).filter(col("l_returnflag") === "R")
    l.join(o, l("l_orderkey") === o("o_orderkey"))
      .join(broadcast(c), o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .groupBy(col("c_custkey"), col("c_name"), col("n_name"))
      .agg(round(sum(discPrice(l)).cast("double"), 2).as("revenue"))
      .orderBy(col("revenue").desc, col("c_custkey"))
      .limit(20)
  }

  val q10Sql: String =
    """SELECT c_custkey, c_name, n_name,
      |  round(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2)))) AS DOUBLE), 2) AS revenue
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |WHERE l_returnflag = 'R'
      |GROUP BY c_custkey, c_name, n_name
      |ORDER BY revenue DESC, c_custkey
      |LIMIT 20""".stripMargin

  /** PROMO-type revenue share per nation (TPC-H Q8/Q14-style ratio agg). */
  def qMarketShare(spark: SparkSession, dir: String): DataFrame = {
    val p = Tables.part(spark, dir)
    val s = Tables.supplier(spark, dir)
    val n = Tables.nation(spark, dir)
    val l = Tables.lineitem(spark, dir)
    val dp = discPrice(l)
    val zero = lit(0).cast("decimal(25,4)")
    l.join(broadcast(p), l("l_partkey") === p("p_partkey"))
      .join(broadcast(s), l("l_suppkey") === s("s_suppkey"))
      .join(broadcast(n), s("s_nationkey") === n("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(
        round(sum(when(col("p_type") === "PROMO", dp).otherwise(zero)).cast("double"), 2).as("promo_revenue"),
        round(sum(dp).cast("double"), 2).as("total_revenue"),
        round(sum(when(col("p_type") === "PROMO", dp).otherwise(zero)).cast("double") /
              sum(dp).cast("double"), 4).as("promo_share"))
      .contractOrderBy(col("n_name"))
  }

  val qMarketShareSql: String =
    """SELECT n_name,
      |  round(CAST(sum(CASE WHEN p_type = 'PROMO' THEN CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2))) ELSE CAST(0 AS DECIMAL(25,4)) END) AS DOUBLE), 2) AS promo_revenue,
      |  round(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2)))) AS DOUBLE), 2) AS total_revenue,
      |  round(CAST(sum(CASE WHEN p_type = 'PROMO' THEN CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2))) ELSE CAST(0 AS DECIMAL(25,4)) END) AS DOUBLE)
      |    / CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2)))) AS DOUBLE), 4) AS promo_share
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |JOIN supplier ON l_suppkey = s_suppkey
      |JOIN nation ON s_nationkey = n_nationkey
      |GROUP BY n_name
      |ORDER BY n_name""".stripMargin

  /** Window top-N: 2 highest-value orders per customer. */
  def qWindowTopN(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val o = Tables.orders(spark, dir)
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    o.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 2)
      .select(col("o_custkey"), col("rn"), col("o_orderkey"), col("o_totalprice"))
      .contractOrderBy(col("o_custkey"), col("rn"))
  }

  val qWindowTopNSql: String =
    """SELECT o_custkey, rn, o_orderkey, o_totalprice FROM (
      |  SELECT o_custkey, o_orderkey, o_totalprice,
      |    row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn
      |  FROM orders) t
      |WHERE rn <= 2
      |ORDER BY o_custkey, rn""".stripMargin

  /** ROLLUP aggregation over nation × market segment. */
  def qRollupAgg(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
    val n = Tables.nation(spark, dir)
    c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .rollup(col("n_name"), col("c_mktsegment"))
      .agg(count(lit(1)).as("n_customers"),
        round(sum(dec(col("c_acctbal"))).cast("double"), 2).as("sum_acctbal"))
      .select(coalesce(col("n_name"), lit("ALL")).as("nation"),
        coalesce(col("c_mktsegment"), lit("ALL")).as("segment"),
        col("n_customers"), col("sum_acctbal"))
      .contractOrderBy(col("nation"), col("segment"))
  }

  val qRollupAggSql: String =
    """SELECT coalesce(n_name, 'ALL') AS nation, coalesce(c_mktsegment, 'ALL') AS segment,
      |  count(*) AS n_customers,
      |  round(CAST(sum(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE), 2) AS sum_acctbal
      |FROM customer JOIN nation ON c_nationkey = n_nationkey
      |GROUP BY ROLLUP(n_name, c_mktsegment)
      |ORDER BY nation, segment""".stripMargin

  /** Left-semi + left-anti: customers with ≥1 order but no 'F' order. */
  def qSemiAnti(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
    val o = Tables.orders(spark, dir)
    c.join(o.select("o_custkey"), c("c_custkey") === o("o_custkey"), "left_semi")
      .join(o.filter(col("o_orderstatus") === "F").select(col("o_custkey").as("fk")),
        col("c_custkey") === col("fk"), "left_anti")
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
      .contractOrderBy(col("c_custkey"))
  }

  val qSemiAntiSql: String =
    """SELECT c_custkey, c_name, c_mktsegment
      |FROM customer
      |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
      |  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
      |ORDER BY c_custkey""".stripMargin

  /** Order-priority check: orders with ≥1 late-shipped line, counted per
    * priority (TPC-H Q4 analog — EXISTS via left-semi).
    */
  def q4OrderPriority(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("date") &&
              col("o_orderdate") < lit("1997-01-01").cast("date"))
    val l = Tables.lineitem(spark, dir)
      .filter(col("l_returnflag") === "R")
      .select("l_orderkey")
    o.join(l, o("o_orderkey") === l("l_orderkey"), "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("order_count"))
      .contractOrderBy("o_orderpriority")
  }

  val q4Sql: String =
    """SELECT o_orderpriority, count(*) AS order_count
      |FROM orders
      |WHERE o_orderdate >= DATE '1996-01-01' AND o_orderdate < DATE '1997-01-01'
      |  AND EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin

  /** Large-volume orders: total quantity above threshold, with customer
    * (TPC-H Q18 analog — HAVING + join).
    */
  def q18LargeOrders(spark: SparkSession, dir: String): DataFrame = {
    val l = Tables.lineitem(spark, dir)
    val big = l.groupBy(col("l_orderkey"))
      .agg(round(sum(dec(col("l_quantity"))).cast("double"), 2).as("total_qty"))
      .filter(col("total_qty") > 120)
    val o = Tables.orders(spark, dir)
    val c = Tables.customer(spark, dir)
    big.join(o, big("l_orderkey") === o("o_orderkey"))
      .join(broadcast(c), o("o_custkey") === c("c_custkey"))
      .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
        col("o_orderdate").cast("date").cast("string").as("o_orderdate"),
        col("o_totalprice"), col("total_qty"))
      .orderBy(col("total_qty").desc, col("o_orderkey"))
      .limit(50)
  }

  val q18Sql: String =
    """SELECT c_custkey, c_name, o_orderkey,
      |  CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS o_orderdate, o_totalprice, total_qty
      |FROM (
      |  SELECT l_orderkey, round(CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE), 2) AS total_qty
      |  FROM lineitem GROUP BY l_orderkey
      |  HAVING round(CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE), 2) > 120
      |) big
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |ORDER BY total_qty DESC, o_orderkey
      |LIMIT 50""".stripMargin

  /** Scalar-subquery style: parts priced >5% above their brand average. */
  def qScalarSubquery(spark: SparkSession, dir: String): DataFrame = {
    val p = Tables.part(spark, dir)
    val brandAvg = p.groupBy(col("p_brand").as("b_brand"))
      .agg((sum(dec(col("p_retailprice"))).cast("double") / count(lit(1))).as("brand_avg"))
    p.join(broadcast(brandAvg), col("p_brand") === col("b_brand"))
      .filter(col("p_retailprice") > col("brand_avg") * 1.05)
      .select(col("p_partkey"), col("p_name"), col("p_brand"), col("p_retailprice"),
        round(col("brand_avg"), 4).as("brand_avg"))
      .contractOrderBy(col("p_partkey"))
  }

  val qScalarSubquerySql: String =
    """SELECT p_partkey, p_name, p_brand, p_retailprice, round(brand_avg, 4) AS brand_avg
      |FROM part JOIN (
      |  SELECT p_brand AS b_brand,
      |    CAST(sum(CAST(p_retailprice AS DECIMAL(12,2))) AS DOUBLE) / count(*) AS brand_avg
      |  FROM part GROUP BY p_brand) b ON p_brand = b_brand
      |WHERE p_retailprice > brand_avg * 1.05
      |ORDER BY p_partkey""".stripMargin

  /** Cross-nation trade volume per (supplier nation, customer nation, year)
    * (TPC-H Q7 analog). The nation dim joins TWICE under different roles —
    * both broadcast; only lineitem↔orders shuffles.
    */
  def q7NationVolume(spark: SparkSession, dir: String): DataFrame = {
    val n1 = Tables.nation(spark, dir).select(
      col("n_nationkey").as("sn_key"), col("n_name").as("supp_nation"))
    val n2 = Tables.nation(spark, dir).select(
      col("n_nationkey").as("cn_key"), col("n_name").as("cust_nation"))
    val s = Tables.supplier(spark, dir)
    val c = Tables.customer(spark, dir)
    val o = Tables.orders(spark, dir)
    val l = Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("date") &&
              col("l_shipdate") < lit("1998-01-01").cast("date"))
    l.join(o, l("l_orderkey") === o("o_orderkey"))
      .join(broadcast(s), l("l_suppkey") === s("s_suppkey"))
      .join(broadcast(c), o("o_custkey") === c("c_custkey"))
      .join(broadcast(n1), s("s_nationkey") === col("sn_key"))
      .join(broadcast(n2), c("c_nationkey") === col("cn_key"))
      .filter(col("supp_nation") =!= col("cust_nation"))
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate")).as("l_year"))
      // round in DECIMAL space, then cast: round(CAST(sum AS DOUBLE), 2)
      // flips on exact .xx5 boundaries (Spark rounds the decimal string
      // repr, DuckDB the binary double), and DuckDB's decimal-downscale
      // CAST truncates — round(decimal, 2) is HALF_UP in both engines
      .agg(round(sum(discPrice(l)), 2).cast("double").as("volume"))
      .contractOrderBy("supp_nation", "cust_nation", "l_year")
  }

  val q7Sql: String =
    """SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
      |  CAST(year(l_shipdate) AS INTEGER) AS l_year,
      |  CAST(round(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2)))), 2) AS DOUBLE) AS volume
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |JOIN supplier ON l_suppkey = s_suppkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation n1 ON s_nationkey = n1.n_nationkey
      |JOIN nation n2 ON c_nationkey = n2.n_nationkey
      |WHERE l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1998-01-01'
      |  AND n1.n_name <> n2.n_name
      |GROUP BY supp_nation, cust_nation, l_year
      |ORDER BY supp_nation, cust_nation, l_year""".stripMargin

  /** Priority-class line counts per line status (TPC-H Q12 analog — the
    * schema has no shipmode, so linestatus plays its role): high = URGENT /
    * HIGH orders, low = the rest, one conditional aggregation.
    */
  def q12PriorityClass(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    val l = Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("1997-01-01").cast("date") &&
              col("l_shipdate") < lit("1998-01-01").cast("date"))
    val isHigh = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    l.join(o, l("l_orderkey") === o("o_orderkey"))
      .groupBy(col("l_linestatus"))
      .agg(
        sum(when(isHigh, 1).otherwise(0)).cast("long").as("high_line_count"),
        sum(when(isHigh, 0).otherwise(1)).cast("long").as("low_line_count"))
      .contractOrderBy("l_linestatus")
  }

  val q12Sql: String =
    """SELECT l_linestatus,
      |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
      |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |WHERE l_shipdate >= DATE '1997-01-01' AND l_shipdate < DATE '1998-01-01'
      |GROUP BY l_linestatus
      |ORDER BY l_linestatus""".stripMargin

  /** Customer order-count distribution (TPC-H Q13 analog): LEFT OUTER join
    * so zero-order customers survive, per-customer count of non-final
    * orders, then a histogram over the counts (two aggregations, each
    * map-side combined).
    */
  def q13CustDist(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
    val o = Tables.orders(spark, dir).filter(col("o_orderstatus") =!= "F")
    c.join(o, c("c_custkey") === o("o_custkey"), "left_outer")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("c_count"))
      .groupBy(col("c_count"))
      .agg(count(lit(1)).as("custdist"))
      .contractOrderBy(col("custdist").desc, col("c_count").desc)
  }

  val q13Sql: String =
    """SELECT c_count, count(*) AS custdist
      |FROM (
      |  SELECT c_custkey, count(o_orderkey) AS c_count
      |  FROM customer LEFT OUTER JOIN orders
      |    ON c_custkey = o_custkey AND o_orderstatus <> 'F'
      |  GROUP BY c_custkey) t
      |GROUP BY c_count
      |ORDER BY custdist DESC, c_count DESC""".stripMargin

  /** Supplier variety per (brand, type) (TPC-H Q16 analog — supplier↔part
    * pairs come from lineitem since the schema has no partsupp): DISTINCT
    * aggregation = two-phase shuffle, partial distinct map-side.
    */
  def q16SupplierVariety(spark: SparkSession, dir: String): DataFrame = {
    val p = Tables.part(spark, dir)
      .filter(col("p_brand") =!= "Brand#1" && col("p_size") <= 25)
    val l = Tables.lineitem(spark, dir)
    l.join(broadcast(p), l("l_partkey") === p("p_partkey"))
      .groupBy(col("p_brand"), col("p_type"))
      .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
      .contractOrderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"))
  }

  val q16Sql: String =
    """SELECT p_brand, p_type, count(DISTINCT l_suppkey) AS supplier_cnt
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |WHERE p_brand <> 'Brand#1' AND p_size <= 25
      |GROUP BY p_brand, p_type
      |ORDER BY supplier_cnt DESC, p_brand, p_type""".stripMargin

  /** Disjunctive-predicate revenue (TPC-H Q19 analog): an OR of AND-blocks
    * over part attributes × lineitem quantity — the shape that exercises
    * predicate normalization/pushdown (the common `p_partkey = l_partkey`
    * join key still drives one broadcast join, each block prunes inside).
    */
  def q19Disjunctive(spark: SparkSession, dir: String): DataFrame = {
    val p = Tables.part(spark, dir)
    val l = Tables.lineitem(spark, dir)
    val blocks =
      (col("p_brand") === "Brand#3" && col("p_size").between(1, 15) &&
        col("l_quantity").between(1, 20)) ||
      (col("p_brand") === "Brand#5" && col("p_size").between(10, 30) &&
        col("l_quantity").between(10, 35)) ||
      (col("p_brand") === "Brand#7" && col("p_size").between(20, 50) &&
        col("l_quantity").between(20, 50))
    l.join(broadcast(p), l("l_partkey") === p("p_partkey"))
      .filter(blocks)
      .agg(
        // q7 form: round in DECIMAL space (HALF_UP both engines), then cast
        round(sum(discPrice(l)), 2).cast("double").as("revenue"),
        count(lit(1)).as("n_lines"))
  }

  val q19Sql: String =
    """SELECT
      |  CAST(round(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2)))), 2) AS DOUBLE) AS revenue,
      |  count(*) AS n_lines
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |WHERE (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 20)
      |   OR (p_brand = 'Brand#5' AND p_size BETWEEN 10 AND 30 AND l_quantity BETWEEN 10 AND 35)
      |   OR (p_brand = 'Brand#7' AND p_size BETWEEN 20 AND 50 AND l_quantity BETWEEN 20 AND 50)""".stripMargin

  /** Idle high-balance customers per nation (TPC-H Q22 analog): customers
    * above the average POSITIVE balance with no URGENT order — a scalar
    * aggregate (broadcast single row) + left-anti join, grouped per nation.
    */
  def q22IdleRich(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
    val n = Tables.nation(spark, dir)
    // exact scalar: decimal sum / count, one double division at the end
    val avgPos = c.filter(col("c_acctbal") > 0)
      .agg((sum(dec(col("c_acctbal"))).cast("double") / count(lit(1))).as("avg_bal"))
    val urgent = Tables.orders(spark, dir)
      .filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_custkey"))
    c.crossJoin(broadcast(avgPos))
      .filter(col("c_acctbal") > col("avg_bal"))
      .join(urgent, c("c_custkey") === urgent("o_custkey"), "left_anti")
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(
        count(lit(1)).as("numcust"),
        round(sum(dec(col("c_acctbal"))).cast("double"), 2).as("totacctbal"))
      .contractOrderBy("n_name")
  }

  val q22Sql: String =
    """SELECT n_name, count(*) AS numcust,
      |  round(CAST(sum(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE), 2) AS totacctbal
      |FROM customer JOIN nation ON c_nationkey = n_nationkey
      |WHERE c_acctbal > (
      |    SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) / count(*)
      |    FROM customer WHERE c_acctbal > 0)
      |  AND NOT EXISTS (
      |    SELECT 1 FROM orders
      |    WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
      |GROUP BY n_name
      |ORDER BY n_name""".stripMargin

  /** Forecast-revenue change (TPC-H Q6 analog): single-table filter +
    * aggregate — the pure scan-throughput headliner. All three predicates
    * push into the parquet scan; revenue = price × discount, exact decimal.
    */
  def q6ForecastRevenue(spark: SparkSession, dir: String): DataFrame = {
    val l = Tables.lineitem(spark, dir)
    l.filter(col("l_shipdate") >= lit("1997-01-01").cast("date") &&
        col("l_shipdate") < lit("1998-01-01").cast("date") &&
        col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
      .agg(
        round(sum(dec(col("l_extendedprice")) * dec3(col("l_discount"))), 2)
          .cast("double").as("revenue"),
        count(lit(1)).as("n_lines"))
  }

  val q6Sql: String =
    """SELECT
      |  CAST(round(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_discount AS DECIMAL(3,2))), 2) AS DOUBLE) AS revenue,
      |  count(*) AS n_lines
      |FROM lineitem
      |WHERE l_shipdate >= DATE '1997-01-01' AND l_shipdate < DATE '1998-01-01'
      |  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""".stripMargin

  /** Promotion revenue share (TPC-H Q14 analog): conditional aggregation
    * ratio over one month — both sums exact decimal, ONE double division at
    * the end (§5 rule: never a float composite of rounded terms).
    */
  def q14PromoShare(spark: SparkSession, dir: String): DataFrame = {
    val p = Tables.part(spark, dir)
    val l = Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("1997-09-01").cast("date") &&
              col("l_shipdate") < lit("1997-10-01").cast("date"))
    l.join(broadcast(p), l("l_partkey") === p("p_partkey"))
      .agg(
        sum(when(col("p_type") === "PROMO", discPrice(l)).otherwise(lit(0).cast("decimal(16,4)")))
          .as("promo_d"),
        sum(discPrice(l)).as("total_d"))
      .select(
        round(lit(100.0) * col("promo_d").cast("double") / col("total_d").cast("double"), 4)
          .as("promo_share"),
        round(col("promo_d"), 2).cast("double").as("promo_revenue"),
        round(col("total_d"), 2).cast("double").as("total_revenue"))
  }

  val q14Sql: String =
    """WITH a AS (
      |  SELECT
      |    sum(CASE WHEN p_type = 'PROMO'
      |        THEN CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2)))
      |        ELSE 0 END) AS promo_d,
      |    sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2)))) AS total_d
      |  FROM lineitem JOIN part ON l_partkey = p_partkey
      |  WHERE l_shipdate >= DATE '1997-09-01' AND l_shipdate < DATE '1997-10-01'
      |)
      |SELECT round(100.0 * CAST(promo_d AS DOUBLE) / CAST(total_d AS DOUBLE), 4) AS promo_share,
      |  CAST(round(promo_d, 2) AS DOUBLE) AS promo_revenue,
      |  CAST(round(total_d, 2) AS DOUBLE) AS total_revenue
      |FROM a""".stripMargin

  /** Top supplier (TPC-H Q15 analog): quarterly revenue per supplier, keep
    * the max — the scalar-subquery-over-aggregate shape. The max compare
    * runs on the EXACT decimal sums (ties survive; equality on decimals is
    * safe, on rounded doubles it would not be).
    */
  def q15TopSupplier(spark: SparkSession, dir: String): DataFrame = {
    val s = Tables.supplier(spark, dir)
    val l = Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("1997-01-01").cast("date") &&
              col("l_shipdate") < lit("1997-04-01").cast("date"))
    val rev = l.groupBy(col("l_suppkey")).agg(sum(discPrice(l)).as("rev_d"))
    val maxRev = rev.agg(max(col("rev_d")).as("max_rev"))
    rev.crossJoin(broadcast(maxRev))
      .filter(col("rev_d") === col("max_rev"))
      .join(broadcast(s), col("l_suppkey") === s("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"),
        round(col("rev_d"), 2).cast("double").as("total_revenue"))
      .contractOrderBy("s_suppkey")
  }

  val q15Sql: String =
    """WITH r AS (
      |  SELECT l_suppkey,
      |    sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2)))) AS rev_d
      |  FROM lineitem
      |  WHERE l_shipdate >= DATE '1997-01-01' AND l_shipdate < DATE '1997-04-01'
      |  GROUP BY l_suppkey
      |)
      |SELECT s_suppkey, s_name, CAST(round(rev_d, 2) AS DOUBLE) AS total_revenue
      |FROM r JOIN supplier ON l_suppkey = s_suppkey
      |WHERE rev_d = (SELECT max(rev_d) FROM r)
      |ORDER BY s_suppkey""".stripMargin

  /** Suppliers who kept multi-supplier orders waiting (TPC-H Q21 analog —
    * the schema has no commit/receipt dates, so "late" = sole supplier at
    * the order's latest ship date). The heavy shape survives: a fact
    * self-comparison resolved with ONE orderkey-grain aggregation + a
    * re-join (never an O(lines²) self-join), then EXISTS (n_supp > 1) and
    * NOT-EXISTS (n_late = 1) as integer predicates on the aggregate.
    */
  def q21WaitingSupplier(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
      .filter(col("o_orderstatus") === "F").select(col("o_orderkey"))
    val l = Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_suppkey"), col("l_shipdate"))
    val lf = l.join(o, l("l_orderkey") === o("o_orderkey"))
      .select("l_orderkey", "l_suppkey", "l_shipdate")
    val facts = lf.groupBy(col("l_orderkey"))
      .agg(max(col("l_shipdate")).as("max_ship"),
        countDistinct(col("l_suppkey")).as("n_supp"))
    val atMax = lf.join(facts, "l_orderkey")
      .filter(col("l_shipdate") === col("max_ship"))
      .groupBy(col("l_orderkey"), col("n_supp"))
      .agg(countDistinct(col("l_suppkey")).as("n_late"),
        min(col("l_suppkey")).as("late_supp"))
    val s = Tables.supplier(spark, dir)
    val n = Tables.nation(spark, dir)
    atMax.filter(col("n_supp") > 1 && col("n_late") === 1)
      .groupBy(col("late_supp"))
      .agg(count(lit(1)).as("numwait"))
      .join(broadcast(s), col("late_supp") === s("s_suppkey"))
      .join(broadcast(n), s("s_nationkey") === n("n_nationkey"))
      .select(col("s_name"), col("n_name"), col("numwait"))
      .orderBy(col("numwait").desc, col("s_name"))
      .limit(20)
  }

  val q21Sql: String =
    """WITH lf AS (
      |  SELECT l_orderkey, l_suppkey, l_shipdate
      |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |  WHERE o_orderstatus = 'F'
      |), f AS (
      |  SELECT l_orderkey, max(l_shipdate) AS max_ship,
      |    count(DISTINCT l_suppkey) AS n_supp
      |  FROM lf GROUP BY l_orderkey
      |), am AS (
      |  SELECT lf.l_orderkey, f.n_supp, count(DISTINCT l_suppkey) AS n_late,
      |    min(l_suppkey) AS late_supp
      |  FROM lf JOIN f ON lf.l_orderkey = f.l_orderkey AND lf.l_shipdate = f.max_ship
      |  GROUP BY lf.l_orderkey, f.n_supp
      |)
      |SELECT s_name, n_name, count(*) AS numwait
      |FROM am JOIN supplier ON late_supp = s_suppkey
      |JOIN nation ON s_nationkey = n_nationkey
      |WHERE n_supp > 1 AND n_late = 1
      |GROUP BY s_name, n_name
      |ORDER BY numwait DESC, s_name
      |LIMIT 20""".stripMargin

  /** Min-cost supplier per part (TPC-H Q2 analog, correlated-min shape).
    * The star schema has no partsupp, so the supply relation is derived:
    * per (part, supplier) the minimum observed list price in lineitem. The
    * correlated `WHERE cost = (SELECT min(cost) ... WHERE pk = outer.pk)`
    * becomes, Spark-side, a per-part min re-aggregation joined back on the
    * same key — the standard decorrelation Catalyst itself would produce.
    * Dimension sides (part slice, supplier×nation×region) broadcast; only
    * lineitem→(partkey,suppkey) shuffles, then the per-part min reuses the
    * much smaller supply relation.
    */
  def q2MinCostSupplier(spark: SparkSession, dir: String): DataFrame = {
    val pp = Tables.part(spark, dir).filter(col("p_type") === "STANDARD")
    val sd = Tables.supplier(spark, dir)
      .join(broadcast(Tables.nation(spark, dir)), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(spark, dir).filter(col("r_name") === "ASIA")),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("s_suppkey"), col("s_name"), col("s_acctbal"), col("n_name"))
    val l = Tables.lineitem(spark, dir)
    val supply = l
      .join(broadcast(pp), l("l_partkey") === pp("p_partkey"))
      .join(broadcast(sd), l("l_suppkey") === sd("s_suppkey"))
      .groupBy(col("l_partkey"), col("l_suppkey"), col("s_name"), col("s_acctbal"), col("n_name"))
      .agg(min(dec(col("l_extendedprice"))).as("ucost"))
    val minCost = supply.groupBy(col("l_partkey").as("m_partkey"))
      .agg(min(col("ucost")).as("min_cost"))
    supply.join(minCost,
        supply("l_partkey") === minCost("m_partkey") && supply("ucost") === minCost("min_cost"))
      .select(col("s_acctbal"), col("s_name"), col("n_name"),
        col("l_partkey").as("p_partkey"), col("ucost").cast("double").as("ucost"))
      .orderBy(col("s_acctbal").desc, col("n_name"), col("s_name"), col("p_partkey"))
      .limit(100)
  }

  val q2Sql: String =
    """WITH supply AS (
      |  SELECT l_partkey, l_suppkey, s_name, s_acctbal, n_name,
      |    min(CAST(l_extendedprice AS DECIMAL(12,2))) AS ucost
      |  FROM lineitem JOIN part ON l_partkey = p_partkey
      |  JOIN supplier ON l_suppkey = s_suppkey
      |  JOIN nation ON s_nationkey = n_nationkey
      |  JOIN region ON n_regionkey = r_regionkey
      |  WHERE p_type = 'STANDARD' AND r_name = 'ASIA'
      |  GROUP BY 1, 2, 3, 4, 5
      |)
      |SELECT s_acctbal, s_name, n_name, l_partkey AS p_partkey,
      |  CAST(ucost AS DOUBLE) AS ucost
      |FROM supply s
      |WHERE ucost = (SELECT min(ucost) FROM supply s2 WHERE s2.l_partkey = s.l_partkey)
      |ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
      |LIMIT 100""".stripMargin

  /** Product-profit by supplier nation and order year (TPC-H Q9 analog).
    * No partsupp → unit cost is the part's retail price, so
    * profit = disc price − p_retailprice·quantity, all in exact DECIMAL
    * (order-independent partial aggregation), rounded in decimal space at
    * the boundary (q7 form). part/supplier/nation broadcast; only the
    * lineitem↔orders join shuffles.
    */
  def q9ProductProfit(spark: SparkSession, dir: String): DataFrame = {
    val p = Tables.part(spark, dir).filter(col("p_name").like("%red%"))
    val s = Tables.supplier(spark, dir)
    val n = Tables.nation(spark, dir)
    val o = Tables.orders(spark, dir)
    val l = Tables.lineitem(spark, dir)
    val profit = discPrice(l) - dec(col("p_retailprice")) * dec(col("l_quantity"))
    l.join(o, l("l_orderkey") === o("o_orderkey"))
      .join(broadcast(p), l("l_partkey") === p("p_partkey"))
      .join(broadcast(s), l("l_suppkey") === s("s_suppkey"))
      .join(broadcast(n), s("s_nationkey") === n("n_nationkey"))
      .groupBy(col("n_name"), year(col("o_orderdate")).cast("long").as("o_year"))
      .agg(round(sum(profit), 2).cast("double").as("sum_profit"))
      .contractOrderBy(col("n_name"), col("o_year").desc)
  }

  val q9Sql: String =
    """SELECT n_name, CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS o_year,
      |  CAST(round(sum(
      |    CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2)))
      |    - CAST(p_retailprice AS DECIMAL(12,2)) * CAST(l_quantity AS DECIMAL(12,2))), 2) AS DOUBLE) AS sum_profit
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |JOIN part ON l_partkey = p_partkey
      |JOIN supplier ON l_suppkey = s_suppkey
      |JOIN nation ON s_nationkey = n_nationkey
      |WHERE p_name LIKE '%red%'
      |GROUP BY n_name, o_year
      |ORDER BY n_name, o_year DESC""".stripMargin

  /** High-value parts for one region's suppliers (TPC-H Q11 analog:
    * group-HAVING over a scalar aggregate). A part qualifies when its value
    * exceeds 1.5× the average part value — the threshold compares in exact
    * integer cents (value·n·2 > total·3) so no division ever happens and
    * both engines decide boundaries identically. The scalar (total, n) row
    * broadcasts via crossJoin; the value relation shuffles once on partkey.
    */
  def q11ImportantParts(spark: SparkSession, dir: String): DataFrame = {
    val sd = Tables.supplier(spark, dir)
      .join(broadcast(Tables.nation(spark, dir)), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(spark, dir).filter(col("r_name") === "ASIA")),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("s_suppkey"))
    val l = Tables.lineitem(spark, dir)
    val v = l.join(broadcast(sd), l("l_suppkey") === sd("s_suppkey"))
      .groupBy(col("l_partkey"))
      .agg(sum(dec(col("l_extendedprice"))).as("value"))
      .withColumn("vcents", (col("value") * 100).cast("long"))
    val tot = v.agg(sum(col("vcents")).as("tcents"), count(lit(1)).as("nparts"))
    // cross-multiply in DECIMAL(38,0), not Long: a Long product wraps
    // silently with ANSI off at large SF; decimal stays exact to 1e38
    // (far beyond any real corpus) and overflows LOUDLY under ANSI.
    // DuckDB side uses HUGEINT (int128) — same exact-or-loud contract.
    v.crossJoin(broadcast(tot))
      .filter(col("vcents").cast("decimal(38,0)") * col("nparts") * 2 >
        col("tcents").cast("decimal(38,0)") * 3)
      .select(col("l_partkey").as("p_partkey"), col("value").cast("double").as("value"))
      .contractOrderBy(col("value").desc, col("p_partkey"))
  }

  val q11Sql: String =
    """WITH v AS (
      |  SELECT l_partkey, sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS val,
      |    CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) * 100 AS BIGINT) AS vcents
      |  FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
      |  JOIN nation ON s_nationkey = n_nationkey
      |  JOIN region ON n_regionkey = r_regionkey
      |  WHERE r_name = 'ASIA'
      |  GROUP BY 1
      |), tot AS (SELECT CAST(sum(vcents) AS BIGINT) AS tcents, count(*) AS nparts FROM v)
      |SELECT l_partkey AS p_partkey, CAST(val AS DOUBLE) AS value
      |FROM v, tot
      |WHERE CAST(vcents AS HUGEINT) * nparts * 2 > CAST(tcents AS HUGEINT) * 3
      |ORDER BY value DESC, p_partkey""".stripMargin

  /** Small-lot revenue for one brand (TPC-H Q17 analog: per-part scalar
    * average threshold). Revenue of lineitems whose quantity is below 1/5 of
    * the part's average — `qty·5·cnt < sum_qty` in exact DECIMAL, the
    * division-free form of `qty < 0.2·avg`. The per-part aggregate is a
    * 1/25-of-parts brand slice, small enough to broadcast back onto
    * lineitem at any scale where `part` itself is broadcastable.
    */
  def q17SmallLots(spark: SparkSession, dir: String): DataFrame = {
    val p = Tables.part(spark, dir).filter(col("p_brand") === "Brand#3")
    val l = Tables.lineitem(spark, dir)
    val pa = l.join(broadcast(p), l("l_partkey") === p("p_partkey"))
      .groupBy(col("l_partkey").as("pa_partkey"))
      .agg(sum(dec(col("l_quantity"))).as("sq"), count(lit(1)).as("cnt"))
    val l2 = Tables.lineitem(spark, dir)
    l2.join(broadcast(pa), l2("l_partkey") === pa("pa_partkey"))
      .filter(dec(col("l_quantity")) * 5 * col("cnt") < col("sq"))
      .agg(
        round(sum(dec(col("l_extendedprice"))), 2).cast("double").as("revenue_small_lots"),
        count(lit(1)).as("n_lines"))
  }

  val q17Sql: String =
    """WITH pa AS (
      |  SELECT l_partkey AS pa_partkey, sum(CAST(l_quantity AS DECIMAL(12,2))) AS sq,
      |    count(*) AS cnt
      |  FROM lineitem JOIN part ON l_partkey = p_partkey
      |  WHERE p_brand = 'Brand#3'
      |  GROUP BY 1
      |)
      |SELECT
      |  CAST(round(sum(CAST(l_extendedprice AS DECIMAL(12,2))), 2) AS DOUBLE) AS revenue_small_lots,
      |  count(*) AS n_lines
      |FROM lineitem JOIN pa ON l_partkey = pa_partkey
      |WHERE CAST(l_quantity AS DECIMAL(12,2)) * 5 * cnt < sq""".stripMargin

  /** Suppliers dominating a part's volume (TPC-H Q20 analog: nested
    * semi-join over an aggregate). A (supplier, part) pair qualifies when
    * its quantity exceeds 2× the part's average pair quantity (exact cents:
    * q·np > tq·2); suppliers with any qualifying 'blue' part, restricted to
    * one region, survive a LEFT SEMI join. The pair aggregate shuffles on
    * (suppkey, partkey); the part re-aggregate rides the far smaller pair
    * relation; supplier×nation×region broadcasts.
    */
  def q20PromoSuppliers(spark: SparkSession, dir: String): DataFrame = {
    val p = Tables.part(spark, dir).filter(col("p_name").like("%blue%"))
    val l = Tables.lineitem(spark, dir)
    val pairq = l.join(broadcast(p), l("l_partkey") === p("p_partkey"))
      .groupBy(col("l_suppkey"), col("l_partkey"))
      .agg(sum(dec(col("l_quantity"))).as("q"))
      .withColumn("qcents", (col("q") * 100).cast("long"))
    val partq = pairq.groupBy(col("l_partkey").as("pq_partkey"))
      .agg(sum(col("qcents")).as("tqcents"), count(lit(1)).as("np"))
    // DECIMAL(38,0) cross-multiply (HUGEINT in the oracle): exact-or-loud
    // at any scale, never a silent Long wrap — same contract as q11
    val qualifying = pairq
      .join(partq, pairq("l_partkey") === partq("pq_partkey"))
      .filter(col("qcents").cast("decimal(38,0)") * col("np") >
        col("tqcents").cast("decimal(38,0)") * 2)
      .select(col("l_suppkey").as("qual_suppkey"))
    val s = Tables.supplier(spark, dir)
    s.join(broadcast(Tables.nation(spark, dir)), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(spark, dir).filter(col("r_name") === "ASIA")),
        col("n_regionkey") === col("r_regionkey"))
      .join(qualifying, col("s_suppkey") === col("qual_suppkey"), "left_semi")
      .select(col("s_name"), col("s_acctbal"))
      .contractOrderBy(col("s_name"))
  }

  val q20Sql: String =
    """WITH pairq AS (
      |  SELECT l_suppkey, l_partkey, sum(CAST(l_quantity AS DECIMAL(12,2))) AS q,
      |    CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) * 100 AS BIGINT) AS qcents
      |  FROM lineitem JOIN part ON l_partkey = p_partkey
      |  WHERE p_name LIKE '%blue%'
      |  GROUP BY 1, 2
      |), partq AS (
      |  SELECT l_partkey, CAST(sum(qcents) AS BIGINT) AS tqcents, count(*) AS np
      |  FROM pairq GROUP BY 1
      |)
      |SELECT s_name, s_acctbal
      |FROM supplier JOIN nation ON s_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |WHERE r_name = 'ASIA' AND s_suppkey IN (
      |  SELECT l_suppkey FROM pairq JOIN partq USING (l_partkey)
      |  WHERE CAST(qcents AS HUGEINT) * np > CAST(tqcents AS HUGEINT) * 2)
      |ORDER BY s_name""".stripMargin
}
