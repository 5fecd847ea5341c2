package graft

import graft.operators.Relational

class RelationalSpec extends SparkSpec {

  test("q1 pricing summary: 6 flag/status groups, exact decimal sums") {
    val rows = Relational.q1PricingSummary(spark, sf).collect()
    assert(rows.length == 6)
    val first = rows.head
    assert(first.getAs[String]("l_returnflag") == "A")
    // sums are positive, avg within quantity bounds [1, 50]
    rows.foreach { r =>
      assert(r.getAs[Double]("sum_qty") > 0)
      val avgQty = r.getAs[Double]("avg_qty")
      assert(avgQty >= 1.0 && avgQty <= 50.0)
      assert(r.getAs[Double]("sum_disc_price") <= r.getAs[Double]("sum_base_price"))
      assert(r.getAs[Double]("sum_charge") >= r.getAs[Double]("sum_disc_price"))
    }
  }

  test("q3 shipping priority: top-10, revenue descending, deterministic ties") {
    val rows = Relational.q3ShippingPriority(spark, sf).collect()
    assert(rows.length <= 10 && rows.nonEmpty)
    val revs = rows.map(_.getAs[Double]("revenue"))
    assert(revs.zip(revs.tail).forall { case (a, b) => a >= b })
  }

  test("q5 local supplier volume: ASIA nations only") {
    val rows = Relational.q5LocalSupplier(spark, sf).collect()
    assert(rows.nonEmpty && rows.length <= 5) // ASIA has 5 nations
  }

  test("q10 returned items: only customers with R-flag lineitems") {
    val rows = Relational.q10ReturnedItems(spark, sf).collect()
    assert(rows.nonEmpty && rows.length <= 20)
  }

  test("q_market_share: share in [0,1], promo ≤ total") {
    val rows = Relational.qMarketShare(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val share = r.getAs[Double]("promo_share")
      assert(share >= 0.0 && share <= 1.0)
      assert(r.getAs[Double]("promo_revenue") <= r.getAs[Double]("total_revenue"))
    }
  }

  test("q_window_topn: ≤2 rows per customer, rank 1 price ≥ rank 2 price") {
    val rows = Relational.qWindowTopN(spark, sf).collect()
    val byCust = rows.groupBy(_.getAs[Long]("o_custkey"))
    byCust.values.foreach { rs =>
      assert(rs.length <= 2)
      if (rs.length == 2) {
        val sorted = rs.sortBy(_.getAs[Int]("rn"))
        assert(sorted(0).getAs[Double]("o_totalprice") >= sorted(1).getAs[Double]("o_totalprice"))
      }
    }
  }

  test("q_rollup_agg: grand total row equals sum of leaves") {
    val rows = Relational.qRollupAgg(spark, sf).collect()
    val grand = rows.filter(r => r.getAs[String]("nation") == "ALL" && r.getAs[String]("segment") == "ALL")
    assert(grand.length == 1)
    val leafCount = rows.filter(r => r.getAs[String]("nation") != "ALL" && r.getAs[String]("segment") != "ALL")
      .map(_.getAs[Long]("n_customers")).sum
    assert(grand.head.getAs[Long]("n_customers") == leafCount)
  }

  test("q_semi_anti: no selected customer has an F-status order") {
    val rows = Relational.qSemiAnti(spark, sf).collect()
    val selected = rows.map(_.getAs[Long]("c_custkey")).toSet
    val fCust = sources.Tables.orders(spark, sf)
      .filter(org.apache.spark.sql.functions.col("o_orderstatus") === "F")
      .select("o_custkey").collect().map(_.getLong(0)).toSet
    assert(selected.intersect(fCust).isEmpty)
  }

  test("q_scalar_subquery: every row beats its brand average by 5%") {
    val rows = Relational.qScalarSubquery(spark, sf).collect()
    rows.foreach { r =>
      assert(r.getAs[Double]("p_retailprice") > r.getAs[Double]("brand_avg") * 1.05 - 1e-6)
    }
  }

  test("q7_nation_volume: no same-nation rows, years within the ship window") {
    val rows = Relational.q7NationVolume(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[String]("supp_nation") != r.getAs[String]("cust_nation"))
      val y = r.getAs[Int]("l_year")
      assert(y == 1996 || y == 1997)
      assert(r.getAs[Double]("volume") > 0)
    }
  }

  test("q12_priority_class: high+low equals the unconditional join count") {
    val rows = Relational.q12PriorityClass(spark, sf).collect()
    assert(rows.nonEmpty)
    val counted = rows.map(r =>
      r.getAs[Long]("high_line_count") + r.getAs[Long]("low_line_count")).sum
    val l = sources.Tables.lineitem(spark, sf).filter(
      org.apache.spark.sql.functions.col("l_shipdate") >= "1997-01-01" &&
      org.apache.spark.sql.functions.col("l_shipdate") < "1998-01-01")
    val o = sources.Tables.orders(spark, sf)
    val direct = l.join(o, l("l_orderkey") === o("o_orderkey")).count()
    assert(counted == direct)
  }

  test("q13_custdist: histogram sums back to the full customer count") {
    val rows = Relational.q13CustDist(spark, sf).collect()
    val total = rows.map(_.getAs[Long]("custdist")).sum
    assert(total == sources.Tables.customer(spark, sf).count())
  }

  test("q16_supplier_variety: brand filter applied, counts within supplier universe") {
    val rows = Relational.q16SupplierVariety(spark, sf).collect()
    assert(rows.nonEmpty)
    val nSuppliers = sources.Tables.supplier(spark, sf).count()
    rows.foreach { r =>
      assert(r.getAs[String]("p_brand") != "Brand#1")
      val c = r.getAs[Long]("supplier_cnt")
      assert(c >= 1 && c <= nSuppliers)
    }
  }

  test("q19_disjunctive: single row, consistent with a direct recount") {
    val rows = Relational.q19Disjunctive(spark, sf).collect()
    assert(rows.length == 1)
    assert(rows.head.getAs[Long]("n_lines") > 0)
    assert(rows.head.getAs[Double]("revenue") > 0)
  }

  test("q22_idle_rich: selected customers all beat the positive-balance average") {
    val c = sources.Tables.customer(spark, sf)
    import org.apache.spark.sql.functions.{col => f, sum => fsum, count => fcount, lit}
    val avgPos = c.filter(f("c_acctbal") > 0)
      .agg((fsum(f("c_acctbal").cast("decimal(12,2)")).cast("double") / fcount(lit(1))))
      .collect()(0).getDouble(0)
    val rows = Relational.q22IdleRich(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val n = r.getAs[Long]("numcust")
      assert(n > 0)
      // group average of selected customers must itself beat the threshold
      assert(r.getAs[Double]("totacctbal") / n > avgPos)
    }
  }

  test("q6_forecast_revenue: predicates push into the parquet scan, result sane") {
    val df = Relational.q6ForecastRevenue(spark, sf)
    val row = df.collect().head
    assert(row.getAs[Long]("n_lines") > 0 && row.getAs[Double]("revenue") > 0)
    assert(df.queryExecution.executedPlan.toString
      .contains("PushedFilters: [IsNotNull(l_shipdate)"))
  }

  test("q14_promo_share: share in (0,100), components reconcile") {
    val r = Relational.q14PromoShare(spark, sf).collect().head
    val share = r.getAs[Double]("promo_share")
    assert(share > 0 && share < 100)
    assert(r.getAs[Double]("promo_revenue") < r.getAs[Double]("total_revenue"))
  }

  test("q15_top_supplier: every returned supplier holds the exact max revenue") {
    val rows = Relational.q15TopSupplier(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.map(_.getAs[Double]("total_revenue")).distinct.length == 1)
  }

  test("q21_waiting_supplier: sole-latest-shipper blame, counts descend") {
    val rows = Relational.q21WaitingSupplier(spark, sf).collect()
    assert(rows.nonEmpty && rows.length <= 20)
    val waits = rows.map(_.getAs[Long]("numwait"))
    assert(waits.forall(_ > 0) && waits.sameElements(waits.sortBy(-_)))
  }

  test("plans: q5 broadcasts all dimension tables (single shuffle join on facts)") {
    val plan = Relational.q5LocalSupplier(spark, sf).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"))
  }

  test("q2_min_cost_supplier: each row holds its part's regional min cost") {
    val rows = Relational.q2MinCostSupplier(spark, sf).collect()
    assert(rows.nonEmpty && rows.length <= 100)
    // per part, every returned cost equals the min over returned rows of
    // that part (the query returns ALL min-achieving suppliers, so within
    // the output each part's costs are a single value)
    rows.groupBy(_.getAs[Long]("p_partkey")).foreach { case (_, rs) =>
      assert(rs.map(_.getAs[Double]("ucost")).distinct.length == 1)
    }
    val bals = rows.map(_.getAs[Double]("s_acctbal"))
    assert(bals.sameElements(bals.sortBy(-(_: Double))))
  }

  test("q9_product_profit: one row per (nation, year), years inside order range") {
    val rows = Relational.q9ProductProfit(spark, sf).collect()
    assert(rows.nonEmpty)
    val keys = rows.map(r => (r.getAs[String]("n_name"), r.getAs[Long]("o_year")))
    assert(keys.distinct.length == keys.length)
    assert(rows.forall { r => val y = r.getAs[Long]("o_year"); y >= 1995 && y <= 2001 })
  }

  test("q11_important_parts: every part beats 1.5x the average part value") {
    import org.apache.spark.sql.functions.{broadcast => b, col => f, sum => fsum, lit}
    val sd = sources.Tables.supplier(spark, sf)
      .join(b(sources.Tables.nation(spark, sf)), f("s_nationkey") === f("n_nationkey"))
      .join(b(sources.Tables.region(spark, sf).filter(f("r_name") === "ASIA")),
        f("n_regionkey") === f("r_regionkey"))
      .select(f("s_suppkey"))
    val l = sources.Tables.lineitem(spark, sf)
    val v = l.join(b(sd), l("l_suppkey") === sd("s_suppkey"))
      .groupBy(f("l_partkey"))
      .agg((fsum(f("l_extendedprice").cast("decimal(12,2)")) * 100).cast("long").as("vc"))
      .collect()
    val (t, n) = (v.map(_.getAs[Long]("vc")).sum, v.length.toLong)
    val rows = Relational.q11ImportantParts(spark, sf).collect()
    assert(rows.nonEmpty && rows.length < n)
    rows.foreach { r =>
      val vc = math.round(r.getAs[Double]("value") * 100)
      assert(vc * n * 2 > t * 3)
    }
  }

  test("q17_small_lots: single row, consistent sign and count") {
    val r = Relational.q17SmallLots(spark, sf).collect()
    assert(r.length == 1)
    assert(r.head.getAs[Long]("n_lines") > 0)
    assert(r.head.getAs[Double]("revenue_small_lots") > 0)
  }

  test("q20_promo_suppliers: suppliers are from ASIA, names ascend") {
    import org.apache.spark.sql.functions.{broadcast => b, col => f}
    val rows = Relational.q20PromoSuppliers(spark, sf).collect()
    assert(rows.nonEmpty)
    val names = rows.map(_.getAs[String]("s_name"))
    assert(names.sameElements(names.sorted))
    val asia = sources.Tables.supplier(spark, sf)
      .join(b(sources.Tables.nation(spark, sf)), f("s_nationkey") === f("n_nationkey"))
      .join(b(sources.Tables.region(spark, sf).filter(f("r_name") === "ASIA")),
        f("n_regionkey") === f("r_regionkey"))
      .select(f("s_name")).collect().map(_.getString(0)).toSet
    assert(names.forall(asia.contains))
  }
}
