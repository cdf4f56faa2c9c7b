package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.util.Cols

/**
 * Relational query suite over the TPC-H-ish star schema (FIXTURES.md §B)
 * — the t2 query surface (FIXTURES.md §C.7): filters, multi-way joins,
 * aggregates, windows, rollup, set ops, semi/anti joins.
 *
 * Determinism convention (DuckDB-oracle hash matching): monetary doubles
 * are routed through explicit DECIMAL casts so sums are exact and
 * order-independent; final values are cast back to DOUBLE. Every query
 * ends with a total ORDER BY.
 *
 * Scale notes: dimension sides (region, nation, customer at TPC-H
 * ratios, supplier) are broadcast; fact-fact joins (orders⋈lineitem)
 * shuffle on the join key — the partition-count/AQE knobs live in the
 * session, not the query. Filters sit directly on the scan so Catalyst
 * pushes them into parquet (`PushedFilters`).
 */
object Relational {

  /** Exact decimal view of a 2-decimal monetary double column. */
  private def dec(c: Column): Column = c.cast("decimal(12,2)")

  /** `l_extendedprice * (1 - l_discount)` with exact decimal math. */
  private def discPrice: Column =
    (dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount"))))
      .cast("decimal(18,4)")

  /** TPC-H Q1: pricing summary report. */
  def q1PricingSummary(lineitem: DataFrame): DataFrame = {
    val cnt = count(lit(1))
    lineitem
      .filter(col("l_shipdate") <= Cols.tsLit(lineitem, "l_shipdate", "1998-09-02 00:00:00"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(dec(col("l_quantity"))).cast("double").as("sum_qty"),
        sum(dec(col("l_extendedprice"))).cast("double").as("sum_base_price"),
        sum(discPrice).cast("double").as("sum_disc_price"),
        sum((discPrice * (lit(1) + dec(col("l_tax")))).cast("decimal(22,6)"))
          .cast("double").as("sum_charge"),
        (sum(dec(col("l_quantity"))).cast("double") / cnt).as("avg_qty"),
        (sum(dec(col("l_extendedprice"))).cast("double") / cnt).as("avg_price"),
        (sum(dec(col("l_discount"))).cast("double") / cnt).as("avg_disc"),
        cnt.as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  /** TPC-H Q3: top unshipped orders by revenue for one market segment. */
  def q3ShippingPriority(customer: DataFrame, orders: DataFrame,
                         lineitem: DataFrame): DataFrame = {
    val c = customer.filter(col("c_mktsegment") === "BUILDING")
    val o = orders.filter(
      col("o_orderdate") < Cols.tsLit(orders, "o_orderdate", "1998-06-01 00:00:00"))
    val l = lineitem.filter(
      col("l_shipdate") > Cols.tsLit(lineitem, "l_shipdate", "1998-06-01 00:00:00"))
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(sum(discPrice).cast("double").as("revenue"))
      .select(col("l_orderkey"), col("revenue"),
        Cols.epochUs(col("o_orderdate")).as("o_orderdate_us"),
        col("o_orderpriority"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  /** TPC-H Q5-style: revenue by nation within one region. */
  def q5RegionRevenue(region: DataFrame, nation: DataFrame,
                      customer: DataFrame, orders: DataFrame,
                      lineitem: DataFrame): DataFrame =
    lineitem
      .join(orders, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(customer), col("o_custkey") === col("c_custkey"))
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(region.filter(col("r_name") === "ASIA")),
        col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("n_name"))
      .agg(sum(discPrice).cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("n_name"))

  /** Top suppliers by lineitem revenue (broadcast dimension join). */
  def topSuppliers(supplier: DataFrame, lineitem: DataFrame,
                   k: Int = 10): DataFrame =
    lineitem
      .join(broadcast(supplier), col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("s_suppkey"), col("s_name"))
      .agg(sum(discPrice).cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("s_suppkey"))
      .limit(k)

  /**
   * TPC-H Q11 shape (adapted: the synthetic schema has no partsupp, so
   * "value" is the shipped discounted revenue per part): parts whose
   * revenue exceeds `1/perMille` of the whole corpus. The global total
   * is one extra scalar aggregate of the ALREADY per-part-aggregated
   * frame (tiny), broadcast back — and the threshold compare stays in
   * exact DECIMAL via an integer multiplier (value·perMille > total),
   * never a decimal/decimal division.
   */
  def importantParts(lineitem: DataFrame, perMille: Int = 1000): DataFrame = {
    val per = lineitem.groupBy(col("l_partkey"))
      .agg(sum(discPrice).as("value_dec"))
    val tot = per.agg(sum(col("value_dec")).as("total_dec"))
    per.crossJoin(broadcast(tot))
      .filter(col("value_dec") * perMille > col("total_dec"))
      .select(col("l_partkey"), col("value_dec").cast("double").as("part_value"))
      .orderBy(col("part_value").desc, col("l_partkey"))
  }

  /**
   * TPC-H Q20 shape (adapted, no partsupp): suppliers who DOMINATE a
   * name-filtered part — shipped more than half of its total quantity.
   * The name filter pushes into the part scan; part is broadcast; the
   * per-(supplier, part) and per-part aggregates reuse one shuffle key
   * prefix; the >½ test is exact decimal via doubling.
   */
  def dominantSuppliers(lineitem: DataFrame, part: DataFrame,
                        supplier: DataFrame,
                        namePrefix: String = "red"): DataFrame = {
    val parts = part.filter(col("p_name").startsWith(namePrefix))
      .select(col("p_partkey"))
    val sp = lineitem.join(broadcast(parts),
        col("l_partkey") === col("p_partkey"))
      .groupBy(col("l_suppkey"), col("l_partkey"))
      .agg(sum(dec(col("l_quantity"))).as("qty"))
    val perPart = sp.groupBy(col("l_partkey"))
      .agg(sum(col("qty")).as("part_total"))
    sp.join(perPart, "l_partkey")
      .filter(col("qty") * 2 > col("part_total"))
      .groupBy(col("l_suppkey")).agg(count(lit(1)).as("n_dominated"))
      .join(broadcast(supplier), col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"), col("n_dominated"))
      .orderBy(col("s_suppkey"))
  }

  /**
   * Seven-table star join — the join-reorder/broadcast-selection
   * stress shape: the lineitem fact against orders (fact-fact,
   * shuffle) and five dimensions (all broadcast-sized at TPC-H
   * ratios). The year filter sits on the fact scan (pushed to
   * parquet); Catalyst picks the join order — the query declares
   * only the star.
   */
  def starJoinRevenue(lineitem: DataFrame, orders: DataFrame,
                      customer: DataFrame, nation: DataFrame,
                      region: DataFrame, part: DataFrame,
                      supplier: DataFrame): DataFrame = {
    val li = lineitem.filter(
      col("l_shipdate") >= Cols.tsLit(lineitem, "l_shipdate", "1996-01-01 00:00:00") &&
      col("l_shipdate") < Cols.tsLit(lineitem, "l_shipdate", "1997-01-01 00:00:00"))
    li.join(orders, col("l_orderkey") === col("o_orderkey"))
      .join(customer, col("o_custkey") === col("c_custkey"))
      .join(nation, col("c_nationkey") === col("n_nationkey"))
      .join(region, col("n_regionkey") === col("r_regionkey"))
      .join(part, col("l_partkey") === col("p_partkey"))
      .join(supplier, col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("r_name"), col("p_type"))
      .agg(count(lit(1)).as("n_lines"),
        countDistinct(col("s_suppkey")).as("n_suppliers"),
        sum(discPrice).cast("double").as("revenue"))
      .orderBy(col("r_name"), col("p_type"))
  }

  /**
   * The full ranking-function family over one window — rank,
   * dense_rank, percent_rank, cume_dist per priority class by order
   * value. The ORDER BY carries no tie-break on purpose: these four
   * depend only on the key VALUES (peers share results), so the output
   * is deterministic even with ties, and ties actually exercise the
   * rank/dense_rank divergence. percent_rank and cume_dist are single
   * IEEE divisions of integers — engine-exact.
   */
  def rankFamily(orders: DataFrame, k: Int = 20): DataFrame = {
    val w = Window.partitionBy(col("o_orderpriority"))
      .orderBy(col("o_totalprice").desc)
    orders.select(col("o_orderpriority"), col("o_orderkey"),
        col("o_totalprice"),
        rank().over(w).cast("long").as("rnk"),
        dense_rank().over(w).cast("long").as("drnk"),
        percent_rank().over(w).as("prnk"), cume_dist().over(w).as("cdist"))
      .filter(col("rnk") <= k)
      .orderBy(col("o_orderpriority"), col("rnk"), col("o_orderkey"))
  }

  /**
   * UNPIVOT (wide → long): the three per-line monetary measures as
   * (metric, value) rows — the melt shape feeding generic
   * metric-store sinks. Spark's native `unpivot` keeps this a single
   * narrow projection (3× row expansion, no shuffle before the sort).
   */
  def unpivotMetrics(lineitem: DataFrame): DataFrame =
    lineitem.unpivot(
        Array(col("l_orderkey"), col("l_linenumber")),
        Array(col("l_quantity").as("quantity"),
          col("l_extendedprice").as("extendedprice"),
          col("l_discount").as("discount")),
        "metric", "value")
      .orderBy(col("l_orderkey"), col("l_linenumber"), col("metric"))

  /**
   * FULL OUTER daily reconciliation: signup days vs purchase days with
   * neither side dominant — days that saw only one kind of activity
   * survive with the other side null-counted. The join key is the
   * (low-cardinality) day, each side pre-aggregated before the join,
   * so the outer join exchanges day-counts, never events.
   */
  def dailyActivityReconciliation(events: DataFrame): DataFrame = {
    def daily(kind: String) = events
      .filter(col("event_type") === kind)
      .groupBy(to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as(s"n_$kind"))
    daily("signup").join(daily("purchase"), Seq("day"), "full_outer")
      .select(col("day").cast("string").as("day"),
        coalesce(col("n_signup"), lit(0L)).as("n_signup"),
        coalesce(col("n_purchase"), lit(0L)).as("n_purchase"))
      .orderBy(col("day"))
  }

  /** Ranking window: top-3 orders per customer by total price. */
  def topOrdersPerCustomer(orders: DataFrame, k: Int = 3): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    orders.select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
        row_number().over(w).cast("long").as("rn"))
      .filter(col("rn") <= k)
      .orderBy(col("o_custkey"), col("rn"))
  }

  /** ROLLUP aggregate over return flag / line status. */
  def rollupQuantities(lineitem: DataFrame): DataFrame =
    lineitem
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"),
        sum(dec(col("l_quantity"))).cast("double").as("sum_qty"))
      .select(coalesce(col("l_returnflag"), lit("ALL")).as("rf"),
        coalesce(col("l_linestatus"), lit("ALL")).as("ls"),
        col("n"), col("sum_qty"))
      .orderBy(col("rf"), col("ls"))

  /** Semi join: customers having at least one order above `minTotal`. */
  def customersWithBigOrders(customer: DataFrame, orders: DataFrame,
                             minTotal: Double): DataFrame =
    customer.join(orders.filter(col("o_totalprice") > minTotal),
        col("c_custkey") === col("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_name"))
      .orderBy(col("c_custkey"))

  /** Anti join: customers with no order above `minTotal`. */
  def customersWithoutOrders(customer: DataFrame, orders: DataFrame,
                             minTotal: Double = 0.0): DataFrame =
    customer.join(orders.filter(col("o_totalprice") > minTotal),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"))
      .orderBy(col("c_custkey"))

  /** TPC-H Q4-style: order-priority counts for late-shipping orders. */
  def orderPriorityCheck(orders: DataFrame, lineitem: DataFrame): DataFrame = {
    val o = orders.filter(
      col("o_orderdate") >= Cols.tsLit(orders, "o_orderdate", "1997-01-01 00:00:00") &&
        col("o_orderdate") < Cols.tsLit(orders, "o_orderdate", "1998-01-01 00:00:00"))
    val late = lineitem.select(col("l_orderkey"), col("l_shipdate"))
    o.join(late, col("l_orderkey") === col("o_orderkey") &&
        col("l_shipdate") > col("o_orderdate"), "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("o_orderpriority"))
  }

  /**
   * TPC-H Q17-style: revenue impact of small-quantity orders — a
   * correlated scalar subquery (`l_quantity < 0.2 * avg(qty) per
   * part`). Catalyst decorrelates it into an aggregate + join; the
   * per-part average is exact decimal math so the threshold compare is
   * engine-stable.
   */
  def q17SmallQuantity(part: DataFrame, lineitem: DataFrame,
                       brand: String = "BRAND_1"): DataFrame = {
    val perPart = lineitem.groupBy(col("l_partkey").as("pk"))
      .agg((sum(dec(col("l_quantity"))).cast("double") / count(lit(1)))
        .as("avg_qty"))
    lineitem
      .join(broadcast(part.filter(col("p_brand") === brand)),
        col("l_partkey") === col("p_partkey"))
      .join(perPart, col("l_partkey") === col("pk"))
      .filter(col("l_quantity") < lit(0.2) * col("avg_qty"))
      .agg((sum(dec(col("l_extendedprice"))).cast("double") / 7.0)
        .as("avg_yearly"))
  }

  /** Set difference: target-segment customers that lack a big order. */
  def segmentExceptBigSpenders(customer: DataFrame, orders: DataFrame,
                               minTotal: Double): DataFrame =
    customer.filter(col("c_mktsegment").isin("BUILDING", "AUTOMOBILE"))
      .select(col("c_custkey").as("key"))
      .except(orders.filter(col("o_totalprice") > minTotal)
        .select(col("o_custkey").as("key")))
      .orderBy(col("key"))

  /** TPC-H Q6: forecast revenue change — one tight scan-side filter
    * feeding a scalar aggregate; every predicate pushes into parquet. */
  def q6ForecastRevenue(lineitem: DataFrame): DataFrame =
    lineitem
      .filter(col("l_shipdate") >= Cols.tsLit(lineitem, "l_shipdate", "1996-01-01 00:00:00") &&
        col("l_shipdate") < Cols.tsLit(lineitem, "l_shipdate", "1997-01-01 00:00:00") &&
        col("l_discount") >= 0.05 && col("l_discount") <= 0.07 &&
        col("l_quantity") < 24)
      .agg(sum((dec(col("l_extendedprice")) * dec(col("l_discount")))
        .cast("decimal(18,4)")).cast("double").as("revenue"))

  /** TPC-H Q7-style: shipping volume between two nations by year —
    * both parties' nations resolved through broadcast dims, the
    * fact-fact join shuffles on orderkey only. */
  def q7NationVolume(nation: DataFrame, customer: DataFrame,
                     supplier: DataFrame, orders: DataFrame,
                     lineitem: DataFrame, nationA: String = "NATION_1",
                     nationB: String = "NATION_2"): DataFrame = {
    val n1 = nation.select(col("n_nationkey").as("s_nk"), col("n_name").as("supp_nation"))
    val n2 = nation.select(col("n_nationkey").as("c_nk"), col("n_name").as("cust_nation"))
    lineitem
      .filter(col("l_shipdate") >= Cols.tsLit(lineitem, "l_shipdate", "1996-01-01 00:00:00") &&
        col("l_shipdate") < Cols.tsLit(lineitem, "l_shipdate", "1998-01-01 00:00:00"))
      .join(orders, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(customer), col("o_custkey") === col("c_custkey"))
      .join(broadcast(supplier), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(n1), col("s_nationkey") === col("s_nk"))
      .join(broadcast(n2), col("c_nationkey") === col("c_nk"))
      .filter((col("supp_nation") === nationA && col("cust_nation") === nationB) ||
        (col("supp_nation") === nationB && col("cust_nation") === nationA))
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate")).as("l_year"))
      .agg(sum(discPrice).cast("double").as("revenue"))
      .orderBy(col("supp_nation"), col("cust_nation"), col("l_year"))
  }

  /** TPC-H Q8-style: one nation's market share inside a region's
    * order volume, by order year. Share = exact-decimal conditional
    * sum over exact-decimal total, divided as doubles at the end. */
  def q8MarketShare(region: DataFrame, nation: DataFrame,
                    customer: DataFrame, supplier: DataFrame,
                    orders: DataFrame, lineitem: DataFrame,
                    shareNation: String = "NATION_3",
                    regionName: String = "ASIA"): DataFrame = {
    val custNation = nation.join(broadcast(
        region.filter(col("r_name") === regionName)),
      col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey").as("c_nk"))
    val suppNation = nation.select(col("n_nationkey").as("s_nk"),
      col("n_name").as("supp_nation"))
    lineitem
      .join(orders, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(customer), col("o_custkey") === col("c_custkey"))
      .join(broadcast(custNation), col("c_nationkey") === col("c_nk"))
      .join(broadcast(supplier), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(suppNation), col("s_nationkey") === col("s_nk"))
      .groupBy(year(col("o_orderdate")).as("o_year"))
      .agg((sum(when(col("supp_nation") === shareNation, discPrice)
          .otherwise(lit(0).cast("decimal(18,4)"))).cast("double") /
        sum(discPrice).cast("double")).as("mkt_share"))
      .orderBy(col("o_year"))
  }

  /** TPC-H Q9-style: profit by supplier nation and year. The schema has
    * no partsupp, so product cost is proxied by `p_retailprice` (the
    * deterministic stand-in): profit = disc price − retailprice·qty. */
  def q9ProfitByNation(nation: DataFrame, supplier: DataFrame,
                       part: DataFrame, orders: DataFrame,
                       lineitem: DataFrame): DataFrame =
    lineitem
      .join(orders, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(part.filter(col("p_name").contains("1"))),
        col("l_partkey") === col("p_partkey"))
      .join(broadcast(supplier), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(nation), col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name").as("nation"), year(col("o_orderdate")).as("o_year"))
      .agg(sum((discPrice - (dec(col("p_retailprice")) * dec(col("l_quantity")))
          .cast("decimal(18,4)")).cast("decimal(22,4)"))
        .cast("double").as("sum_profit"))
      .orderBy(col("nation"), col("o_year").desc)

  /** TPC-H Q10: top customers by returned-item revenue in a quarter. */
  def q10ReturnedItems(nation: DataFrame, customer: DataFrame,
                       orders: DataFrame, lineitem: DataFrame,
                       k: Int = 20): DataFrame =
    lineitem.filter(col("l_returnflag") === "R")
      .join(orders.filter(
          col("o_orderdate") >= Cols.tsLit(orders, "o_orderdate", "1996-01-01 00:00:00") &&
          col("o_orderdate") < Cols.tsLit(orders, "o_orderdate", "1996-04-01 00:00:00")),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(customer), col("o_custkey") === col("c_custkey"))
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("c_custkey"), col("c_name"), col("c_acctbal"), col("n_name"))
      .agg(sum(discPrice).cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("c_custkey"))
      .limit(k)

  /** TPC-H Q14: promotion revenue share for one ship month. */
  def q14PromoRevenue(part: DataFrame, lineitem: DataFrame): DataFrame =
    lineitem
      .filter(col("l_shipdate") >= Cols.tsLit(lineitem, "l_shipdate", "1996-03-01 00:00:00") &&
        col("l_shipdate") < Cols.tsLit(lineitem, "l_shipdate", "1996-04-01 00:00:00"))
      .join(broadcast(part), col("l_partkey") === col("p_partkey"))
      .agg((lit(100.0) * sum(when(col("p_type") === "PROMO", discPrice)
          .otherwise(lit(0).cast("decimal(18,4)"))).cast("double") /
        sum(discPrice).cast("double")).as("promo_revenue"))

  /** TPC-H Q18: large-volume orders — customers whose single order
    * exceeds `minQty` total quantity. The having-filter runs on the
    * pre-aggregated (orderkey) side before the dimension joins. */
  def q18LargeOrders(customer: DataFrame, orders: DataFrame,
                     lineitem: DataFrame, minQty: Double = 120.0): DataFrame = {
    val big = lineitem.groupBy(col("l_orderkey").as("lk"))
      .agg(sum(dec(col("l_quantity"))).cast("double").as("sum_qty"))
      .filter(col("sum_qty") > minQty)
    orders.join(big, col("o_orderkey") === col("lk"))
      .join(broadcast(customer), col("o_custkey") === col("c_custkey"))
      .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
        Cols.epochUs(col("o_orderdate")).as("o_orderdate_us"),
        col("o_totalprice"), col("sum_qty"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
  }

  /** Quantity cross-tab: line status × return flag via `pivot` — the
    * relational PIVOT surface. Spark rewrites it to one aggregation
    * with a conditional sum per pivot value (the explicit value list
    * avoids the extra distinct-scan pass), identical in shape to the
    * CASE-sum formulation a SQL engine runs. */
  def pivotQuantities(lineitem: DataFrame): DataFrame =
    lineitem.groupBy(col("l_linestatus"))
      .pivot("l_returnflag", Seq("A", "N", "R"))
      .agg(sum(dec(col("l_quantity"))).cast("double"))
      .orderBy(col("l_linestatus"))

  /** Trailing 7-day moving average of daily revenue — the RANGE-frame
    * window shape (frame = value range on the day number, so calendar
    * gaps shrink the frame instead of sliding over them like a ROWS
    * frame would). The window input is the per-day aggregate (a few
    * thousand rows for years of data), so the unpartitioned frame scan
    * is trivially small; the heavy lifting is the daily groupBy, which
    * shuffles once on the day key. */
  def movingAvgRevenue(lineitem: DataFrame): DataFrame = {
    val daily = lineitem
      .groupBy(datediff(col("l_shipdate"), lit("1995-01-01").cast("date"))
        .as("day_no"))
      .agg(sum(discPrice).as("rev"))
    val w = Window.orderBy(col("day_no")).rangeBetween(-6, 0)
    daily.select(col("day_no"),
        col("rev").cast("double").as("revenue"),
        (sum(col("rev")).over(w).cast("double") /
          count(lit(1)).over(w)).as("ma7"))
      .orderBy(col("day_no"))
  }

  /**
   * Window value-function battery: first_value / last_value /
   * nth_value over an explicit both-unbounded ROWS frame (the default
   * frame stops at CURRENT ROW, which silently changes last_value —
   * spelling the frame keeps both engines on the same contract) plus
   * lag/lead with explicit defaults. All windows partition by order
   * key — balanced, never global; timestamps surface as epoch micros.
   * The synthetic `l_linenumber` is NOT unique within an order, so the
   * window order extends through part/supplier/price — ties in a
   * window ORDER BY would make lag/nth engine-dependent (rows fully
   * identical under the extended key produce identical outputs either
   * way, so the result multiset stays deterministic).
   */
  def windowValueFunctions(lineitem: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("l_orderkey"))
      .orderBy(col("l_linenumber"), col("l_partkey"), col("l_suppkey"),
        col("l_extendedprice"), col("l_quantity"), col("l_shipdate"))
    val wf = w.rowsBetween(Window.unboundedPreceding,
      Window.unboundedFollowing)
    val shipUs = Cols.epochUs(col("l_shipdate"))
    lineitem.select(col("l_orderkey"), col("l_linenumber"),
        first(shipUs).over(wf).as("first_ship_us"),
        last(shipUs).over(wf).as("last_ship_us"),
        nth_value(shipUs, 2).over(wf).as("second_ship_us"),
        lag(dec(col("l_quantity")).cast("double"), 1, -1.0).over(w)
          .as("prev_qty"),
        lead(dec(col("l_quantity")).cast("double"), 1, -1.0).over(w)
          .as("next_qty"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))
  }

  /**
   * Correlated-scalar-subquery shape: orders priced above their own
   * customer's average. Written AS correlated scalar subqueries (the
   * form analysts actually type) to exercise Catalyst's decorrelation:
   * both subqueries rewrite into ONE per-customer aggregate joined
   * back on the key — the plan must contain no nested-loop re-
   * execution per outer row (plan-asserted). The comparison runs in
   * integer cents (`cents · n > Σcents` avoids the float-average
   * boundary where engines disagree on ties).
   */
  def aboveAverageOrders(orders: DataFrame): DataFrame = {
    val s = orders.sparkSession
    orders.select(col("o_orderkey"), col("o_custkey"),
        expr("CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)")
          .as("cents"))
      .createOrReplaceTempView("corr_orders_v")
    s.sql("""
      SELECT x.o_orderkey, x.o_custkey, x.cents
      FROM corr_orders_v x
      WHERE x.cents * (SELECT count(*) FROM corr_orders_v i
                       WHERE i.o_custkey = x.o_custkey)
            > (SELECT sum(cents) FROM corr_orders_v i2
               WHERE i2.o_custkey = x.o_custkey)
      ORDER BY x.o_orderkey""")
  }

  /** TPC-H Q19: disjunctive brand/size/quantity predicate revenue —
    * the classic OR-of-ANDs filter Catalyst pushes as one conjunctive
    * superset (partkey join + residual disjunction). */
  def q19BrandRevenue(part: DataFrame, lineitem: DataFrame): DataFrame =
    lineitem
      .join(broadcast(part), col("l_partkey") === col("p_partkey"))
      .filter(
        (col("p_brand") === "Brand#1" && col("p_size").between(1, 15) &&
          col("l_quantity") >= 1 && col("l_quantity") <= 21) ||
        (col("p_brand") === "Brand#2" && col("p_size").between(1, 25) &&
          col("l_quantity") >= 10 && col("l_quantity") <= 30) ||
        (col("p_brand") === "Brand#3" && col("p_size").between(1, 35) &&
          col("l_quantity") >= 20 && col("l_quantity") <= 40))
      .agg(sum(discPrice).cast("double").as("revenue"))

  /**
   * Referential-integrity audit across the star schema: for each
   * declared FK edge, the child row count and how many child rows have
   * NO parent (orphans) — the data-quality gate run before trusting
   * any join result (an orphan silently vanishes from every inner
   * join). Each edge is one anti-join against a DISTINCT-key parent
   * projection (dimension keys broadcast when small; the fact side
   * never moves twice), folded into one tiny union report.
   */
  def fkIntegrity(edges: Seq[(String, DataFrame, String, DataFrame, String)]): DataFrame = {
    edges.map { case (name, child, childKey, parent, parentKey) =>
      val orphans = child.select(col(childKey))
        .join(parent.select(col(parentKey).as(childKey)).distinct(),
          Seq(childKey), "left_anti")
      child.select(count(lit(1)).as("n_child"))
        .crossJoin(orphans.select(count(lit(1)).as("n_orphans")))
        .select(lit(name).as("fk_edge"), col("n_child"), col("n_orphans"))
    }.reduce(_ unionByName _)
  }

  /**
   * Functional-dependency violation profile: for each declared FD
   * `LHS → rhs`, how many LHS groups exist, how many carry more than
   * one distinct RHS value, and how many rows sit in violating groups
   * — the schema-inference / data-quality companion to
   * [[fkIntegrity]] (an FD that "should" hold but doesn't is either a
   * dirty column or a wrong mental model of the schema; both corrupt
   * downstream dedup keys and join cardinality estimates).
   *
   * Scale shape: ONE keyed aggregation per FD (groupBy LHS with a
   * distinct-RHS count — Spark plans the distinct as a two-level
   * partial aggregate, both levels keyed and map-side combinable),
   * then a 1-row rollup per FD unioned into the report. NULL RHS
   * values are ignored by the distinct count (SQL semantics); NULL
   * LHS keys group together, matching the oracle's GROUP BY.
   */
  def fdViolations(fds: Seq[(String, DataFrame, Seq[String], String)]): DataFrame =
    fds.map { case (name, df, lhs, rhs) =>
      df.groupBy(lhs.map(col): _*)
        .agg(countDistinct(col(rhs)).as("n_rhs"), count(lit(1)).as("n_rows"))
        .agg(count(lit(1)).as("n_groups"),
          sum(when(col("n_rhs") > 1, 1L).otherwise(0L))
            .as("n_violating_groups"),
          sum(when(col("n_rhs") > 1, col("n_rows")).otherwise(0L))
            .as("n_violating_rows"))
        .select(lit(name).as("fd"), col("n_groups"),
          col("n_violating_groups"),
          coalesce(col("n_violating_rows"), lit(0L))
            .as("n_violating_rows"))
    }.reduce(_ unionByName _)

  /**
   * Ranking-function battery: rank / dense_rank / percent_rank /
   * cume_dist over a TIED order (they're peer-based, so ties are
   * deterministic) and ntile over the fully tie-broken order (ntile
   * assigns arbitrarily within peers — the (r4) window-determinism
   * gotcha, dodged by ordering on every referenced column). Keyed
   * windows only: partitions are per-order, bounded and balanced.
   */
  def windowRankFunctions(lineitem: DataFrame): DataFrame = {
    val tied = Window.partitionBy(col("l_orderkey"))
      .orderBy(col("l_quantity"))
    val total = Window.partitionBy(col("l_orderkey"))
      .orderBy(col("l_quantity"), col("l_linenumber"))
    lineitem.select(col("l_orderkey"), col("l_linenumber"),
        col("l_quantity").cast("long").as("qty"),
        rank().over(tied).cast("long").as("rnk"),
        dense_rank().over(tied).cast("long").as("drnk"),
        percent_rank().over(tied).as("prnk"),
        cume_dist().over(tied).as("cdist"),
        ntile(4).over(total).cast("long").as("quartile"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))
  }

  /**
   * Hot-key profile: the skew DIAGNOSIS that decides whether
   * [[saltedJoin]]'s remedy is needed — per join-key candidate, the
   * top-`topK` hottest keys with their count and skew factor
   * (count ÷ mean count; ≫1 on one key = that key serializes a plain
   * shuffle join). One keyed count aggregate (map-side combinable),
   * a 3-number rollup of the counts, and a top-k sort that plans as
   * TakeOrdered (per-partition partial top-k, never a full sort).
   */
  def hotKeyProfile(df: DataFrame, keyCol: String,
                    topK: Int = 10): DataFrame = {
    val counts = df.groupBy(col(keyCol).as("key"))
      .agg(count(lit(1)).as("cnt"))
    val summary = counts.agg(count(lit(1)).as("n_keys"),
      sum(col("cnt")).as("n_rows"))
    counts.orderBy(col("cnt").desc, col("key")).limit(topK)
      .crossJoin(broadcast(summary))
      .select(col("key"), col("cnt"),
        (col("cnt").cast("double") * col("n_keys") / col("n_rows"))
          .as("skew"),
        col("n_keys"), col("n_rows"))
      .orderBy(col("cnt").desc, col("key"))
  }

  /**
   * EXACT join-output cardinality WITHOUT running the join — the
   * pre-flight a planner (or an engineer about to launch a 100 TB
   * join) wants: per key, the join emits n_left·n_right rows, so two
   * keyed COUNT aggregates joined on the (key, counts) tables — each
   * orders of magnitude smaller than the data — give the exact total
   * and, more importantly, WHICH keys dominate it. A single hot key
   * pair (the many-to-many explosion [[hotKeyProfile]] flags on one
   * side) shows up as a large `share_ppm` before any shuffle of the
   * real data is paid for; the caller then picks [[saltedJoin]], a
   * pre-aggregation, or a key blacklist.
   *
   * Scale shape: two map-side-combinable aggregates, one join of
   * key-cardinality tables, a TakeOrdered top-k, and a broadcast
   * 1-row total. Products and the total run in DECIMAL(38,0) — two
   * 10⁹-row hot sides meet at 10¹⁸ pairs on ONE key, already at the
   * Long edge.
   */
  def joinSizeEstimate(left: DataFrame, leftKey: String,
                       right: DataFrame, rightKey: String,
                       topK: Int = 20): DataFrame = {
    val a = left.groupBy(col(leftKey).as("key"))
      .agg(count(lit(1)).as("n_left"))
    val b = right.groupBy(col(rightKey).as("key"))
      .agg(count(lit(1)).as("n_right"))
    val perKey = a.join(b, "key")
      .select(col("key"), col("n_left"), col("n_right"),
        (col("n_left").cast("decimal(38,0)") * col("n_right"))
          .cast("decimal(38,0)").as("pairs"))
    val total = perKey.agg(
      coalesce(sum(col("pairs")), lit(0)).cast("decimal(38,0)")
        .as("total_pairs"),
      count(lit(1)).as("n_matching_keys"))
    perKey.orderBy(col("pairs").desc, col("key")).limit(topK)
      .crossJoin(broadcast(total))
      // Output edge: pairs/total_pairs leave as BIGINT (the decimal
      // products stay internal — r6 verdict item 1). Envelope: int64
      // holds 9·10¹⁸ pairs — two 10⁹-row hot sides on one key; a
      // join bigger than that isn't runnable anyway, share_ppm
      // (formed on the decimals above) still reads correctly, and
      // past the envelope the guarded casts raise, never NULL.
      .select(col("key"), col("n_left"), col("n_right"),
        graft.util.Cols.longEdge(col("pairs"), "joinSizeEstimate pairs")
          .as("pairs"),
        graft.util.Cols.longEdge(col("total_pairs"),
          "joinSizeEstimate total_pairs").as("total_pairs"),
        col("n_matching_keys"),
        // `div` returns BIGINT for any operand type — engine-stable
        expr("cast((pairs * 1000000) div total_pairs as bigint)")
          .as("share_ppm"))
      .orderBy(col("pairs").desc, col("key"))
  }

  /**
   * Point-in-interval join WITHOUT the nested-loop trap. A range
   * predicate (`start ≤ p AND p ≤ end`) has no equi-key, so Spark
   * plans BroadcastNestedLoopJoin — O(points × intervals) compared
   * row pairs, the classic interval-join scale killer. This operator
   * restores an equi-key by binning the coordinate space: each
   * interval explodes to the `binWidth`-aligned bins it overlaps,
   * each point maps to exactly one bin, and the join runs on
   * (optional key columns, bin) as a plain hash/sort-merge equi-join
   * with the range predicate as a residual filter. A (point,
   * interval) pair can meet in at most one bin (the point's), so no
   * dedup pass is needed.
   *
   * Intervals are CLOSED (`[start, end]`, both inclusive).
   * `binWidth` trades fan-out for selectivity: an interval of length
   * L explodes to ⌊L/binWidth⌋+1 ≤ ⌈L/w⌉+1 rows, so pick
   * `binWidth` ≈ the typical interval length (fan-out ~2 while bin
   * collisions stay local). Coordinates must be non-negative Longs
   * (epoch micros in every caller here).
   *
   * Scale shape: both sides shuffle ONCE on (keys, bin) — balanced as
   * long as bins are (time-binned event data is; a pathological bin
   * is AQE skew-join territory, same as any hot equi-key). Plan-
   * asserted: no BroadcastNestedLoopJoin, no CartesianProduct.
   */
  def binnedIntervalJoin(points: DataFrame, ptCol: String,
                         intervals: DataFrame, startCol: String,
                         endCol: String, binWidth: Long,
                         keys: Seq[String] = Nil): DataFrame = {
    require(binWidth > 0, s"binWidth=$binWidth")
    val w = lit(binWidth)
    // bin id = the bin's aligned START coordinate (c − c mod w): pure
    // Long arithmetic, no division — exact at any epoch magnitude
    def binOf(c: Column) = c.cast("long") - pmod(c.cast("long"), w)
    val iv = intervals.withColumn("__bin",
      explode(sequence(binOf(col(startCol)), binOf(col(endCol)), w)))
    val pt = points.withColumn("__bin", binOf(col(ptCol)))
    pt.join(iv, keys :+ "__bin")
      .filter(col(ptCol) >= col(startCol) && col(ptCol) <= col(endCol))
      .drop("__bin")
  }

  /**
   * Skew-salted equi-join: the fact side gains a deterministic salt
   * in `[0, saltBuckets)` derived from `saltExpr` (row content, NOT
   * the join key — pmod of a content hash), and the dimension side
   * replicates each row `saltBuckets` times, one per salt value; the
   * join then runs on (key, salt). A hot fact key that would pile
   * onto one reducer spreads across `saltBuckets` of them, at the
   * cost of a `saltBuckets`× dimension replication — the standard
   * remedy when ONE key dominates and AQE's split-by-size skew
   * handling can't help (it splits partitions, not a single key's
   * hash bucket; a skewed BUILD side or a skewed sort-merge stripe
   * still serializes).
   *
   * Row-for-row identical to the plain inner join (spec-pinned):
   * every fact row meets each matching dim row in exactly its own
   * salt bucket. Use when dim × saltBuckets still fits comfortably
   * in the shuffle (dim small, fact skewed) — exactly the shape where
   * salting wins.
   */
  def saltedJoin(fact: DataFrame, factKey: String, dim: DataFrame,
                 dimKey: String, saltBuckets: Int,
                 saltExpr: Column): DataFrame = {
    require(saltBuckets >= 1, s"saltBuckets=$saltBuckets")
    val f = fact.withColumn("__salt",
      pmod(saltExpr, lit(saltBuckets.toLong)))
    val d = dim.withColumn("__salt",
      explode(sequence(lit(0L), lit(saltBuckets.toLong - 1))))
    f.join(d, f("__salt") === d("__salt") &&
        col(factKey) === col(dimKey))
      .drop("__salt")
  }
}
