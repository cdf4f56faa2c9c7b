package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Semantics of the round-3 TPC-H-shape queries on hand-built rows. */
class RelationalTpchSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  // (orderkey, partkey, suppkey, linenumber, qty, extprice, discount,
  //  tax, returnflag, linestatus, shipdate)
  private lazy val lineitem = Seq(
    (1L, 1L, 1L, 1, 10.0, 1000.0, 0.05, 0.0, "N", "O", ts("1996-02-01 00:00:00")),
    (1L, 2L, 2L, 2, 30.0, 2000.0, 0.06, 0.0, "R", "O", ts("1996-03-15 00:00:00")),
    (2L, 1L, 1L, 1, 24.0, 500.0, 0.06, 0.0, "N", "O", ts("1996-06-01 00:00:00")),
    (2L, 2L, 2L, 2, 5.0, 800.0, 0.10, 0.0, "R", "F", ts("1997-01-01 00:00:00")),
    (3L, 1L, 2L, 1, 100.0, 9000.0, 0.07, 0.0, "N", "O", ts("1996-03-20 00:00:00")))
    .toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
      "l_quantity", "l_extendedprice", "l_discount", "l_tax",
      "l_returnflag", "l_linestatus", "l_shipdate")

  private lazy val orders = Seq(
    (1L, 10L, "O", 3000.0, ts("1996-01-15 00:00:00"), "1-URGENT"),
    (2L, 11L, "F", 1300.0, ts("1996-05-20 00:00:00"), "2-HIGH"),
    (3L, 10L, "O", 9000.0, ts("1996-02-01 00:00:00"), "3-MEDIUM"))
    .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
      "o_orderdate", "o_orderpriority")

  private lazy val customer = Seq(
    (10L, "CUST_A", 1, 100.0, "BUILDING"),
    (11L, "CUST_B", 2, 200.0, "AUTOMOBILE"))
    .toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")

  private lazy val supplier = Seq(
    (1L, "SUPP_1", 2, 0.0), (2L, "SUPP_2", 1, 0.0))
    .toDF("s_suppkey", "s_name", "s_nationkey", "s_acctbal")

  private lazy val nation = Seq(
    (1, "NATION_1", 0), (2, "NATION_2", 1))
    .toDF("n_nationkey", "n_name", "n_regionkey")

  private lazy val part = Seq(
    (1L, "part one 1", "Brand#1", "PROMO", 10, 10.0),
    (2L, "part two 1", "Brand#2", "STANDARD", 20, 20.0))
    .toDF("p_partkey", "p_name", "p_brand", "p_type", "p_size", "p_retailprice")

  test("q6: half-open shipdate window, inclusive discount band, qty bound") {
    // qualifying: row 1 (0.05, qty 10 < 24, 1996) and row 5 (0.07, qty
    // 100 -> excluded by qty), row 2 (0.06, qty 30 -> excluded), row 3
    // (qty 24 not < 24 -> excluded), row 4 (1997 -> excluded)
    val rev = Relational.q6ForecastRevenue(lineitem).as[Double].head()
    assert(math.abs(rev - 1000.0 * 0.05) < 1e-9)
  }

  test("q7: keeps both nation directions, groups by ship year") {
    val rows = Relational.q7NationVolume(nation, customer, supplier,
        orders, lineitem)
      .select("supp_nation", "cust_nation", "l_year", "revenue")
      .as[(String, String, Int, Double)].collect()
    // supplier nation = s_nationkey -> NATION_x; customer via o_custkey
    // cust 10 -> nation 1, cust 11 -> nation 2; supp 1 -> nation 2,
    // supp 2 -> nation 1. All five rows ship 1996/1997 inside the window.
    assert(rows.nonEmpty)
    assert(rows.forall { case (s, c, _, _) =>
      (s == "NATION_1" && c == "NATION_2") || (s == "NATION_2" && c == "NATION_1") })
    // directions present both ways
    assert(rows.exists(_._1 == "NATION_1") && rows.exists(_._1 == "NATION_2"))
  }

  test("q10: only returned lineitems in the order-date window count") {
    val rows = Relational.q10ReturnedItems(nation, customer, orders, lineitem)
      .select("c_custkey", "revenue").as[(Long, Double)].collect().toMap
    // 'R' rows: (o1, 2000@0.06) and (o2, 800@0.10); o2 orderdate
    // 1996-05-20 is outside [1996-01-01, 1996-04-01) -> only order 1
    assert(rows.keySet == Set(10L))
    assert(math.abs(rows(10L) - 2000.0 * 0.94) < 1e-9)
  }

  test("q14: promo share of the ship-month revenue") {
    val share = Relational.q14PromoRevenue(part, lineitem).as[Double].head()
    // March 1996 rows: o1/l2 (part 2, STANDARD, 1880) + o3/l1 (part 1,
    // PROMO, 8370); share = 100 * 8370 / (8370+1880)
    assert(math.abs(share - 100.0 * 8370.0 / 10250.0) < 1e-9)
  }

  test("q18: only orders whose total quantity exceeds the threshold") {
    val rows = Relational.q18LargeOrders(customer, orders, lineitem,
        minQty = 40.0)
      .select("o_orderkey", "sum_qty").as[(Long, Double)].collect().toMap
    assert(rows == Map(3L -> 100.0)) // o1=40 (not >40), o2=29, o3=100
  }

  test("q19: disjunctive brand/size/quantity arms are independent") {
    val rev = Relational.q19BrandRevenue(part, lineitem).as[Double].head()
    // arm1 (Brand#1, size 10 in [1,15], qty in [1,21]): row 1 qty 10 ✓
    //   (row 3 qty 24 out, row 5 qty 100 out)
    // arm2 (Brand#2, size 20 in [1,25], qty in [10,30]): row 2 qty 30 ✓
    //   (row 4 qty 5 out)
    assert(math.abs(rev - (1000.0 * 0.95 + 2000.0 * 0.94)) < 1e-9)
  }

  test("moving average uses a RANGE frame: calendar gaps shrink it") {
    val rows = Relational.movingAvgRevenue(lineitem)
      .select("day_no", "revenue", "ma7")
      .as[(Int, Double, Double)].collect()
    assert(rows.length == 5)
    val byDay = rows.map(r => r._1 -> r).toMap
    // 1996-03-15 and 1996-03-20 are 5 days apart -> one frame; every
    // other day is isolated, so its ma7 equals its own revenue
    val d0315 = byDay.keys.toSeq.sorted.apply(1)
    val d0320 = byDay.keys.toSeq.sorted.apply(2)
    assert(d0320 - d0315 == 5)
    assert(math.abs(byDay(d0320)._3 - (1880.0 + 8370.0) / 2) < 1e-9)
    rows.filter(r => r._1 != d0320)
      .foreach(r => assert(math.abs(r._3 - r._2) < 1e-9, r))
  }

  test("pivot cross-tab: conditional sums per (status, flag) cell") {
    val byStatus = Relational.pivotQuantities(lineitem)
      .collect().map(r => r.getString(0) ->
        (Option(r.get(1)), Option(r.get(2)), Option(r.get(3)))).toMap
    // O rows: N-flag qty 10+24+100=134, R-flag qty 30; F rows: R-flag 5
    assert(byStatus("O") == ((None, Some(134.0), Some(30.0))))
    assert(byStatus("F") == ((None, None, Some(5.0))))
  }

  test("q9: profit = disc price minus retail-cost proxy, by supp nation/year") {
    val rows = Relational.q9ProfitByNation(nation, supplier, part, orders, lineitem)
      .select("nation", "o_year", "sum_profit")
      .as[(String, Int, Double)].collect()
    assert(rows.nonEmpty)
    // supplier 1 (NATION_2) sells part 1 rows (o1/l1 1996, o2/l1 1996):
    // profit rows exist for both supplier nations, grouped by order year
    val byNation = rows.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    val expectedN2 = (1000.0 * 0.95 - 10.0 * 10.0) + (500.0 * 0.94 - 10.0 * 24.0)
    assert(math.abs(byNation("NATION_2") - expectedN2) < 1e-9)
  }

  test("importantParts keeps parts above 1/perMille of total value") {
    // part 1 value: 950 + 470 + 8370 = 9790; part 2: 1880 + 720 = 2600
    // total 12390; perMille=300 keeps value*300 > 12390 => value > 41.3
    val both = Relational.importantParts(lineitem, perMille = 300)
      .as[(Long, Double)].collect()
    assert(both.map(_._1).toSeq == Seq(1L, 2L)) // ordered by value desc
    assert(both.head._2 == 9790.0)
    // perMille=1250: threshold value > 9.912 both still pass; use a
    // tighter one to drop part 2: value*1 > total keeps none
    val none = Relational.importantParts(lineitem, perMille = 1)
      .as[(Long, Double)].collect()
    assert(none.isEmpty)
  }

  test("rankFamily: ties share rank, dense_rank stays dense") {
    val orders = Seq(
      (1L, 1L, "O", 500.0, ts("1996-01-01 00:00:00"), "1-URGENT"),
      (2L, 2L, "O", 500.0, ts("1996-01-02 00:00:00"), "1-URGENT"),
      (3L, 3L, "O", 300.0, ts("1996-01-03 00:00:00"), "1-URGENT"),
      (4L, 4L, "O", 900.0, ts("1996-01-04 00:00:00"), "5-LOW"))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
    val got = Relational.rankFamily(orders)
      .as[(String, Long, Double, Long, Long, Double, Double)].collect()
      .map(r => r._2 -> ((r._4, r._5, r._6, r._7))).toMap
    assert(got(1L) == ((1, 1, 0.0, 2.0 / 3.0)))   // tie at rank 1
    assert(got(2L) == ((1, 1, 0.0, 2.0 / 3.0)))
    assert(got(3L) == ((3, 2, 1.0, 1.0)))          // rank skips, dense doesn't
    assert(got(4L) == ((1, 1, 0.0, 1.0)))          // single-row partition
  }

  test("unpivot melts measures to (metric, value) rows") {
    val got = Relational.unpivotMetrics(lineitem)
      .as[(Long, Int, String, Double)].collect()
    assert(got.length == 15) // 5 lines x 3 measures
    val first = got.filter(r => r._1 == 1L && r._2 == 1)
      .map(r => r._3 -> r._4).toMap
    assert(first == Map("quantity" -> 10.0, "extendedprice" -> 1000.0,
      "discount" -> 0.05))
  }

  test("full-outer daily reconciliation keeps one-sided days") {
    val ev = Seq(
      (1L, 1L, ts("2024-01-01 10:00:00"), "signup"),
      (2L, 2L, ts("2024-01-02 10:00:00"), "purchase"),
      (3L, 3L, ts("2024-01-03 10:00:00"), "signup"),
      (4L, 3L, ts("2024-01-03 11:00:00"), "purchase"),
      (5L, 4L, ts("2024-01-03 12:00:00"), "click"))
      .toDF("event_id", "user_id", "ts", "event_type")
    val got = Relational.dailyActivityReconciliation(ev)
      .as[(String, Long, Long)].collect().toSeq
    assert(got == Seq(("2024-01-01", 1L, 0L), ("2024-01-02", 0L, 1L),
      ("2024-01-03", 1L, 1L)))
  }

  test("dominantSuppliers: only >half-of-part-quantity counts") {
    val part = Seq((1L, "red widget", "Brand#1", "ECONOMY", 10, 100.0),
        (2L, "red bolt", "Brand#2", "SMALL", 5, 50.0),
        (3L, "blue bolt", "Brand#3", "SMALL", 5, 50.0))
      .toDF("p_partkey", "p_name", "p_brand", "p_type", "p_size",
        "p_retailprice")
    val supplier = Seq((1L, "S1", 0L, 10.0), (2L, "S2", 1L, 20.0))
      .toDF("s_suppkey", "s_name", "s_nationkey", "s_acctbal")
    val got = Relational.dominantSuppliers(lineitem, part, supplier)
      .as[(Long, String, Long)].collect().map(r => r._1 -> r._3).toMap
    // part 1 qty: s1 has 10+24=34, s2 has 100 -> s2 dominates (100>67)
    // part 2 qty: s2 has 30+5=35, alone -> dominates; s1 dominates none
    assert(got == Map(2L -> 2L))
  }
}
