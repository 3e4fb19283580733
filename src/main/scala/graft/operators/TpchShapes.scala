package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Exact._

/** Additional TPC-H-shaped query patterns (adapted to the driver's
  * column subset): conditional aggregation (Q12), LIKE-share ratio
  * (Q14), OR-of-ANDs predicate pushdown (Q19), and anti-join +
  * scalar-subquery prospecting (Q22). Each exercises a distinct
  * optimizer path — CASE-in-agg, two-sided conditional sums, complex
  * boolean pushdown through a join, and decorrelated aggregate
  * subqueries. */
object TpchShapes {

  /** Q12 shape: urgent vs non-urgent line counts per linestatus. */
  def priorityShipments(t: Tables): DataFrame =
    t.lineitem
      .join(t.orders, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_linestatus"))
      .agg(
        sum(when(col("o_orderpriority") === "1-URGENT" ||
          col("o_orderpriority") === "2-HIGH", 1L).otherwise(0L))
          .as("high_line_count"),
        sum(when(col("o_orderpriority") =!= "1-URGENT" &&
          col("o_orderpriority") =!= "2-HIGH", 1L).otherwise(0L))
          .as("low_line_count"))
      .orderBy(col("l_linestatus"))

  /** Q14 shape: PROMO parts' share of revenue in a shipdate month.
    * Both sums accumulate in exact decimal; the final ratio is one
    * double division — identical cross-engine. */
  def promoRevenueShare(t: Tables): DataFrame = {
    val promoRev = sum(when(col("p_type") === "PROMO",
      col("l_extendedprice").cast("decimal(18,2)") *
        (lit(1) - col("l_discount")).cast("decimal(18,2)"))
      .otherwise(lit(0).cast("decimal(18,2)"))).cast("double")
    val totalRev = sum(col("l_extendedprice").cast("decimal(18,2)") *
      (lit(1) - col("l_discount")).cast("decimal(18,2)")).cast("double")
    t.lineitem
      .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-02-01").cast("timestamp"))
      .join(broadcast(t.part), col("l_partkey") === col("p_partkey"))
      .agg((lit(100.0) * promoRev / totalRev).as("promo_revenue_pct"))
  }

  /** Q19 shape: disjunction of conjunctive brand/size/quantity clauses
    * — the OR-of-ANDs must still reach the scans (part filter pushed,
    * lineitem quantity bounds pushed as l_quantity >= 1 from the OR). */
  def brandRevenue(t: Tables): DataFrame = {
    val cond =
      (col("p_brand") === "Brand#11" && col("p_size").between(1, 5) &&
        col("l_quantity").between(1, 11)) ||
      (col("p_brand") === "Brand#22" && col("p_size").between(1, 10) &&
        col("l_quantity").between(10, 20)) ||
      (col("p_brand") === "Brand#33" && col("p_size").between(1, 15) &&
        col("l_quantity").between(20, 30))
    t.lineitem
      .join(broadcast(t.part), col("l_partkey") === col("p_partkey"))
      .filter(cond)
      .agg(sumProdD2(col("l_extendedprice"), lit(1) - col("l_discount"))
        .as("revenue"))
  }

  /** Q22 shape: well-funded customers (acctbal above the positive
    * average) in selected "country code" name suffixes who never
    * ordered — scalar subquery + anti-join + substring bucketing. */
  def globalSalesOpportunity(t: Tables): DataFrame = {
    // scalar subquery as a broadcast cross join: stays one job / one
    // plan (no driver-side action splitting the lineage)
    val avgBal = t.customer.filter(col("c_acctbal") > 0.0)
      .agg(avgD2(col("c_acctbal")).as("avg_bal"))
    val code = substring(col("c_name"), -1, 1) // last digit of the name
    t.customer
      .crossJoin(broadcast(avgBal))
      .filter(code.isin("1", "3", "5", "7", "9") &&
        col("c_acctbal") > col("avg_bal"))
      .join(t.orders.filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_custkey")),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy(code.as("cntrycode"))
      .agg(count(lit(1)).as("numcust"), sumD2(col("c_acctbal")).as("totacctbal"))
      .orderBy(col("cntrycode"))
  }

  /** Q8 shape: one supplier nation's share of a region's revenue in
    * one part family, per order year — the "national market share"
    * two-sided conditional aggregate. Both the numerator (volume where
    * the supplying nation is `nation`) and the denominator accumulate
    * in exact decimal inside ONE aggregate over the same joined rows;
    * the share is a single double division both engines evaluate
    * identically (the q58 promo-share recipe). Join order mirrors
    * selectivity: part (type filter, broadcast) prunes lineitem first,
    * the region-restricted customer→nation map broadcasts, supplier's
    * nation name arrives via one more broadcast — the fact table is
    * touched once and never re-shuffled between aggregates. */
  def marketShare(t: Tables, region: String = "ASIA",
      nation: String = "NATION_2", ptype: String = "STANDARD"): DataFrame = {
    val regionNations = t.nation
      .join(broadcast(t.region.filter(col("r_name") === region)),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey"))
    val vol = col("l_extendedprice").cast("decimal(18,2)") *
      (lit(1) - col("l_discount")).cast("decimal(18,2)")
    t.lineitem
      .join(broadcast(t.part.filter(col("p_type") === ptype)),
        col("l_partkey") === col("p_partkey"))
      .join(t.orders
          .filter(col("o_orderdate") >= to_timestamp(lit("1996-01-01")) &&
            col("o_orderdate") < to_timestamp(lit("1998-01-01"))),
        col("l_orderkey") === col("o_orderkey"))
      .join(t.customer, col("o_custkey") === col("c_custkey"))
      .join(broadcast(regionNations),
        col("c_nationkey") === col("n_nationkey"), "left_semi")
      .join(broadcast(t.supplier
          .join(broadcast(t.nation), col("s_nationkey") === col("n_nationkey"))
          .select(col("s_suppkey"), col("n_name").as("supp_nation"))),
        col("l_suppkey") === col("s_suppkey"))
      .groupBy(year(col("o_orderdate")).as("o_year"))
      .agg((sum(when(col("supp_nation") === nation, vol)
          .otherwise(lit(0).cast("decimal(18,2)"))).cast("double") /
        sum(vol).cast("double")).as("mkt_share"))
      .orderBy(col("o_year"))
  }

  /** Q11 shape: "important stock" — per-part shipped value from one
    * nation's suppliers, kept only where it exceeds `fraction` of that
    * nation's total (the HAVING-against-a-scalar-subquery pattern).
    * This dataset has no partsupp, so stock value is modeled as
    * shipped quantity × retail price — the SHAPE (two aggregations
    * over the same join, one reduced to a broadcast scalar, a HAVING
    * comparing them) is what's exercised. TPC-H scales Q11's fraction
    * by 1/SF because per-part share shrinks as parts multiply; the
    * same is done here IN-QUERY: the cut is `mult`× the MEAN per-part
    * share (2/|parts| of total by default), so the query returns a
    * meaningful head at every SF. Value accumulates in exact decimal;
    * the threshold is the identical multiply-then-divide double tree
    * in both engines. */
  def importantStock(t: Tables, nation: String = "NATION_2",
      mult: Double = 2.0): DataFrame = {
    val suppliers = t.supplier
      .join(broadcast(t.nation.filter(col("n_name") === nation)),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"))
    val base = t.lineitem
      .join(broadcast(suppliers), col("l_suppkey") === col("s_suppkey"),
        "left_semi")
      .join(t.part, col("l_partkey") === col("p_partkey"))
      .select(col("p_partkey"),
        (col("l_quantity").cast("decimal(18,2)") *
          col("p_retailprice").cast("decimal(18,2)")).as("v"))
    val total = base.agg(sum(col("v")).cast("double").as("total"),
      count_distinct(col("p_partkey")).as("nparts"))
    base.groupBy(col("p_partkey"))
      .agg(sum(col("v")).cast("double").as("value"))
      .crossJoin(broadcast(total))
      .filter(col("value") > lit(mult) * col("total") / col("nparts"))
      .select(col("p_partkey"), col("value"))
      .orderBy(col("value").desc, col("p_partkey"))
  }

  /** Q20 shape: suppliers who dominate the supply of some part — for
    * each (supplier, part) the shipped quantity in a year, kept where
    * it exceeds `share` of that part's total for the year, then the
    * distinct suppliers semi-joined back to their names/nations. The
    * nested-IN decorrelation: both aggregates are plain keyed
    * groupBys over the SAME filtered lineitem scan, the per-part
    * total arrives via an equi-join (broadcast-able: |parts| rows),
    * and the final step is a semi join — no correlated subquery
    * survives into the plan. */
  def dominantSuppliers(t: Tables, share: Double = 0.5,
      year: String = "1997"): DataFrame = {
    val li = t.lineitem
      .filter(col("l_shipdate") >= to_timestamp(lit(s"$year-01-01")) &&
        col("l_shipdate") < to_timestamp(lit(s"${year.toInt + 1}-01-01")))
      .select(col("l_suppkey"), col("l_partkey"), col("l_quantity"))
    val perSupp = li.groupBy(col("l_suppkey"), col("l_partkey"))
      .agg(sumD2(col("l_quantity")).as("sq"))
    val perPart = li.groupBy(col("l_partkey"))
      .agg(sumD2(col("l_quantity")).as("tq"))
    val dominant = perSupp
      .join(broadcast(perPart), "l_partkey")
      .filter(col("sq") > lit(share) * col("tq"))
      .select(col("l_suppkey")).distinct()
    t.supplier
      .join(broadcast(dominant), col("s_suppkey") === col("l_suppkey"),
        "left_semi")
      .join(broadcast(t.nation), col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("s_name"), col("n_name"))
      .orderBy(col("s_suppkey"))
  }

  /** TPC-H Q6 shape, served through the SQL-TEXT interface: the
    * library's tables registered as temp views and the query executed
    * with `spark.sql` — the surface a SQL-only user consumes. Same
    * Catalyst plan as the DataFrame form (pushdown included). */
  def forecastRevenueSql(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    t.lineitem.createOrReplaceTempView("graft_lineitem")
    spark.sql(
      """SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
        |  * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |FROM graft_lineitem
        |WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        |  AND l_shipdate < TIMESTAMP '1998-01-01'
        |  AND l_discount BETWEEN 0.03 AND 0.07
        |  AND l_quantity < 24""".stripMargin)
  }

  /** TPC-H Q17 shape: revenue lost to small-quantity orders — the
    * correlated `l_quantity < 0.2 * (SELECT AVG ... WHERE same part)`
    * subquery, decorrelated explicitly: the per-part threshold is a
    * groupBy over ONLY the brand's lineitems (semi-join first — the
    * per-part average is unchanged by filtering part keys), then a
    * join back. Exercises the aggregate-decorrelation path with the
    * filter pushed below the correlated aggregate. */
  def smallQuantityRevenue(t: Tables, brand: String = "Brand#11"): DataFrame = {
    val brandLines = t.lineitem
      .join(broadcast(t.part.filter(col("p_brand") === brand)
        .select(col("p_partkey"))),
        col("l_partkey") === col("p_partkey"))
    val thresholds = brandLines
      .groupBy(col("l_partkey").as("tp"))
      .agg((avgD2(col("l_quantity")) * 0.2).as("qty_threshold"))
    brandLines
      .join(thresholds, col("l_partkey") === col("tp"))
      .filter(col("l_quantity") < col("qty_threshold"))
      .agg((sumD2(col("l_extendedprice")) / 7.0).as("avg_yearly"))
  }

  /** TPC-H Q15 shape: the top-revenue supplier(s) for a quarter — a
    * grouped revenue view + a scalar MAX subquery, decorrelated as a
    * broadcast cross join so ties are kept and the plan stays one
    * job. */
  def topSupplier(t: Tables): DataFrame = {
    val rev = t.lineitem
      .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-04-01").cast("timestamp"))
      .groupBy(col("l_suppkey"))
      .agg(sumProdD2(col("l_extendedprice"), lit(1) - col("l_discount"))
        .as("total_revenue"))
    val mx = rev.agg(max(col("total_revenue")).as("mr"))
    rev.crossJoin(broadcast(mx))
      .filter(col("total_revenue") === col("mr"))
      .join(broadcast(t.supplier), col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"), col("total_revenue"))
      .orderBy(col("s_suppkey"))
  }

  /** TPC-H Q21 shape (adapted to this schema's dates): suppliers who
    * were the SOLE late shipper on a multi-supplier finished order
    * ("late" = shipped more than 90 days after the order date — the
    * schema has no commit/receipt dates). The reference shape's
    * EXISTS / NOT EXISTS pair decorrelates into one per-(order,
    * supplier) aggregate + one per-order aggregate + a join — no
    * correlated rescans of lineitem. */
  def soleLateSupplier(t: Tables): DataFrame = {
    val li = t.lineitem
      .join(t.orders.filter(col("o_orderstatus") === "F")
        .select(col("o_orderkey"), col("o_orderdate")),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("l_orderkey"), col("l_suppkey"),
        when(col("l_shipdate") >
          col("o_orderdate") + expr("INTERVAL 90 DAYS"), 1L)
          .otherwise(0L).as("late"))
    val perSupplier = li.groupBy(col("l_orderkey"), col("l_suppkey"))
      .agg(max(col("late")).as("sup_late"))
    val perOrder = perSupplier.groupBy(col("l_orderkey"))
      .agg(count(lit(1)).as("n_sup"), sum(col("sup_late")).as("n_late"))
    perSupplier.join(perOrder, "l_orderkey")
      .filter(col("sup_late") === 1 && col("n_sup") > 1 &&
        col("n_late") === 1)
      .join(broadcast(t.supplier), col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("s_name"))
      .agg(count(lit(1)).as("numwait"))
      .orderBy(col("numwait").desc, col("s_name"))
  }

  /** TPC-H Q7 shape: bilateral trade volume by year between two
    * nations — a 6-table star join (lineitem ⨝ orders ⨝ customer ⨝
    * supplier ⨝ nation ×2). Both nation dims broadcast; the
    * fact-to-fact joins (lineitem→orders on orderkey) shuffle on
    * their keys once. */
  def nationTradeVolume(t: Tables, n1: String = "NATION_3",
      n2: String = "NATION_7"): DataFrame = {
    val suppNation = t.supplier
      .join(broadcast(t.nation.select(col("n_nationkey"),
        col("n_name").as("supp_nation"))),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("supp_nation"))
    val custNation = t.customer
      .join(broadcast(t.nation.select(col("n_nationkey").as("cnk"),
        col("n_name").as("cust_nation"))),
        col("c_nationkey") === col("cnk"))
      .select(col("c_custkey"), col("cust_nation"))
    t.lineitem
      .join(t.orders.select(col("o_orderkey"), col("o_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(suppNation), col("l_suppkey") === col("s_suppkey"))
      .join(custNation, col("o_custkey") === col("c_custkey"))
      .filter((col("supp_nation") === n1 && col("cust_nation") === n2) ||
        (col("supp_nation") === n2 && col("cust_nation") === n1))
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate")).as("l_year"))
      .agg(sumProdD2(col("l_extendedprice"), lit(1) - col("l_discount"))
        .as("volume"))
      .orderBy(col("supp_nation"), col("cust_nation"), col("l_year"))
  }

  /** Q5-adjacent share-of-total analytics: nation revenue, its share
    * of the region total, and the within-region rank — the
    * ratio_to_report pattern. The region total is a WINDOW sum over
    * the per-nation DECIMAL subtotals (order-independent, so exact;
    * a double window-sum would be partition-order-nondeterministic),
    * cast to double only at the edge. All dims broadcast; the only
    * data-sized shuffle is the nation rollup. */
  def revenueShare(t: Tables): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val perNation = t.lineitem
      .join(t.orders, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(t.customer), col("o_custkey") === col("c_custkey"))
      .join(broadcast(t.nation), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(t.region), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(sum(col("l_extendedprice").cast("decimal(18,2)") *
        (lit(1) - col("l_discount")).cast("decimal(18,2)")).as("rev_dec"))
    val w = Window.partitionBy(col("r_name"))
    val wRank = w.orderBy(col("rev_dec").desc, col("n_name"))
    perNation
      .withColumn("region_dec", sum(col("rev_dec")).over(w))
      .withColumn("rnk", rank().over(wRank))
      .select(col("r_name"), col("n_name"),
        col("rev_dec").cast("double").as("revenue"),
        col("region_dec").cast("double").as("region_revenue"),
        (col("rev_dec").cast("double") / col("region_dec").cast("double"))
          .as("share"),
        col("rnk").cast("int").as("rnk"))
      .orderBy(col("r_name"), col("rnk"))
  }

  /** Q2 shape: the correlated "supplier with the minimum cost for
    * this part" subquery, decorrelated into a keyed window min — one
    * shuffle on partkey instead of a per-part subquery. Exact decimal
    * sums make the unit price bit-stable; ties on the minimum price
    * resolve to the smallest suppkey, so the answer is deterministic
    * regardless of how many suppliers tie. */
  def cheapestSupplierPerPart(t: Tables): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // partition by partkey ONCE: hash on pk satisfies both the
    // (pk, sk) aggregate's clustering AND the window's — without it
    // the plan shuffles on (pk, sk) and then AGAIN on pk
    val ps = t.lineitem
      .repartition(col("l_partkey"))
      .groupBy(col("l_partkey").as("pk"), col("l_suppkey").as("sk"))
      .agg((sum(col("l_extendedprice").cast("decimal(18,2)")).cast("double") /
        sum(col("l_quantity").cast("decimal(18,2)")).cast("double"))
        .as("unit_price"))
    ps.withColumn("best", min(col("unit_price"))
        .over(Window.partitionBy(col("pk"))))
      .filter(col("unit_price") === col("best"))
      .groupBy(col("pk").as("p_partkey"))
      .agg(min(col("sk")).as("cheapest_supp"),
        min(col("unit_price")).as("unit_price"))
      .orderBy(col("p_partkey"))
  }

  /** Q13 shape: distribution of per-customer order counts, INCLUDING
    * zero-order customers — the ON-clause extra predicate (not a WHERE)
    * is the point: it must not turn the left join into an inner one.
    * Two aggregations: per-customer count after the outer join, then a
    * tiny regroup over the distinct counts. */
  def customerDistribution(t: Tables): DataFrame =
    t.customer
      .join(t.orders,
        col("c_custkey") === col("o_custkey") &&
          col("o_orderpriority") =!= "5-LOW",
        "left")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("c_count"))
      .groupBy(col("c_count"))
      .agg(count(lit(1)).as("custdist"))
      .orderBy(col("custdist").desc, col("c_count").desc)

  /** Q10 shape: top-20 customers by revenue lost to returned items in
    * one year. Filters reach both scans before the joins (date window
    * on orders, returnflag on lineitem), nation broadcasts, and the
    * top-20 runs as TakeOrderedAndProject over the grouped result —
    * revenue ties (none in this data, verified) break on custkey. */
  def returnedItemCustomers(t: Tables): DataFrame =
    t.lineitem.filter(col("l_returnflag") === "R")
      .join(t.orders
          .filter(col("o_orderdate") >= to_timestamp(lit("1996-01-01")) &&
            col("o_orderdate") < to_timestamp(lit("1997-01-01"))),
        col("l_orderkey") === col("o_orderkey"))
      .join(t.customer, col("o_custkey") === col("c_custkey"))
      .join(broadcast(t.nation), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("c_custkey"), col("c_name"), col("c_acctbal"),
        col("n_name"))
      .agg(sumProdD2(col("l_extendedprice"), lit(1) - col("l_discount"))
        .as("revenue"))
      .orderBy(col("revenue").desc, col("c_custkey"))
      .limit(20)
      .select(col("c_custkey"), col("c_name"), col("revenue"),
        col("c_acctbal"), col("n_name"))

  /** Q16 shape: distinct-supplier counts per (brand, size) with a
    * NOT IN supplier exclusion — the NOT IN (non-null key) plans as a
    * broadcast anti join against the tiny excluded set, the part
    * filter prunes before the fact join, and lineitem serves as the
    * part↔supplier bridge (this dataset carries no partsupp table). */
  def partSupplierCounts(t: Tables): DataFrame = {
    val excluded = t.supplier.filter(col("s_acctbal") < 0)
      .select(col("s_suppkey"))
    t.lineitem
      .join(broadcast(excluded), col("l_suppkey") === col("s_suppkey"),
        "left_anti")
      .join(t.part.filter(col("p_brand") =!= "Brand#1" &&
          col("p_size") <= 10),
        col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"), col("p_size"))
      .agg(count_distinct(col("l_suppkey")).as("supplier_cnt"))
      .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_size"))
  }

  /** Q3 shape: top-10 highest-revenue orders not yet shipped by a
    * cutoff date, for one market segment. The segment filter prunes
    * customer before its join, the two date filters reach the orders
    * and lineitem scans, and the top-10 over the grouped revenue runs
    * as TakeOrderedAndProject (never a global sort of all groups).
    * Revenue ties break on l_orderkey for a total order. */
  def shippingPriority(t: Tables, segment: String = "BUILDING"): DataFrame =
    t.customer.filter(col("c_mktsegment") === segment)
      .join(t.orders
          .filter(col("o_orderdate") < to_timestamp(lit("1998-01-01"))),
        col("c_custkey") === col("o_custkey"))
      .join(t.lineitem
          .filter(col("l_shipdate") > to_timestamp(lit("1998-01-01"))),
        col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"))
      .agg(sumProdD2(col("l_extendedprice"), lit(1) - col("l_discount"))
        .as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
      .select(col("l_orderkey"), col("revenue"), col("o_orderdate"))

  /** Q4 shape: order-priority counts for orders with at least one
    * late line — the EXISTS correlated subquery planned as a LEFT
    * SEMI join (each order counted once however many lines are late).
    * "Late" is shipped > `lateDays` after the order date (this
    * dataset has no commit/receipt dates — the SHAPE is the point).
    * The join condition carries the date inequality, so the semi join
    * probes stop at the first late line per order. */
  def latePriorityOrders(t: Tables, lateDays: Int = 60): DataFrame =
    t.orders
      .join(t.lineitem.select(col("l_orderkey"), col("l_shipdate")),
        col("o_orderkey") === col("l_orderkey") &&
          col("l_shipdate") >
            col("o_orderdate") + expr(s"INTERVAL $lateDays DAYS"),
        "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("order_count"))
      .orderBy(col("o_orderpriority"))

  /** Q5 shape: revenue from orders whose customer and line supplier
    * sit in the SAME nation of one region — the classic 6-table snow-
    * flake join. nation/region broadcast; the c_nationkey=s_nationkey
    * co-location predicate rides the supplier join (not a post-join
    * filter), so no row survives the join only to be discarded. */
  def localSupplierVolume(t: Tables, region: String = "ASIA"): DataFrame = {
    val nations = t.nation
      .join(t.region.filter(col("r_name") === region),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey"), col("n_name"))
    t.customer
      .join(broadcast(nations), col("c_nationkey") === col("n_nationkey"))
      .join(t.orders
          .filter(col("o_orderdate") >= to_timestamp(lit("1996-01-01")) &&
            col("o_orderdate") < to_timestamp(lit("1998-01-01"))),
        col("c_custkey") === col("o_custkey"))
      .join(t.lineitem, col("o_orderkey") === col("l_orderkey"))
      .join(t.supplier,
        col("l_suppkey") === col("s_suppkey") &&
          col("s_nationkey") === col("c_nationkey"))
      .groupBy(col("n_name"))
      .agg(sumProdD2(col("l_extendedprice"), lit(1) - col("l_discount"))
        .as("revenue"))
      .orderBy(col("revenue").desc, col("n_name"))
  }

  /** Q9 shape: profit by supplier nation and order year for one part
    * family. This dataset has no partsupp, so supply cost is modeled
    * as half the part's retail price per unit — the SHAPE (5-table
    * join, derived measure with a subtraction, two-level group) is
    * what's exercised. Decimal accumulation keeps the mixed
    * multiply-subtract exact; the name filter prunes part first. */
  def nationYearProfit(t: Tables, family: String = "widget"): DataFrame =
    t.lineitem
      .join(t.part.filter(col("p_name").contains(family)),
        col("l_partkey") === col("p_partkey"))
      .join(t.supplier, col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(t.nation), col("s_nationkey") === col("n_nationkey"))
      .join(t.orders, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("n_name").as("nation"),
        year(col("o_orderdate")).as("o_year"))
      .agg(sum(col("l_extendedprice").cast("decimal(12,2)") *
          (lit(1) - col("l_discount")).cast("decimal(12,2)") -
          col("p_retailprice").cast("decimal(12,2)") *
            lit(0.5).cast("decimal(12,2)") *
            col("l_quantity").cast("decimal(12,2)"))
        .cast("string").cast("double").as("profit"))
      .orderBy(col("nation"), col("o_year").desc)

  /** Q18 shape: large-volume orders — customers whose single order
    * carries > 300 units. The HAVING over the order-level rollup
    * happens BEFORE the customer/orders joins (groupBy lineitem alone,
    * then join the survivors), so the join input is the filtered
    * order set, not all lineitems — the decorrelation Q18's IN
    * subquery asks for. */
  def largeOrderCustomers(t: Tables, minQty: Double = 300.0): DataFrame = {
    val big = t.lineitem.groupBy(col("l_orderkey"))
      .agg(sumD2(col("l_quantity")).as("total_qty"))
      .filter(col("total_qty") > minQty)
    big.join(t.orders, col("l_orderkey") === col("o_orderkey"))
      .join(t.customer, col("o_custkey") === col("c_custkey"))
      .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
        col("o_orderdate"), col("o_totalprice"), col("total_qty"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(100)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q141_shipping_priority" -> ((s, d) => shippingPriority(Tables(s, d))),
    "q150_late_priority_orders" ->
      ((s, d) => latePriorityOrders(Tables(s, d))),
    "q142_local_supplier_volume" ->
      ((s, d) => localSupplierVolume(Tables(s, d))),
    "q143_nation_year_profit" -> ((s, d) => nationYearProfit(Tables(s, d))),
    "q171_market_share" -> ((s, d) => marketShare(Tables(s, d))),
    "q184_important_stock" -> ((s, d) => importantStock(Tables(s, d))),
    "q185_dominant_suppliers" ->
      ((s, d) => dominantSuppliers(Tables(s, d))),
    "q144_large_order_customers" ->
      ((s, d) => largeOrderCustomers(Tables(s, d))),
    "q121_customer_distribution" ->
      ((s, d) => customerDistribution(Tables(s, d))),
    "q122_returned_customers" ->
      ((s, d) => returnedItemCustomers(Tables(s, d))),
    "q123_part_supplier_counts" ->
      ((s, d) => partSupplierCounts(Tables(s, d))),
    "q113_cheapest_supplier" -> ((s, d) => cheapestSupplierPerPart(Tables(s, d))),
    "q105_revenue_share" -> ((s, d) => revenueShare(Tables(s, d))),
    "q79_nation_trade" -> ((s, d) => nationTradeVolume(Tables(s, d))),
    "q68_sql_forecast_revenue" -> ((s, d) => forecastRevenueSql(s, d)),
    "q57_priority_shipments" -> ((s, d) => priorityShipments(Tables(s, d))),
    "q58_promo_revenue" -> ((s, d) => promoRevenueShare(Tables(s, d))),
    "q59_brand_revenue" -> ((s, d) => brandRevenue(Tables(s, d))),
    "q64_sales_opportunity" -> ((s, d) => globalSalesOpportunity(Tables(s, d))),
    "q76_small_qty_revenue" -> ((s, d) => smallQuantityRevenue(Tables(s, d))),
    "q77_top_supplier" -> ((s, d) => topSupplier(Tables(s, d))),
    "q78_sole_late_supplier" -> ((s, d) => soleLateSupplier(Tables(s, d)))
  )

  val oracleSql: Map[String, String] = Map(
    "q150_late_priority_orders" ->
      """SELECT o_orderpriority,
        |  CAST(count(*) AS BIGINT) AS order_count
        |FROM orders
        |WHERE EXISTS (
        |  SELECT 1 FROM lineitem
        |  WHERE l_orderkey = o_orderkey
        |    AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "q141_shipping_priority" ->
      """SELECT l_orderkey,
        |  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |    CAST(1.0 - l_discount AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE)
        |    AS revenue,
        |  o_orderdate
        |FROM customer, orders, lineitem
        |WHERE c_mktsegment = 'BUILDING' AND c_custkey = o_custkey
        |  AND l_orderkey = o_orderkey
        |  AND o_orderdate < TIMESTAMP '1998-01-01'
        |  AND l_shipdate > TIMESTAMP '1998-01-01'
        |GROUP BY l_orderkey, o_orderdate
        |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin,
    "q142_local_supplier_volume" ->
      """SELECT n_name,
        |  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |    CAST(1.0 - l_discount AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE)
        |    AS revenue
        |FROM customer, orders, lineitem, supplier, nation, region
        |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
        |  AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
        |  AND r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1998-01-01'
        |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin,
    // same decimal value sums on both sides of the HAVING, one double
    // multiply for the threshold
    "q184_important_stock" ->
      """WITH base AS (
        |  SELECT p_partkey,
        |    CAST(l_quantity AS DECIMAL(18,2)) *
        |      CAST(p_retailprice AS DECIMAL(18,2)) AS v
        |  FROM lineitem
        |  JOIN part ON l_partkey = p_partkey
        |  WHERE l_suppkey IN (
        |    SELECT s_suppkey FROM supplier
        |    JOIN nation ON s_nationkey = n_nationkey
        |    WHERE n_name = 'NATION_2')),
        |tot AS (SELECT CAST(sum(v) AS DOUBLE) AS total,
        |          CAST(count(DISTINCT p_partkey) AS BIGINT) AS nparts
        |        FROM base)
        |SELECT p_partkey, CAST(sum(v) AS DOUBLE) AS value
        |FROM base, tot
        |GROUP BY p_partkey, total, nparts
        |HAVING CAST(sum(v) AS DOUBLE) > 2.0 * total / nparts
        |ORDER BY value DESC, p_partkey""".stripMargin,
    // both aggregates over the same filtered scan; dominance check is
    // one double multiply; final semi join via IN
    "q185_dominant_suppliers" ->
      """WITH li AS (
        |  SELECT l_suppkey, l_partkey, l_quantity FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        |    AND l_shipdate < TIMESTAMP '1998-01-01'),
        |per_supp AS (
        |  SELECT l_suppkey, l_partkey,
        |    CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sq
        |  FROM li GROUP BY 1, 2),
        |per_part AS (
        |  SELECT l_partkey,
        |    CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS tq
        |  FROM li GROUP BY 1)
        |SELECT s_suppkey, s_name, n_name
        |FROM supplier JOIN nation ON s_nationkey = n_nationkey
        |WHERE s_suppkey IN (
        |  SELECT DISTINCT l_suppkey FROM per_supp
        |  JOIN per_part USING (l_partkey)
        |  WHERE sq > 0.5 * tq)
        |ORDER BY s_suppkey""".stripMargin,
    // the same single-aggregate two-sided conditional sum: numerator
    // and denominator from one pass, share as one double division
    "q171_market_share" ->
      """SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
        |  CAST(SUM(CASE WHEN sn.n_name = 'NATION_2'
        |      THEN CAST(l_extendedprice AS DECIMAL(18,2)) *
        |        CAST(1.0 - l_discount AS DECIMAL(18,2))
        |      ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
        |    / CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |        CAST(1.0 - l_discount AS DECIMAL(18,2))) AS DOUBLE)
        |    AS mkt_share
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation cn ON c_nationkey = cn.n_nationkey
        |JOIN region ON cn.n_regionkey = r_regionkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation sn ON s_nationkey = sn.n_nationkey
        |WHERE p_type = 'STANDARD' AND r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1998-01-01'
        |GROUP BY year(o_orderdate)
        |ORDER BY o_year""".stripMargin,
    "q143_nation_year_profit" ->
      """SELECT n_name AS nation,
        |  CAST(year(o_orderdate) AS INTEGER) AS o_year,
        |  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) *
        |      CAST(1.0 - l_discount AS DECIMAL(12,2)) -
        |      CAST(p_retailprice AS DECIMAL(12,2)) *
        |        CAST(0.5 AS DECIMAL(12,2)) *
        |        CAST(l_quantity AS DECIMAL(12,2))) AS VARCHAR) AS DOUBLE)
        |    AS profit
        |FROM lineitem, part, supplier, nation, orders
        |WHERE l_partkey = p_partkey AND l_suppkey = s_suppkey
        |  AND s_nationkey = n_nationkey AND l_orderkey = o_orderkey
        |  AND p_name LIKE '%widget%'
        |GROUP BY n_name, year(o_orderdate)
        |ORDER BY nation, o_year DESC""".stripMargin,
    "q144_large_order_customers" ->
      """WITH big AS (
        |  SELECT l_orderkey,
        |    CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
        |      AS total_qty
        |  FROM lineitem GROUP BY l_orderkey
        |  HAVING CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
        |    > 300.0)
        |SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
        |  total_qty
        |FROM big, orders, customer
        |WHERE l_orderkey = o_orderkey AND o_custkey = c_custkey
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""".stripMargin,
    "q121_customer_distribution" ->
      """SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
        |FROM (SELECT c_custkey, CAST(count(o_orderkey) AS BIGINT) AS c_count
        |      FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |        AND o_orderpriority <> '5-LOW'
        |      GROUP BY c_custkey) c
        |GROUP BY c_count ORDER BY custdist DESC, c_count DESC""".stripMargin,
    "q122_returned_customers" ->
      """SELECT c_custkey, c_name,
        |  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |    CAST(1.0 - l_discount AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE)
        |    AS revenue,
        |  c_acctbal, n_name
        |FROM customer, orders, lineitem, nation
        |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
        |  AND o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1997-01-01'
        |  AND l_returnflag = 'R' AND c_nationkey = n_nationkey
        |GROUP BY c_custkey, c_name, c_acctbal, n_name
        |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin,
    "q123_part_supplier_counts" ->
      """SELECT p_brand, p_size,
        |  CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
        |FROM part JOIN lineitem ON p_partkey = l_partkey
        |WHERE p_brand <> 'Brand#1' AND p_size <= 10
        |  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier
        |                        WHERE s_acctbal < 0)
        |GROUP BY p_brand, p_size
        |ORDER BY supplier_cnt DESC, p_brand, p_size""".stripMargin,
    "q113_cheapest_supplier" -> {
      def d(e: String) = s"CAST(CAST($e AS VARCHAR) AS DOUBLE)"
      s"""WITH ps AS (
         |  SELECT l_partkey AS pk, l_suppkey AS sk,
         |    ${d("SUM(CAST(l_extendedprice AS DECIMAL(18,2)))")} /
         |    ${d("SUM(CAST(l_quantity AS DECIMAL(18,2)))")} AS unit_price
         |  FROM lineitem GROUP BY 1, 2),
         |w AS (
         |  SELECT pk, sk, unit_price,
         |    min(unit_price) OVER (PARTITION BY pk) AS best
         |  FROM ps)
         |SELECT pk AS p_partkey, CAST(min(sk) AS BIGINT) AS cheapest_supp,
         |  min(unit_price) AS unit_price
         |FROM w WHERE unit_price = best
         |GROUP BY pk ORDER BY pk""".stripMargin
    },
    "q105_revenue_share" -> {
      def d(e: String) = s"CAST(CAST($e AS VARCHAR) AS DOUBLE)"
      s"""WITH pn AS (
         |  SELECT r_name, n_name,
         |    SUM(CAST(l_extendedprice AS DECIMAL(18,2))
         |      * CAST(1 - l_discount AS DECIMAL(18,2))) AS rev_dec
         |  FROM lineitem
         |  JOIN orders ON l_orderkey = o_orderkey
         |  JOIN customer ON o_custkey = c_custkey
         |  JOIN nation ON c_nationkey = n_nationkey
         |  JOIN region ON n_regionkey = r_regionkey
         |  GROUP BY 1, 2)
         |SELECT r_name, n_name, ${d("rev_dec")} AS revenue,
         |  ${d("SUM(rev_dec) OVER (PARTITION BY r_name)")} AS region_revenue,
         |  ${d("rev_dec")} /
         |    ${d("SUM(rev_dec) OVER (PARTITION BY r_name)")} AS share,
         |  CAST(rank() OVER (PARTITION BY r_name
         |    ORDER BY rev_dec DESC, n_name) AS INTEGER) AS rnk
         |FROM pn ORDER BY r_name, rnk""".stripMargin
    },
    "q79_nation_trade" ->
      """SELECT supp_nation, cust_nation, l_year,
        |  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
        |    * CAST(1 - l_discount AS DECIMAL(18,2))) AS VARCHAR)
        |    AS DOUBLE) AS volume
        |FROM (
        |  SELECT ns.n_name AS supp_nation, nc.n_name AS cust_nation,
        |    EXTRACT(year FROM l_shipdate) AS l_year,
        |    l_extendedprice, l_discount
        |  FROM lineitem
        |  JOIN orders ON l_orderkey = o_orderkey
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN nation ns ON s_nationkey = ns.n_nationkey
        |  JOIN nation nc ON c_nationkey = nc.n_nationkey
        |  WHERE (ns.n_name = 'NATION_3' AND nc.n_name = 'NATION_7')
        |     OR (ns.n_name = 'NATION_7' AND nc.n_name = 'NATION_3'))
        |GROUP BY supp_nation, cust_nation, l_year
        |ORDER BY supp_nation, cust_nation, l_year""".stripMargin,
    "q76_small_qty_revenue" ->
      """WITH brand_lines AS (
        |  SELECT l_partkey, l_quantity, l_extendedprice
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  WHERE p_brand = 'Brand#11'),
        |th AS (
        |  SELECT l_partkey AS tp,
        |    CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS VARCHAR)
        |      AS DOUBLE) / COUNT(*) * 0.2 AS qty_threshold
        |  FROM brand_lines GROUP BY l_partkey)
        |SELECT CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)))
        |    AS VARCHAR) AS DOUBLE) / 7.0 AS avg_yearly
        |FROM brand_lines b JOIN th ON b.l_partkey = th.tp
        |WHERE b.l_quantity < th.qty_threshold""".stripMargin,
    "q77_top_supplier" ->
      """WITH rev AS (
        |  SELECT l_suppkey,
        |    CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
        |      * CAST(1 - l_discount AS DECIMAL(18,2))) AS VARCHAR)
        |      AS DOUBLE) AS total_revenue
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        |    AND l_shipdate < TIMESTAMP '1997-04-01'
        |  GROUP BY l_suppkey)
        |SELECT s_suppkey, s_name, total_revenue
        |FROM rev JOIN supplier ON l_suppkey = s_suppkey
        |WHERE total_revenue = (SELECT MAX(total_revenue) FROM rev)
        |ORDER BY s_suppkey""".stripMargin,
    "q78_sole_late_supplier" ->
      """WITH li AS (
        |  SELECT l_orderkey, l_suppkey,
        |    CASE WHEN l_shipdate > o_orderdate + INTERVAL 90 DAY
        |      THEN 1 ELSE 0 END AS late
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  WHERE o_orderstatus = 'F'),
        |per_supplier AS (
        |  SELECT l_orderkey, l_suppkey, MAX(late) AS sup_late
        |  FROM li GROUP BY l_orderkey, l_suppkey),
        |per_order AS (
        |  SELECT l_orderkey, COUNT(*) AS n_sup, SUM(sup_late) AS n_late
        |  FROM per_supplier GROUP BY l_orderkey)
        |SELECT s_name, COUNT(*) AS numwait
        |FROM per_supplier p
        |JOIN per_order o ON p.l_orderkey = o.l_orderkey
        |JOIN supplier ON p.l_suppkey = s_suppkey
        |WHERE p.sup_late = 1 AND o.n_sup > 1 AND o.n_late = 1
        |GROUP BY s_name
        |ORDER BY numwait DESC, s_name""".stripMargin,
    "q68_sql_forecast_revenue" ->
      """SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
        |  * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        |  AND l_shipdate < TIMESTAMP '1998-01-01'
        |  AND l_discount BETWEEN 0.03 AND 0.07
        |  AND l_quantity < 24""".stripMargin,
    "q57_priority_shipments" ->
      """SELECT l_linestatus,
        |  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |      THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        |  CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
        |      THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY l_linestatus
        |ORDER BY l_linestatus""".stripMargin,
    "q58_promo_revenue" ->
      """SELECT 100.0 *
        |  CAST(SUM(CASE WHEN p_type = 'PROMO'
        |    THEN CAST(l_extendedprice AS DECIMAL(18,2))
        |         * CAST(1 - l_discount AS DECIMAL(18,2))
        |    ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
        |  / CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
        |         * CAST(1 - l_discount AS DECIMAL(18,2))) AS DOUBLE)
        |  AS promo_revenue_pct
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        |  AND l_shipdate < TIMESTAMP '1997-02-01'""".stripMargin,
    "q59_brand_revenue" ->
      """SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
        |  * CAST(1 - l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE (p_brand = 'Brand#11' AND p_size BETWEEN 1 AND 5
        |       AND l_quantity BETWEEN 1 AND 11)
        |   OR (p_brand = 'Brand#22' AND p_size BETWEEN 1 AND 10
        |       AND l_quantity BETWEEN 10 AND 20)
        |   OR (p_brand = 'Brand#33' AND p_size BETWEEN 1 AND 15
        |       AND l_quantity BETWEEN 20 AND 30)""".stripMargin,
    "q64_sales_opportunity" ->
      """SELECT substr(c_name, length(c_name), 1) AS cntrycode,
        |  COUNT(*) AS numcust,
        |  CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
        |    AS totacctbal
        |FROM customer
        |WHERE substr(c_name, length(c_name), 1) IN ('1','3','5','7','9')
        |  AND c_acctbal > (
        |    SELECT CAST(SUM(CAST(c2.c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
        |      / COUNT(*)
        |    FROM customer c2 WHERE c2.c_acctbal > 0.0)
        |  AND NOT EXISTS (SELECT 1 FROM orders
        |    WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
        |GROUP BY 1
        |ORDER BY cntrycode""".stripMargin
  )
}
