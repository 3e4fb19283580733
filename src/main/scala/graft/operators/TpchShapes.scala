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

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q68_sql_forecast_revenue" -> ((s, d) => forecastRevenueSql(s, d)),
    "q57_priority_shipments" -> ((s, d) => priorityShipments(Tables(s, d))),
    "q58_promo_revenue" -> ((s, d) => promoRevenueShare(Tables(s, d))),
    "q59_brand_revenue" -> ((s, d) => brandRevenue(Tables(s, d))),
    "q64_sales_opportunity" -> ((s, d) => globalSalesOpportunity(Tables(s, d)))
  )

  val oracleSql: Map[String, String] = Map(
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
