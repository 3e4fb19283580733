package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Data-quality constraint checking — the expectations layer an ETL
  * engine runs before publishing a load (the reference pipeline
  * silently ships whatever the API returned; see SURVEY §1.2 on its
  * union-typed error values). Each check is one aggregate; the report
  * unions them into (check, violations) rows, so the whole audit is a
  * handful of independent scans Catalyst can schedule together and a
  * monitoring job can diff run-over-run. Checks follow the standard
  * taxonomy: completeness (nulls), uniqueness (PK), referential
  * integrity (orphans), and domain ranges. */
object Quality {

  /** One named violation count. */
  private def check(name: String, violations: DataFrame): DataFrame =
    violations.agg(count(lit(1)).as("violations"))
      .select(lit(name).as("check"), col("violations"))

  def dataQualityReport(t: Tables): DataFrame = {
    val li = t.lineitem
    val checks = Seq(
      // completeness: fact keys must never be null
      check("lineitem_orderkey_null",
        li.filter(col("l_orderkey").isNull)),
      // uniqueness: (orderkey, linenumber) is the PK
      check("lineitem_pk_duplicate",
        li.groupBy(col("l_orderkey"), col("l_linenumber"))
          .agg(count(lit(1)).as("n")).filter(col("n") > 1)),
      // referential integrity: every lineitem joins an order, every
      // order joins a customer (anti joins — null-safe, one shuffle)
      check("lineitem_orphan_orderkey",
        li.join(t.orders.select(col("o_orderkey")),
          col("l_orderkey") === col("o_orderkey"), "left_anti")),
      check("orders_orphan_custkey",
        t.orders.join(t.customer.select(col("c_custkey")),
          col("o_custkey") === col("c_custkey"), "left_anti")),
      // domain: quantities positive and bounded, discounts in [0, 1]
      check("lineitem_quantity_range",
        li.filter(col("l_quantity") <= 0 || col("l_quantity") > 60)),
      check("lineitem_discount_range",
        li.filter(col("l_discount") < 0 || col("l_discount") > 1)))
    checks.reduce(_ union _).orderBy(col("check"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q86_quality_report" -> ((s, d) => dataQualityReport(Tables(s, d)))
  )

  val oracleSql: Map[String, String] = Map(
    "q86_quality_report" ->
      """SELECT * FROM (
        |  SELECT 'lineitem_orderkey_null' AS check, COUNT(*) AS violations
        |  FROM lineitem WHERE l_orderkey IS NULL
        |  UNION ALL
        |  SELECT 'lineitem_pk_duplicate', COUNT(*) FROM (
        |    SELECT l_orderkey, l_linenumber FROM lineitem
        |    GROUP BY l_orderkey, l_linenumber HAVING COUNT(*) > 1)
        |  UNION ALL
        |  SELECT 'lineitem_orphan_orderkey', COUNT(*) FROM lineitem
        |  WHERE l_orderkey NOT IN (SELECT o_orderkey FROM orders)
        |  UNION ALL
        |  SELECT 'orders_orphan_custkey', COUNT(*) FROM orders
        |  WHERE o_custkey NOT IN (SELECT c_custkey FROM customer)
        |  UNION ALL
        |  SELECT 'lineitem_quantity_range', COUNT(*) FROM lineitem
        |  WHERE l_quantity <= 0 OR l_quantity > 60
        |  UNION ALL
        |  SELECT 'lineitem_discount_range', COUNT(*) FROM lineitem
        |  WHERE l_discount < 0 OR l_discount > 1)
        |ORDER BY "check"""".stripMargin
  )
}
