package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Exact
import graft.operators.Relational

class RelationalSpec extends AnyFunSuite {
  lazy val spark = SharedSession.spark
  import spark.implicits._

  private def t = Tables(spark, "/root/testdata/sf0.001")

  test("exact sums are partitioning-invariant (bit-identical)") {
    val df = t.lineitem
    def total(parts: Int): Double = df.repartition(parts)
      .agg(Exact.sumD2(col("l_extendedprice"))).head.getDouble(0)
    assert(total(1) == total(13))
  }

  test("top-k orders agrees with full sort") {
    val viaLimit = Relational.topOrders(t).collect().map(_.getLong(0)).toSeq
    val full = t.orders.orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .select("o_orderkey").collect().map(_.getLong(0)).take(10).toSeq
    assert(viaLimit == full)
  }

  test("rollup grand total equals table count") {
    val grand = Relational.rollupQuantity(t)
      .filter(col("ret") === "ALL" && col("status") === "ALL")
      .head.getAs[Long]("n")
    assert(grand == t.lineitem.count())
  }

  test("semi + anti join partition the customer table") {
    val urgent = t.orders.filter(col("o_orderpriority") === "1-URGENT")
      .select("o_custkey").distinct().count()
    val anti = Relational.customersWithoutOrders(t).count()
    val withUrgent = t.customer.join(
      t.orders.filter(col("o_orderpriority") === "1-URGENT")
        .select("o_custkey"),
      col("c_custkey") === col("o_custkey"), "left_semi").count()
    assert(withUrgent + anti == t.customer.count())
    assert(withUrgent <= urgent)
  }

  test("per-group top-k never exceeds 3 rows per customer") {
    val over = Relational.topOrdersPerCustomer(t)
      .groupBy("o_custkey").count().filter(col("count") > 3)
    assert(over.isEmpty)
  }

  test("events pivot row sums match ungrouped totals") {
    val p = Relational.eventsPivotDaily(t)
    val nFromPivot = p.agg(sum("n_events")).head.getLong(0)
    assert(nFromPivot == t.events.count())
  }

  test("entry returns rows on sf0.001 (driver smoke contract)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every query key has unique name; oracle keys are a subset") {
    val qs = SparkEntry.queries
    assert(qs.nonEmpty)
    assert(SparkEntry.oracleSql.keySet.subsetOf(qs.keySet))
  }
}
